"""Stream-shaped operators over the `events` table (event_id, ts,
user_id, event_type, value, props).

Ray Data has no event-time windows (guide: batch/streaming-batch engine);
windows are expressed as groupby over a computed window key (tumbling) or
``groupby(key).map_groups`` over ts-sorted groups (sessionization).  The
ordering assumption — each group sorted by ts inside the group fn — is
stated per operator; results are deterministic regardless of input order.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from search_engine_ray.ops.rounding import e4_halfaway


def _empty_window_partial() -> pa.Table:
    """Typed empty window-aggregate partial — a frame built from plain
    [] lists carries float64 dtypes (event_type double vs string) and
    poisons Ray's schema unification when a block is empty."""
    return pa.table({"event_type": pa.array([], pa.string()),
                     "window_start_s": pa.array([], pa.int64()),
                     "n_part": pa.array([], pa.int64()),
                     "sum_part": pa.array([], pa.float64())})


def tumbling_window_agg(sf_dir: str, window_s: int = 3600):
    """Per (event_type, hour-bucket): count + sum(value).  Pre-aggregated
    inside map_batches before the groupby (partial combine).
    SQL: GROUP BY event_type, time_bucket(INTERVAL .., ts)."""
    import ray.data
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # typed empty: [] lists decay to float64
            return _empty_window_partial()
        ts = batch.column("ts").cast(pa.int64()).to_numpy()  # us
        win = (ts // (window_s * 1_000_000)) * window_s  # epoch seconds
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pylist(),
            "window_start_s": win,
            "value": batch.column("value").to_numpy(),
        })
        g = df.groupby(["event_type", "window_start_s"], sort=False).agg(
            n_part=("value", "size"), sum_part=("value", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts", "event_type", "value"])
    return (ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["event_type", "window_start_s"])
              .aggregate(Sum("n_part", alias_name="n"),
                         Sum("sum_part", alias_name="sum_value")))


def hopping_window_agg(sf_dir: str, window_s: int = 3600,
                       hop_s: int = 900):
    """Overlapping (hopping) windows: each event lands in
    ``window_s / hop_s`` windows; per (event_type, window_start) count +
    sum(value).  The fan-out happens INSIDE the partial-combine
    map_batches (numpy repeat, pre-aggregated per batch), so the shuffle
    moves only per-batch partials — the standard way to express sliding
    aggregates on a batch engine.
    SQL: join against generated hop offsets, then GROUP BY."""
    import ray.data
    from ray.data.aggregate import Sum

    # ceil, not floor: with non-divisible window/hop an event can fall
    # in one more window than window_s // hop_s (e.g. 3600/1000: ts=3500
    # is inside the window starting at 0); the mask below drops the
    # candidates past the window edge, so divisible arguments behave
    # exactly as before
    k = -(-window_s // hop_s)

    def partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_window_partial()
        ts = batch.column("ts").cast(pa.int64()).to_numpy() // 1_000_000
        # window starts: floor(ts/hop)*hop - i*hop for i in 0..k-1, kept
        # when ts < start + window_s
        base = (ts // hop_s) * hop_s
        starts = (np.repeat(base, k)
                  - np.tile(np.arange(k, dtype=np.int64) * hop_s,
                            len(ts)))
        inside = np.repeat(ts, k) < starts + window_s
        df = pd.DataFrame({
            "event_type": np.repeat(
                np.asarray(batch.column("event_type").to_pylist(),
                           dtype=object), k)[inside],
            "window_start_s": starts[inside],
            "value": np.repeat(batch.column("value").to_numpy(),
                               k)[inside],
        })
        g = df.groupby(["event_type", "window_start_s"], sort=False).agg(
            n_part=("value", "size"),
            sum_part=("value", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts", "event_type", "value"])
    return (ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["event_type", "window_start_s"])
              .aggregate(Sum("n_part", alias_name="n"),
                         Sum("sum_part", alias_name="sum_value")))


def sessionize(sf_dir: str, gap_s: int = 1800):
    """Sessions per user: a new session starts when the gap from the
    previous event exceeds ``gap_s``.  Output: one row per session with
    (user_id, session_start_s, n_events, duration_s).
    Partitioning: groupby(user_id); each group is sorted by ts inside the
    group fn, so input order is irrelevant.
    SQL-equivalent: lag + cumulative sum of gap flags."""
    import ray.data

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy() // 1_000_000  # seconds
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_s
        sid = np.cumsum(new)
        out = pd.DataFrame({"ts_s": ts, "sid": sid})
        agg = out.groupby("sid").agg(
            session_start_s=("ts_s", "min"),
            session_end_s=("ts_s", "max"),
            n_events=("ts_s", "size")).reset_index(drop=True)
        agg.insert(0, "user_id", g["user_id"].iloc[0])
        agg["duration_s"] = agg["session_end_s"] - agg["session_start_s"]
        return agg.drop(columns=["session_end_s"])

    from search_engine_ray.ops.shuffle import grouped_apply

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_id", "ts", "user_id"])
    return grouped_apply(ds, ["user_id"], per_user)


def event_type_stats(sf_dir: str):
    """Per event_type: count, mean/min/max of value — plain shuffled agg.
    SQL: GROUP BY event_type."""
    import ray.data
    from ray.data.aggregate import Count, Max, Mean, Min

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "value"])
    return ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Mean("value", alias_name="mean_value"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )


def value_quantiles_per_type(sf_dir: str,
                             qs=(0.25, 0.5, 0.75, 0.95),
                             n_buckets: int = 4096,
                             collect_cap: int = 65536):
    """EXACT discrete quantiles of `value` per event_type via distributed
    selection — histogram bracketing + pruned collection, never a whole
    group in one task (round-4 verdict #4 replaced the single-task
    per-type sort).  Quantile rule matches SQL quantile_disc:
    sorted[max(ceil(q*n)-1, 0)].  Raw doubles are exported (selection,
    not arithmetic), so the value hash is exact.

    Algorithm (classic iterative histogram selection):
    1. one shuffled agg gives per-type (n, min, max) — #types rows;
    2. each (type, q) target keeps a bracket known to contain its rank;
       while a bracket holds > ``collect_cap`` values, one streaming
       pass histograms every active bracket into ``n_buckets`` bins
       (driver traffic: actives x n_buckets int64s, a sketch) and the
       bracket narrows to the single bin containing the rank —
       O(log_B n) passes, 2 at 100 TB with B=4096;
    3. a final pruned pass emits per-batch DISTINCT (value, count)
       partials of ONLY the in-bracket values (<= cap distinct per
       target; a point mass the histogram cannot split is ONE row per
       batch) and the driver selects the exact rank from the merged
       counts — the answer is always an actual data value.
    Bracket membership is defined by the same float bucketization that
    built the histogram (a chain of (lo, w, bin) levels, AND-ed), so
    boundary rounding can never disagree between passes."""
    import ray
    import ray.data
    from ray.data.aggregate import Count, Max, Min

    path = os.path.join(sf_dir, "events.parquet")

    def _read():
        return ray.data.read_parquet(path,
                                     columns=["event_type", "value"])

    stats = (_read().groupby("event_type").aggregate(
        Count(alias_name="n"),
        Min("value", alias_name="lo"),
        Max("value", alias_name="hi")).to_pandas())

    # one selection target per (type, quantile): rank is 1-based within
    # the type; levels is the bucketization chain defining its bracket
    targets = []
    for _, s in stats.iterrows():
        for q in qs:
            n = int(s["n"])
            targets.append({
                "event_type": s["event_type"], "q": q, "n": n,
                "rank": max(int(np.ceil(q * n)), 1),
                "count_in": n, "lo": float(s["lo"]), "hi": float(s["hi"]),
                "levels": [], "answer": None,
            })

    def _bins(v: np.ndarray, lo: float, w: float) -> np.ndarray:
        return np.clip(np.floor((v - lo) / w).astype(np.int64),
                       0, n_buckets - 1)

    for _ in range(64):  # ceil(log_B(n)) passes; 64 is unreachable
        # a bracket that cannot narrow further (point mass: hi <= lo, or
        # bin width underflowed to 0) stops refining and falls through
        # to the collection pass — the answer must be an ACTUAL data
        # value selected by rank, never the float bracket bound (which
        # rounding can push off the true element)
        active = [t for t in targets
                  if t["count_in"] > collect_cap and t["hi"] > t["lo"]
                  and (t["hi"] - t["lo"]) / n_buckets > 0.0]
        if not active:
            break
        spec_ref = ray.put([{k: t[k] for k in
                             ("event_type", "lo", "hi", "levels")}
                            for t in active])

        def hist_partial(batch, _ref=spec_ref):
            spec = ray.get(_ref)
            et = batch.column("event_type").to_numpy(zero_copy_only=False)
            val = batch.column("value").to_numpy(zero_copy_only=False)
            tids, bins, cnts = [], [], []
            for ti, t in enumerate(spec):
                v = val[et == t["event_type"]]
                for lo, w, b in t["levels"]:
                    v = v[_bins(v, lo, w) == b]
                if not len(v):
                    continue
                w = (t["hi"] - t["lo"]) / n_buckets
                c = np.bincount(_bins(v, t["lo"], w),
                                minlength=n_buckets)
                nz = np.flatnonzero(c)
                tids.append(np.full(len(nz), ti, dtype=np.int64))
                bins.append(nz)
                cnts.append(c[nz])
            import pyarrow as _pa

            return _pa.table({
                "tid": np.concatenate(tids) if tids else
                np.zeros(0, np.int64),
                "bin": np.concatenate(bins) if bins else
                np.zeros(0, np.int64),
                "cnt": np.concatenate(cnts) if cnts else
                np.zeros(0, np.int64)})

        from search_engine_ray.ops.shuffle import bucketed_sum

        hist = bucketed_sum(
            _read().map_batches(hist_partial, batch_format="pyarrow"),
            ["tid", "bin"], ["cnt"]).to_pandas()
        for ti, t in enumerate(active):
            h = hist[hist["tid"] == ti].sort_values("bin")
            cum = h["cnt"].cumsum().to_numpy()
            j = int(np.searchsorted(cum, t["rank"]))
            b = int(h["bin"].to_numpy()[j])
            w = (t["hi"] - t["lo"]) / n_buckets
            t["rank"] -= int(cum[j - 1]) if j else 0
            t["count_in"] = int(h["cnt"].to_numpy()[j])
            t["levels"] = t["levels"] + [(t["lo"], w, b)]
            t["lo"], t["hi"] = t["lo"] + b * w, t["lo"] + (b + 1) * w

    # final pruned collection: per-batch DISTINCT (value, count)
    # partials of the in-bracket values leave the scan — bounded by the
    # bracket's distinct count even when a point mass exceeds
    # collect_cap (the case the refinement loop cannot split)
    pend = [t for t in targets if t["answer"] is None]
    if pend:
        spec_ref = ray.put([{k: t[k] for k in ("event_type", "levels")}
                            for t in pend])

        def collect(batch, _ref=spec_ref):
            spec = ray.get(_ref)
            et = batch.column("event_type").to_numpy(zero_copy_only=False)
            val = batch.column("value").to_numpy(zero_copy_only=False)
            tids, vals, cnts = [], [], []
            for ti, t in enumerate(spec):
                v = val[et == t["event_type"]]
                for lo, w, b in t["levels"]:
                    v = v[_bins(v, lo, w) == b]
                uv, uc = np.unique(v, return_counts=True)
                tids.append(np.full(len(uv), ti, dtype=np.int64))
                vals.append(uv)
                cnts.append(uc.astype(np.int64))
            import pyarrow as _pa

            return _pa.table({"tid": np.concatenate(tids),
                              "v": np.concatenate(vals),
                              "cnt": np.concatenate(cnts)})

        got = (_read().map_batches(collect, batch_format="pyarrow")
               .to_pandas()
               .groupby(["tid", "v"], sort=True)["cnt"].sum()
               .reset_index())
        for ti, t in enumerate(pend):
            g = got[got["tid"] == ti]  # v ascending (groupby sort)
            cum = g["cnt"].cumsum().to_numpy()
            j = int(np.searchsorted(cum, t["rank"]))
            t["answer"] = float(g["v"].to_numpy()[j])

    rows = {}
    for t in targets:
        r = rows.setdefault(t["event_type"],
                            {"event_type": t["event_type"],
                             "n": np.int64(t["n"])})
        r[f"p{int(t['q'] * 100)}"] = t["answer"]
    out = pd.DataFrame(sorted(rows.values(),
                              key=lambda r: r["event_type"]))
    import ray.data as _rd

    return _rd.from_pandas(out)


class JsonFieldStats:
    """Actor-pool UDF for semi-structured props: extracts an integer
    field from the JSON `props` column (compiled regex fast-path with a
    json.loads fallback — both per actor, once) and pre-aggregates per
    event_type inside the batch.  The shuffle moves only per-batch
    partials."""

    def __init__(self, field: str = "k"):
        import json
        import re

        self.field = field
        # strict flat-object validator: scalar values only, no escapes,
        # no nesting/arrays — anything it rejects takes json.loads
        scalar = (r'(?:-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][-+]?\d+)?'
                  r'|"[^"\\]*"|true|false|null)')
        member = r'"[^"\\]*"\s*:\s*' + scalar
        self.flat = re.compile(
            r'\s*\{\s*(?:%s(?:\s*,\s*%s)*\s*)?\}\s*\Z' % (member, member))
        self.val = re.compile(r'"%s"\s*:\s*(%s)'
                              % (re.escape(field), scalar))
        self.loads = json.loads

    @staticmethod
    def _coerce(v) -> int | None:
        # bool is an int subclass: json.loads gives True -> 1, matching
        # a SQL CAST of json true — both paths apply the same rule
        return int(v) if isinstance(v, (int, float)) else None

    def _extract(self, s: str) -> int | None:
        # regex fast path ONLY for strings the flat-object validator
        # PROVES are valid flat JSON (the old precondition accepted
        # malformed strings like '{"k": 5,}' that json.loads — and SQL
        # json_extract — reject); the LAST occurrence wins, matching
        # json.loads duplicate-key semantics.
        if "\\" not in s and self.flat.match(s):
            ms = self.val.findall(s)
            if not ms:
                return None
            v = ms[-1]
            if v == "true":
                return 1
            if v == "false":
                return 0
            if v == "null" or v.startswith('"'):
                return None
            return self._coerce(float(v) if ("." in v or "e" in v
                                             or "E" in v) else int(v))
        try:
            return self._coerce(self.loads(s).get(self.field))
        except (ValueError, AttributeError):
            return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pylist(),
                        dtype=object)
        vals = np.array([self._extract(s) if s is not None else None
                         for s in batch.column("props").to_pylist()],
                        dtype=object)
        ok = np.array([v is not None for v in vals], dtype=bool)
        df = pd.DataFrame({
            "event_type": et[ok],
            "v": np.array([int(v) for v in vals[ok]], dtype=np.int64),
        })
        g = df.groupby("event_type", sort=False).agg(
            sum_part=("v", "sum"), min_part=("v", "min"),
            max_part=("v", "max"), n_part=("v", "size")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)


def json_field_stats(sf_dir: str, field: str = "k"):
    """Per event_type: sum/min/max/count of the integer JSON field —
    exact integer aggregation, SQL-checkable via json_extract."""
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "props"])
    return (ds.map_batches(JsonFieldStats,
                           fn_constructor_kwargs={"field": field},
                           batch_format="pyarrow", concurrency=2)
              .groupby("event_type")
              .aggregate(Sum("sum_part", alias_name="sum_k"),
                         Min("min_part", alias_name="min_k"),
                         Max("max_part", alias_name="max_k"),
                         Sum("n_part", alias_name="n")))


def value_histogram(sf_dir: str, width: float = 5.0):
    """Fixed-width histogram of `value`: bucket = floor(value/width).
    Per-batch partial combine (bucket -> count, per-row 1e-4-scaled
    integer sum) so the shuffle moves only bucket partials; exact
    integer aggregation on both the Ray and SQL side."""
    import ray.data
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy()
        bucket = np.floor(v / width).astype(np.int64)
        e4 = e4_halfaway(v)
        df = pd.DataFrame({"bucket": bucket, "e4": e4})
        g = df.groupby("bucket", sort=False).agg(
            n_part=("e4", "size"),
            sum_part=("e4", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["value"])
    return (ds.map_batches(partials, batch_format="pyarrow")
              .groupby("bucket")
              .aggregate(Sum("n_part", alias_name="n"),
                         Sum("sum_part", alias_name="sum_value_e4")))


def distinct_users_daily(sf_dir: str):
    """Exact daily active users, skew-safe: per-batch (day, user) dedup
    bounds the shuffle to unique pairs; the global dedup shuffles on the
    PAIR key (so a billion-user day splits across reducers instead of
    landing whole in one group); the final per-day count is a partial
    combine over the deduped pairs plus a tiny groupby."""
    import ray.data
    from ray.data.aggregate import Sum

    def pairs(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        day = ts // (86400 * 1_000_000)
        uid = batch.column("user_id").to_numpy()
        uniq = np.unique(np.stack([day, uid], axis=1), axis=0)
        return pa.table({
            "day": pa.array(uniq[:, 0], pa.int64()),
            "user_id": pa.array(uniq[:, 1], pa.int64())})

    def day_partials(batch: pa.Table) -> pa.Table:
        d, c = np.unique(batch.column("day").to_numpy(),
                         return_counts=True)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["ts", "user_id"])
    from search_engine_ray.ops.shuffle import bucketed_apply

    deduped = bucketed_apply(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["day", "user_id"],
        lambda g: g.drop_duplicates(subset=["day", "user_id"]))
    return (deduped.map_batches(day_partials, batch_format="pyarrow")
                   .groupby("day")
                   .aggregate(Sum("c", alias_name="n_users")))


def user_rolling_sum3(sf_dir: str):
    """Per-user rolling sum over the last 3 events (window-function
    shape): groups are hash-partitioned by user, sorted by (ts,
    event_id) inside ``map_groups``; values are 1e-4-scaled per row
    BEFORE the window sum, so the rolling aggregate is exact integer
    math on both the Ray and SQL side."""
    import ray.data

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        e4 = g["e4"].to_numpy()
        c = np.concatenate([[0], np.cumsum(e4)])
        k = np.minimum(np.arange(1, len(e4) + 1), 3)
        roll = c[1:] - c[np.arange(1, len(e4) + 1) - k]
        return pd.DataFrame({
            "event_id": g["event_id"].astype("int64"),
            "roll3_e4": roll.astype("int64")})

    def prep(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy()
        e4 = e4_halfaway(v)
        return pa.table({
            "user_id": batch.column("user_id"),
            "event_id": batch.column("event_id"),
            "ts_us": batch.column("ts").cast(pa.int64()),
            "e4": pa.array(e4, pa.int64())})

    from search_engine_ray.ops.shuffle import grouped_apply

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_id", "ts", "value"])
    return grouped_apply(ds.map_batches(prep, batch_format="pyarrow"),
                         ["user_id"], per_user)


def latest_event_per_user(sf_dir: str):
    """Latest-record compaction (the CDC/upsert shape): one surviving
    row per user — the event with the max (ts, event_id).  Per-batch
    partial reduction keeps ONE candidate per user per batch before the
    shuffle, so the groupby moves at most (#batches x users-per-batch)
    rows and a hot user compacts early instead of flooding one reducer.
    Deterministic: ties broken by event_id."""
    import ray.data

    def partial_latest(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch.column("user_id").to_numpy(),
            "event_id": batch.column("event_id").to_numpy(),
            "ts_us": batch.column("ts").cast(pa.int64()).to_numpy(),
            "event_type": batch.column("event_type").to_pylist(),
        })
        df = df.sort_values(["user_id", "ts_us", "event_id"])
        keep = df.groupby("user_id", sort=False).tail(1)
        return pa.Table.from_pandas(keep, preserve_index=False)

    def final_latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"])
        return g.groupby("user_id", sort=False).tail(1)

    from search_engine_ray.ops.shuffle import bucketed_apply

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_id", "ts", "event_type"])
    return bucketed_apply(
        ds.map_batches(partial_latest, batch_format="pyarrow"),
        ["user_id"], final_latest)


def retention_cohorts(sf_dir: str, max_k: int = 3):
    """Weekly retention cohorts: users grouped by their first-activity
    week (the cohort), counted as retained in week ``cohort + k`` for
    k = 0..``max_k`` — the standard product-analytics retention matrix.

    Plan: one scan pre-dedups (user, week) pairs per batch, ONE
    user-keyed bucket shuffle computes each user's cohort (min week)
    and emits its distinct (cohort, k) memberships, and a final tiny
    sum finishes — per-user state never leaves its bucket, and the
    result is bounded by weeks x max_k regardless of corpus size."""
    import ray.data

    from search_engine_ray.ops.shuffle import bucketed_apply, bucketed_sum

    week_us = 7 * 86_400 * 1_000_000

    def pairs(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        df = pd.DataFrame({
            "user_id": batch.column("user_id").to_numpy(),
            "w": ts // week_us}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "w"])
        cohort = g.groupby("user_id", sort=False)["w"].transform("min")
        k = (g["w"] - cohort).to_numpy(dtype=np.int64)
        keep = k <= max_k
        return pd.DataFrame({
            "cohort_week": cohort.to_numpy(dtype=np.int64)[keep],
            "k": k[keep],
            "one": np.ones(int(keep.sum()), dtype=np.int64)})

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts"])
    per = bucketed_apply(ds.map_batches(pairs, batch_format="pyarrow"),
                         ["user_id"], per_user)
    return bucketed_sum(per, ["cohort_week", "k"], ["one"],
                        rename={"one": "n_users"})


def funnel_conversion(sf_dir: str,
                      steps=("view", "click", "purchase"),
                      within_s: int = 86_400):
    """Ordered funnel conversion: how many users complete each prefix
    of ``steps``, where every step must happen strictly after the
    previous qualifying step and within ``within_s`` of it (greedy
    earliest-completion semantics, the standard analytics definition).

    Plan: the scan keeps only funnel-typed events, ONE user-keyed
    bucket shuffle co-locates each user's events, and each bucket runs
    the whole funnel VECTORIZED (per-step merge + filter + groupby-min
    across all users at once — no per-user Python loop); per-bucket
    (step, n) partials then sum to len(steps) rows."""
    import ray.data
    from ray.data.aggregate import Sum

    from search_engine_ray.ops.shuffle import bucketed_apply

    within_us = within_s * 1_000_000
    steps = list(steps)

    def prep(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_pylist()
        keep = np.array([e in steps for e in et], dtype=bool)
        sub = batch.filter(pa.array(keep))
        return pa.table({
            "user_id": sub.column("user_id"),
            "event_type": sub.column("event_type"),
            "ts_us": sub.column("ts").cast(pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cur = (g[g["event_type"] == steps[0]]
               .groupby("user_id", sort=False)["ts_us"].min()
               .rename("t").reset_index())
        out_step, out_n = [1], [np.int64(len(cur))]
        for i, st in enumerate(steps[1:], start=2):
            nxt = g.loc[g["event_type"] == st, ["user_id", "ts_us"]]
            m = nxt.merge(cur, on="user_id", how="inner")
            ok = ((m["ts_us"] > m["t"])
                  & (m["ts_us"] <= m["t"] + within_us))
            cur = (m.loc[ok].groupby("user_id", sort=False)["ts_us"]
                   .min().rename("t").reset_index())
            out_step.append(i)
            out_n.append(np.int64(len(cur)))
        return pd.DataFrame({
            "step": np.asarray(out_step, dtype=np.int64),
            "step_type": steps,
            "n_users": np.asarray(out_n, dtype=np.int64)})

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "event_type", "ts"])
    per = bucketed_apply(ds.map_batches(prep, batch_format="pyarrow"),
                         ["user_id"], per_bucket)
    return (per.groupby(["step", "step_type"])
            .aggregate(Sum("n_users", alias_name="n_users")))


def topk_per_window(sf_dir: str, window_s: int = 3600, k: int = 3):
    """Continuous/windowed top-k (the streaming-top-k query shape of
    the retrieved ICDE/SIGMOD top-k papers): the ``k`` highest-value
    events per (event_type, tumbling window), ranked by
    (value desc, event_id asc) with values on the exact e4-integer
    grid so the SQL mirror hashes identically.

    Plan: per-batch PARTIAL top-k per group (only k rows per group per
    batch survive the scan — the streaming-pruning insight of the
    continuous-top-k literature), then one bucketed per-group final
    top-k; no window's full event list is ever collected."""
    import ray.data

    from search_engine_ray.ops.rounding import e4_halfaway
    from search_engine_ray.ops.shuffle import bucketed_apply

    keys = ["event_type", "window_start_s"]

    def partial_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "window_start_s": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "value_e4": pa.array([], pa.int64())})
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pylist(),
            "window_start_s": (ts // (window_s * 1_000_000)) * window_s,
            "event_id": batch.column("event_id").to_numpy(),
            "value_e4": e4_halfaway(batch.column("value").to_numpy()),
        })
        df = df.sort_values(["value_e4", "event_id"],
                            ascending=[False, True])
        return pa.Table.from_pandas(df.groupby(keys, sort=False).head(k),
                                    preserve_index=False)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value_e4", "event_id"],
                          ascending=[False, True])
        out = g.groupby(keys, sort=False).head(k).copy()
        out["rank"] = out.groupby(keys, sort=False).cumcount() + 1
        return out

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["ts", "event_type", "event_id", "value"])
    return bucketed_apply(
        ds.map_batches(partial_topk, batch_format="pyarrow"),
        keys, final_topk)
