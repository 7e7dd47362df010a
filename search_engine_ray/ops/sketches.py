"""Mergeable-sketch operators: Misra-Gries two-pass heavy hitters and
HyperLogLog distinct counting.

Both follow the sketch shape a 100-TB corpus needs: per-batch summaries
of FIXED size flow out of ``map_batches``, merge is associative and
commutative (sum / elementwise max), and only the merged sketch — never
the data — reaches the driver.

Heavy hitters is *two-pass exact*: the sketch pass produces a provably
lossless candidate set for the threshold (Misra-Gries guarantee: a term
dropped everywhere has total count <= N/k), the second pass exact-counts
only the (broadcast) candidates — so the output is exact and
SQL-checkable, while the full-vocabulary groupby a naive TOP-N would
shuffle never happens.

Public refs: Misra & Gries 1982 (finding repeated elements);
Flajolet et al. 2007 (HyperLogLog).  No reference-repo counterpart
(added training-data surface, SURVEY §2.11).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from search_engine_ray.text.tokenizer import simple_tokenize

# reserved aggregation key for the token-total row; simple_tokenize never
# emits an empty string
_N_KEY = ""


def _batch_term_counts(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    toks: list[str] = []
    for t in batch.column("text").to_pylist():
        toks.extend(simple_tokenize(t))
    if not toks:
        return np.empty(0, dtype=object), np.empty(0, np.int64)
    terms, counts = np.unique(np.asarray(toks, dtype=object),
                              return_counts=True)
    return terms, counts


def heavy_hitters(sf_dir: str, min_count: int = 50,
                  k_counters: int = 2048) -> pa.Table:
    """Exact counts of every simple-token term with global count >=
    ``min_count``, via a Misra-Gries candidate pass + an exact recount
    pass restricted to the candidates.

    Soundness: a term kept in NO batch summary has per-batch count
    <= n_b/k in every batch, hence total <= N/k; the op raises if
    ``min_count <= N/k_counters`` (the sketch cannot guarantee recall
    there — raise k_counters).

    Only fixed-size artifacts hit the driver: the candidate list
    (<= k x batches pre-groupby, tiny post-groupby) and the final
    filtered counts.  SQL: token explode GROUP BY HAVING count >= T.
    """
    import ray
    import ray.data

    path = os.path.join(sf_dir, "documents.parquet")

    def mg_partials(batch: pa.Table) -> pa.Table:
        terms, counts = _batch_term_counts(batch)
        n_b = int(counts.sum())
        keep = counts * k_counters > n_b  # MG retention: count > n_b/k
        return pa.table({
            "term": pa.array(list(terms[keep]) + [_N_KEY], pa.string()),
            "partial": pa.array(list(counts[keep]) + [n_b], pa.int64()),
        })

    ds = ray.data.read_parquet(path, columns=["text"])
    from search_engine_ray.ops.shuffle import bucketed_sum

    agg = bucketed_sum(ds.map_batches(mg_partials,
                                      batch_format="pyarrow"),
                       ["term"], ["partial"],
                       rename={"partial": "lower"})
    # merged sketch: one small row per retained term — driver-safe
    rows = agg.to_pandas()
    n_total = int(rows.loc[rows["term"] == _N_KEY, "lower"].sum())
    if min_count * k_counters <= n_total:
        raise ValueError(
            f"min_count={min_count} <= N/k = {n_total}/{k_counters}; "
            "raise k_counters for lossless candidates")
    cand = rows[rows["term"] != _N_KEY]
    # upper bound = lower + N/k; prune candidates that cannot reach T
    cand = cand[cand["lower"] + n_total // k_counters >= min_count]
    cand_ref = ray.put(frozenset(cand["term"]))

    def exact_partials(batch: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)
        terms, counts = _batch_term_counts(batch)
        keep = np.array([t in cset for t in terms], dtype=bool)
        return pa.table({
            "term": pa.array(terms[keep], pa.string()),
            "partial": pa.array(counts[keep], pa.int64()),
        })

    ds2 = ray.data.read_parquet(path, columns=["text"])
    exact = bucketed_sum(ds2.map_batches(exact_partials,
                                          batch_format="pyarrow"),
                         ["term"], ["partial"], rename={"partial": "n"})

    def final_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.greater_equal(batch.column("n"),
                                             min_count))

    return exact.map_batches(final_filter, batch_format="pyarrow")


# ------------------------------------------------------------ HyperLogLog
_HLL_P = 14  # 2^14 = 16384 registers, ~0.8% standard error


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (SplitMix64 finalizer), vectorized."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_registers(values: np.ndarray, p: int = _HLL_P) -> np.ndarray:
    """HLL register array (uint8, 2^p long) for a batch of uint64-castable
    values.  Register j = max over hashes with index j of
    (leading-zero count of the remaining 64-p bits) + 1."""
    with np.errstate(all="ignore"):
        h = _splitmix64(values.astype(np.uint64))
    m = 1 << p
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    rest = h >> np.uint64(p)
    # rank = position of the first 1-bit in the low 64-p bits, from MSB
    # of that field: count leading zeros within (64-p) bits, + 1
    width = 64 - p
    nz = rest != 0
    # bit_length via log2 is unsafe for uint64; use np.frexp on float64
    # only for values < 2^53 — instead compute with a loop-free method:
    bl = np.zeros(len(rest), dtype=np.int64)
    v = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        v[big] >>= np.uint64(shift)
    bl[nz] += 1  # bit_length of nonzero values
    rank = np.where(nz, width - bl + 1, width + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL cardinality estimate with linear-counting
    fallback for the small range (Flajolet et al. 2007)."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = float(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(sf_dir: str, table: str = "events",
                 column: str = "user_id", p: int = _HLL_P) -> pa.Table:
    """Approximate distinct count of an int64 column: per-batch HLL
    registers out of map_batches (one fixed-size row per batch), merged
    with elementwise max on the driver.  Driver traffic is
    batches x 2^p bytes regardless of data size."""
    import ray.data

    def regs_row(batch: pa.Table) -> pa.Table:
        vals = batch.column(column).to_numpy(zero_copy_only=False)
        regs = hll_registers(vals.astype(np.uint64), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def merge_regs(t: pa.Table) -> pa.Table:
        # tree-reduce step: elementwise-max up to 64 register rows into
        # one INSIDE Ray, so driver traffic is batches/64 rows at any
        # batch count (round-4 verdict #5)
        mat = np.frombuffer(b"".join(t.column("regs").to_pylist()),
                            dtype=np.uint8).reshape(len(t), -1)
        return pa.table({"regs": pa.array([mat.max(axis=0).tobytes()],
                                          pa.binary())})

    ds = ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                               columns=[column])
    rows = (ds.map_batches(regs_row, batch_format="pyarrow")
            .map_batches(merge_regs, batch_format="pyarrow", batch_size=64)
            .take_all())
    if not rows:  # zero input batches: an empty sketch (all-zero regs)
        merged = np.zeros(1 << p, dtype=np.uint8)
    else:
        merged = np.frombuffer(b"".join(r["regs"] for r in rows),
                               dtype=np.uint8).reshape(len(rows), -1).max(axis=0)
    return pa.table({
        "n_distinct_est": pa.array([int(round(hll_estimate(merged)))],
                                   pa.int64()),
        "n_registers": pa.array([1 << p], pa.int64()),
    })


def approx_quantiles_hist(sf_dir: str, width: float = 0.5,
                          pcts: tuple = (50, 90, 99)):
    """Approximate quantiles from a MERGEABLE fixed-width histogram
    sketch: per-batch bucket counts shuffle as partials; the merged
    histogram is bounded by the value range / width (a sketch, not the
    data — KBs regardless of corpus size).  The estimate is the upper
    edge of the first bucket whose cumulative count reaches
    ceil(pct/100 * N) — a deterministic rule, so even this approximate
    operator is value-checked against SQL.  Error is bounded by
    ``width`` by construction."""
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy()
        b = np.floor(v / width).astype(np.int64)
        ub, c = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(ub, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    hist = (ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                  columns=["value"])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("b").aggregate(Sum("c", alias_name="n"))
            .to_pandas())
    if "b" not in hist.columns:   # empty input: Ray's empty aggregate
        hist = pd.DataFrame({"b": [], "n": []})  # loses the key column
    hist = hist.sort_values("b").reset_index(drop=True)
    cum = hist["n"].cumsum().to_numpy()
    total = int(cum[-1]) if len(cum) else 0
    e4_per_bucket = int(round(width * 10000))
    rows = []
    for pct in pcts:
        if total == 0:
            # empty input: no histogram bucket to index — report 0
            # instead of raising on hist.iloc[0]
            rows.append({"pct": int(pct), "est_e4": 0})
            continue
        target = (pct * total + 99) // 100
        i = int(np.searchsorted(cum, target))
        est_e4 = (int(hist["b"].iloc[i]) + 1) * e4_per_bucket
        rows.append({"pct": int(pct), "est_e4": est_e4})
    return pd.DataFrame(rows)


_CMS_D, _CMS_W = 4, 4096
_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5],
                      dtype=np.uint64)


def _cms_rows(terms: np.ndarray, d: int = _CMS_D,
              w: int = _CMS_W) -> np.ndarray:
    """Row indices (d x n) of each term under the d hash functions —
    one blake2b per unique term, then d independent multiply-shift
    mixes (public splitmix-style construction)."""
    import hashlib

    h = np.fromiter(
        (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8)
                        .digest(), "little") for t in terms),
        dtype=np.uint64, count=len(terms))
    rows = np.empty((d, len(terms)), dtype=np.int64)
    for i in range(d):
        x = (h * _CMS_SEEDS[i])
        x ^= x >> np.uint64(29)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(32)
        rows[i] = (x % np.uint64(w)).astype(np.int64)
    return rows


def cms_term_estimates(sf_dir: str, probe_min_count: int = 50):
    """Count-min-sketch term frequencies: per-batch local CMS
    (d x w int64, ~128 KB regardless of batch size) out of
    ``map_batches``, merged by elementwise SUM — the canonical
    fixed-size mergeable frequency sketch for streams too wide to
    groupby (Cormode & Muthukrishnan 2005).  The returned table probes
    the merged sketch with the corpus's exact heavy hitters (from the
    existing two-pass Misra-Gries op) so the estimate column is
    deterministic and its guarantee (est >= true, est - true <=
    eps*N w.h.p.) is unit-tested against exact counts."""
    import ray.data

    def sketch_row(batch: pa.Table) -> pa.Table:
        terms, counts = _batch_term_counts(batch)
        cms = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        if len(terms):
            rows = _cms_rows(terms)
            for i in range(_CMS_D):
                np.add.at(cms[i], rows[i], counts)
        return pa.table({"cms": pa.array([cms.tobytes()], pa.binary())})

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text"])
    merged = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    for r in ds.map_batches(sketch_row, batch_format="pyarrow").take_all():
        merged += np.frombuffer(r["cms"], dtype=np.int64).reshape(
            _CMS_D, _CMS_W)

    exact = heavy_hitters(sf_dir, min_count=probe_min_count).to_pandas()
    terms = np.asarray(exact["term"].to_numpy(), dtype=object)
    rows = _cms_rows(terms) if len(terms) else np.empty((_CMS_D, 0),
                                                        dtype=np.int64)
    est = merged[np.arange(_CMS_D)[:, None], rows].min(axis=0) \
        if len(terms) else np.empty(0, dtype=np.int64)
    return pa.table({
        "term": pa.array(list(terms), pa.string()),
        "n_exact": pa.array(exact["n"].to_numpy(np.int64), pa.int64()),
        "n_est": pa.array(est, pa.int64())})


_BLOOM_M = 1 << 16  # bits
_BLOOM_K = 4


def _bloom_positions(fps: np.ndarray, m: int = _BLOOM_M,
                     k: int = _BLOOM_K) -> np.ndarray:
    """k bit positions per 64-bit fingerprint (splitmix-style double
    hashing h1 + i*h2 — the standard Kirsch-Mitzenmacher scheme)."""
    x = fps.astype(np.uint64)
    z = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h1 = z ^ (z >> np.uint64(31))
    h2 = (x * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    ii = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + ii[None, :] * h2[:, None])
            % np.uint64(m)).astype(np.int64)


def bloom_doc_membership(sf_dir: str, n_absent: int = 200):
    """Bloom filter over the corpus' content fingerprints, built
    DISTRIBUTED the same way the CMS/HLL summaries are: each batch
    emits its DISTINCT set-bit positions, one bucketed count dedups
    them, and the driver materializes the m-bit filter (8 KB at any
    corpus size).  Probes every corpus doc (must all hit — Bloom
    filters have no false negatives) plus ``n_absent`` synthetic
    strings (false-positive-rate specimen).

    Returns one row per probe class: (probe_kind, n_probes, n_hits).
    Gated by a no-false-negative + FPR-bound unit, not SQL (the filter
    is probabilistic by design)."""
    import ray
    import ray.data

    from search_engine_ray.ops.shuffle import bucketed_sum
    from search_engine_ray.ops.textstats import md5_fp64

    path = os.path.join(sf_dir, "documents.parquet")

    def bit_rows(batch: pa.Table) -> pa.Table:
        pos = np.unique(_bloom_positions(
            md5_fp64(batch.column("text").to_pylist())))
        return pa.table({
            "pos": pa.array(pos, pa.int64()),
            "one": pa.array(np.ones(len(pos), dtype=np.int64))})

    bits_t = bucketed_sum(
        ray.data.read_parquet(path, columns=["text"])
        .map_batches(bit_rows, batch_format="pyarrow"),
        ["pos"], ["one"]).to_pandas()  # <= m rows, any corpus size
    filt = np.zeros(_BLOOM_M, dtype=bool)
    filt[bits_t["pos"].to_numpy(dtype=np.int64)] = True

    def hits(f: np.ndarray, fps: np.ndarray) -> int:
        if not len(fps):
            return 0
        return int(f[_bloom_positions(fps)].all(axis=1).sum())

    # present probes run DISTRIBUTED over the same pruned read with the
    # filter broadcast once — a driver-side read of the text column
    # would materialize the whole corpus in one process
    filt_ref = ray.put(filt)

    def probe_rows(batch: pa.Table) -> pa.Table:
        fps = md5_fp64(batch.column("text").to_pylist())
        h = hits(ray.get(filt_ref), fps)
        return pa.table({"n": pa.array([len(fps)], pa.int64()),
                         "h": pa.array([h], pa.int64())})

    agg = (ray.data.read_parquet(path, columns=["text"])
           .map_batches(probe_rows, batch_format="pyarrow").to_pandas())
    n_present, present_hits = int(agg["n"].sum()), int(agg["h"].sum())
    absent = md5_fp64([f"synthetic absent probe #{i}"
                       for i in range(n_absent)])

    return pa.table({
        "probe_kind": pa.array(["present", "absent"], pa.string()),
        "n_probes": pa.array([n_present, len(absent)], pa.int64()),
        "n_hits": pa.array([present_hits, hits(filt, absent)],
                           pa.int64())})
