"""Bucketed group-apply — the scalable replacement for per-key
``Dataset.groupby(keys).map_groups(udf)``.

Ray's groupby dispatches the UDF once per DISTINCT KEY from Python
(and multi-column keys sort a composite), which costs milliseconds per
group: measured in this repo, a 105k-key aggregate took 261 s where the
bucketed equivalent took 3 s, and a near-dup pipeline of per-node
groupbys took ~160 s at 500 docs.  At 10^9+ keys (every doc_id of a
100-TB corpus) per-key dispatch is catastrophic — so every many-key
group-apply here shuffles ONE bucket key ``hash(keys) % n_buckets``
(deterministic `pandas.util.hash_array`, stable across worker
processes) and runs a VECTORIZED pandas transform inside each bucket.
The shuffle volume is identical; only the dispatch granularity changes.
``n_buckets`` is the reduce-partition count — size it with the cluster
exactly like the index build's (tbucket, sshard) grid.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

_BK = "__bk"


def default_n_buckets() -> int:
    """Reduce-partition count for the bucketed shuffles, sized with the
    cluster: 8 buckets per CPU (overridable via SE_RAY_N_BUCKETS), so a
    256-node x 64-core cluster gets ~128k buckets and each bucket holds
    ~1/131072 of the shuffled rows — one bucket is ONE pandas frame in
    ONE reduce task, so this bound is what keeps per-worker memory flat
    as the corpus grows.  At the 32-CPU test session this resolves to
    256 (the historical constant), and a floor of 64 keeps tiny local
    sessions from collapsing to a handful of giant buckets."""
    env = os.environ.get("SE_RAY_N_BUCKETS")
    if env:
        return max(1, int(env))
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 32)) \
            if ray.is_initialized() else 32
    except Exception:
        cpus = 32
    return max(64, cpus * 8)


def _bucket_ids(batch: pa.Table, keys, n_buckets: int) -> np.ndarray:
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        vals = batch.column(k).to_numpy(zero_copy_only=False)
        if vals.dtype.kind == "f":
            # tagged-union sides routinely null-pad an int key, turning
            # it float64 in pandas blocks; hash the integral value so
            # 413.0 and 413 land in the SAME bucket (keys here are doc /
            # band ids — integral by construction)
            vals = vals.astype(np.int64)
        h = h * np.uint64(0x9E3779B97F4A7C15) + pd.util.hash_array(vals)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def bucketed_apply(ds, keys, bucket_udf, n_buckets: int | None = None):
    """``bucket_udf(df) -> df`` runs once per hash bucket over ALL rows
    whose ``keys`` hash there (complete key groups, co-partitioned).
    The udf must be key-group-aware itself (vectorized groupby/merge
    inside) — that is the point.  ``n_buckets`` defaults to
    ``default_n_buckets()`` (cluster-width-scaled)."""
    keys = list(keys)
    if n_buckets is None:
        n_buckets = default_n_buckets()

    def add_bk(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            _BK, pa.array(_bucket_ids(batch, keys, n_buckets)))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return bucket_udf(g.drop(columns=[_BK]))

    return (ds.map_batches(add_bk, batch_format="pyarrow")
              .groupby(_BK).map_groups(run, batch_format="pandas"))


def grouped_apply(ds, keys, group_udf, n_buckets: int | None = None):
    """Drop-in for ``ds.groupby(keys).map_groups(group_udf)`` with
    bucket-level dispatch: the per-group Python loop runs INSIDE one
    pandas partition (µs per group) instead of through Ray's per-key
    scheduler (ms per group)."""
    keys = list(keys)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = [group_udf(sub)
                for _, sub in g.groupby(keys, sort=False)]
        # zero-row outputs are dropped before concat: an empty frame
        # built from plain [] lists carries float64 dtypes and would
        # poison the concat's integer columns
        nonempty = [o for o in outs if len(o)]
        if nonempty:
            return pd.concat(nonempty, ignore_index=True)
        return outs[0]

    return bucketed_apply(ds, keys, per_bucket, n_buckets=n_buckets)


def bucketed_sum(ds, keys, value_cols, rename=None,
                 n_buckets: int | None = None):
    """``groupby(keys).sum(value_cols)`` via one bucket shuffle and a
    vectorized pandas aggregation per bucket.  INTEGER value columns
    only: bucketing changes float accumulation order, which matters for
    oracles that compare exact sums — keep float aggregates on exact
    integer scaling (per-row e4 ints) or on Ray's native aggregate."""
    keys = list(keys)
    value_cols = list(value_cols)

    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(keys, sort=False)[value_cols].sum()
                .reset_index())
        return out.rename(columns=rename) if rename else out

    return bucketed_apply(ds, keys, agg_bucket, n_buckets=n_buckets)
