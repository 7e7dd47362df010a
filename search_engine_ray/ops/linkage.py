"""Fuzzy record linkage: the edit-distance-1 self-join (duplicate /
near-duplicate entity detection over a name column) without the O(n^2)
cross join.

Blocking is the classic DELETION-NEIGHBORHOOD signature scheme (the
FastSS family, public literature): sig(s) = {s} union {s minus one
character}.  Two strings within one edit ALWAYS share a signature
(substitution: delete the edited position from both; insertion /
deletion: the shorter string IS a signature of the longer), so recall
is 1.0 by construction; the converse does not hold (e.g. "xy"/"yx"
share "x" but are 2 edits apart), so candidates are verified exactly.
Unlike prefix/suffix-half blocking, deletion signatures stay BALANCED
when all records share a long common prefix (the TPC-H name shape
"Customer#00000..."), because the signature carries the whole string
minus one character.

Scale shape: each record emits len+1 signature rows (hash64 of the
variant) into ONE bucket shuffle; complete signature groups meet in a
bucket, tiny per-signature groups emit candidate pairs, and a second
(k1, k2)-keyed shuffle dedupes multi-signature pairs and verifies
edit distance <= 1 with the lcp+lcs identity (exactly levenshtein<=1,
same rule as ops/fulltext._one_edit_mask).  Nothing quadratic in the
table ever materializes; the SQL mirror IS the brute-force cross join,
which is the point — it proves the blocking loses nothing.

One quadratic hazard is inherent to the PROBLEM, not the blocking: m
records with IDENTICAL values form m(m-1)/2 pairs by definition (the
SQL mirror enumerates them too).  On a corpus where exact-duplicate
names are heavy, collapse identical values first (exact_dedup's
fingerprint shuffle) and run this join over the distinct values — the
edit-distance structure lives between distinct strings.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from search_engine_ray.ops.dedup import _hash64


def _ed1(a: str, b: str) -> bool:
    """levenshtein(a, b) <= 1 via the lcp+lcs identity: within one
    edit iff the length gap is <= 1 and common-prefix + common-suffix
    covers all but at most one position of the longer string."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    lim = min(la, lb)
    p = 0
    while p < lim and a[p] == b[p]:
        p += 1
    s = 0
    while s < lim - p and a[la - 1 - s] == b[lb - 1 - s]:
        s += 1
    return p + s >= max(la, lb) - 1


def fuzzy_name_pairs(sf_dir: str, table: str = "customer",
                     key: str = "c_custkey", col: str = "c_name"):
    """(k1, k2) key pairs (k1 < k2, ascending) whose ``col`` values are
    within ONE edit of each other — see module docstring for the
    deletion-signature blocking + exact verify design."""
    import ray.data

    from search_engine_ray.ops.shuffle import bucketed_apply

    ds = ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                               columns=[key, col])

    def sigs(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_numpy()
        names = batch.column(col).to_pylist()
        out_sig, out_key, out_name = [], [], []
        for k, s in zip(keys, names):
            variants = {s}
            variants.update(s[:i] + s[i + 1:] for i in range(len(s)))
            for v in variants:
                out_sig.append(_hash64(v.encode("utf-8")))
                out_key.append(k)
                out_name.append(s)
        return pa.table({
            "sig": pa.array(np.array(out_sig, np.uint64)
                            .view(np.int64), pa.int64()),
            "k": pa.array(np.asarray(out_key, np.int64), pa.int64()),
            "name": pa.array(out_name, pa.string())})

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows1, rows2, n1, n2 = [], [], [], []
        for _, grp in g.groupby("sig", sort=False):
            if len(grp) < 2:
                continue
            # a signature group is a handful of records (strings whose
            # one-deletion variants coincide) — all-pairs here is tiny
            recs = sorted(set(zip(grp["k"], grp["name"])))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    rows1.append(recs[i][0])
                    rows2.append(recs[j][0])
                    n1.append(recs[i][1])
                    n2.append(recs[j][1])
        return pd.DataFrame({
            "k1": np.asarray(rows1, np.int64),
            "k2": np.asarray(rows2, np.int64),
            "n1": np.asarray(n1, object), "n2": np.asarray(n2, object)})

    def verify_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["k1", "k2"])
        keep = [_ed1(a, b) for a, b in zip(g["n1"], g["n2"])]
        out = g.loc[keep, ["k1", "k2"]].reset_index(drop=True)
        return out.astype({"k1": np.int64, "k2": np.int64})

    cands = bucketed_apply(ds.map_batches(sigs, batch_format="pyarrow"),
                           ["sig"], pairs_per_bucket)
    return bucketed_apply(cands, ["k1", "k2"], verify_per_bucket)
