"""Corpus-scan phrase and proximity matching — the query shapes a
full-scan engine answers when no positional index exists (and the
oracle for one that does).  Both are single streaming passes with
vectorized per-batch kernels; no shuffle at all.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from search_engine_ray.text.tokenizer import simple_tokenize


def phrase_match_docs(sf_dir: str, phrase: str = "query scan"):
    """Docs containing the exact token sequence ``phrase`` (after the
    SQL-mirrored simple tokenization).  The match is ONE vectorized
    substring search per batch: tokens contain no spaces, so doc
    ' '.join(tokens) contains ' phrase ' (space-padded) iff the token
    sequence occurs — no per-position Python loop, and the same
    rewrite the SQL oracle uses."""
    import pyarrow.compute as pc
    import ray.data

    needle = " " + " ".join(simple_tokenize(phrase)) + " "

    def match(batch: pa.Table) -> pa.Table:
        joined = [" " + " ".join(simple_tokenize(t)) + " "
                  for t in batch.column("text").to_pylist()]
        keep = pc.match_substring(pa.array(joined, pa.string()), needle)
        return batch.select(["doc_id"]).filter(keep)

    return (ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])
        .map_batches(match, batch_format="pyarrow"))


def proximity_match_docs(sf_dir: str, t1: str = "query", t2: str = "scan",
                         window: int = 3):
    """Docs where ``t1`` and ``t2`` occur within ``window`` token
    positions of each other, with the minimum absolute position gap —
    the proximity operator of a search engine, as a corpus scan.

    Vectorized per doc: both terms' position arrays come from ONE
    np.nonzero over the token array; the min pairwise gap of two sorted
    arrays is a searchsorted, not a cross product."""
    import ray.data

    def match(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        out_id, out_gap = [], []
        for i, t in zip(ids, batch.column("text").to_pylist()):
            ts = np.asarray(simple_tokenize(t), dtype=object)
            p1 = np.flatnonzero(ts == t1)
            p2 = np.flatnonzero(ts == t2)
            if not len(p1) or not len(p2):
                continue
            j = np.searchsorted(p2, p1)
            lo = np.clip(j - 1, 0, len(p2) - 1)
            hi = np.clip(j, 0, len(p2) - 1)
            best = int(np.minimum(np.abs(p1 - p2[lo]),
                                  np.abs(p1 - p2[hi])).min())
            if best <= window:
                out_id.append(int(i))
                out_gap.append(best)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "min_gap": pa.array(out_gap, pa.int64())})

    return (ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])
        .map_batches(match, batch_format="pyarrow"))
