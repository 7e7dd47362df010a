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


# ---------------------------------------------------------------- indexed
# The same phrase/proximity semantics served from a POSITIONAL index
# (EngineConfig positions=True, raw_tokens=True, tokenizer="simple") —
# the serving path a search stack actually uses (the reference's query
# tier never rescans the corpus, /root/reference/searcher.py:22-111).
# The scan ops above remain the oracle: phrase_match_indexed must return
# exactly phrase_match_docs' rows.

_POS_IDX_CACHE: dict[str, tuple] = {}


def positional_index(sf_dir: str):
    """Build (once per process per sf_dir) a positional index over the
    documents table with raw simple tokenization, so term positions are
    indices into ``simple_tokenize(text)`` — byte-parity with the scan
    ops and their SQL mirror.  Returns (engine, hashed-id -> original
    doc_id map)."""
    import hashlib
    import tempfile

    import pyarrow.dataset as pads

    from search_engine_ray.adapters import documents_to_pages_parquet
    from search_engine_ray.config import EngineConfig
    from search_engine_ray.ids import doc_id_for_url
    from search_engine_ray.index.build import build_index
    from search_engine_ray.query.engine import SearchEngine

    # key on the source CONTENT identity (size + mtime), not just the
    # path — a regenerated documents.parquet at the same path must not
    # be served stale results from a prior process's /tmp index
    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    st = os.stat(src)
    key = f"{src}|{st.st_size}|{st.st_mtime_ns}"
    if key in _POS_IDX_CACHE:
        return _POS_IDX_CACHE[key]
    tag = hashlib.blake2b(key.encode(), digest_size=6).hexdigest()
    base = os.path.join(tempfile.gettempdir(), f"se_ray_posidx_{tag}")
    pages = os.path.join(base, "pages")
    index = os.path.join(base, "index")
    if not os.path.exists(os.path.join(pages, "_DONE")):
        import shutil

        shutil.rmtree(pages, ignore_errors=True)
        documents_to_pages_parquet(sf_dir, pages)
        open(os.path.join(pages, "_DONE"), "w").close()
    build_index(pages, index, EngineConfig(
        tokenizer="simple", raw_tokens=True, positions=True,
        prune_df1=False, harvest_page_url=False))
    t = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
        columns=["doc_id", "source"])
    idmap = {doc_id_for_url(f"{s}/{d}"): d
             for d, s in zip(t.column("doc_id").to_pylist(),
                             t.column("source").to_pylist())}
    eng = SearchEngine(index)
    _POS_IDX_CACHE[key] = (eng, idmap)
    return eng, idmap


def phrase_match_indexed(sf_dir: str, phrase: str = "query scan"):
    """Docs containing the exact token sequence ``phrase``, answered
    from positional postings (no corpus scan).  Equal to
    phrase_match_docs by construction of the raw-token index."""
    eng, idmap = positional_index(sf_dir)
    docs = eng.phrase_docs(simple_tokenize(phrase))
    return pa.table({"doc_id": pa.array(
        sorted(idmap[int(d)] for d in docs), pa.int64())})


def proximity_match_indexed(sf_dir: str, t1: str = "query",
                            t2: str = "scan", window: int = 3):
    """(doc_id, min_gap) for docs where ``t1`` and ``t2`` occur within
    ``window`` positions, answered from positional postings."""
    eng, idmap = positional_index(sf_dir)
    docs, gaps = eng.proximity_docs(t1, t2, window=window)
    rows = sorted((idmap[int(d)], int(g)) for d, g in zip(docs, gaps))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "min_gap": pa.array([r[1] for r in rows], pa.int64())})


DEFAULT_STANDING_QUERIES = {
    1: ["spark", "data"],
    2: ["query", "scan"],
    3: ["zzznope"],
}


def percolate(sf_dir: str, queries=None):
    """Standing queries / percolation (the reverse of search, the
    alerting primitive): which stored boolean-AND term queries match
    each document of the stream.  ``queries`` is {query_id: [terms]};
    emits (doc_id, query_id) per match.

    Scale shape: the query registry is broadcast state evaluated
    vectorized per batch — one space-joined token string per doc, one
    Arrow match_substring kernel per distinct query term, AND-folded
    per query — so the corpus streams once regardless of query count.
    Alerting registries are bounded (thousands); at millions of stored
    queries the right structure inverts the QUERIES (route each doc by
    its terms through a query-term index) — the corpus-side streaming
    shape here is unchanged by that upgrade."""
    import pyarrow.compute as pc
    import ray.data

    if queries is None:
        queries = DEFAULT_STANDING_QUERIES
    qitems = sorted((int(q), [t for t in terms])
                    for q, terms in queries.items())

    def match(batch: pa.Table) -> pa.Table:
        toks = [simple_tokenize(t)
                for t in batch.column("text").to_pylist()]
        joined = pa.array([" " + " ".join(ts) + " " for ts in toks],
                          pa.string())
        ids = batch.column("doc_id").to_numpy()
        terms = {t for _, ts in qitems for t in ts}
        member = {t: pc.match_substring(joined, f" {t} ")
                  .to_numpy(zero_copy_only=False) for t in terms}
        out_doc, out_q = [], []
        for qid, ts in qitems:
            hit = np.ones(len(ids), bool)
            for t in ts:
                hit &= member[t]
            out_doc.extend(ids[hit].tolist())
            out_q.extend([qid] * int(hit.sum()))
        return pa.table({
            "doc_id": pa.array(np.asarray(out_doc, np.int64),
                               pa.int64()),
            "query_id": pa.array(np.asarray(out_q, np.int64),
                                 pa.int64())})

    return (ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])
        .map_batches(match, batch_format="pyarrow"))
