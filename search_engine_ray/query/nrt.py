"""Near-real-time (NRT) serving: make newly-added docs searchable
IMMEDIATELY, without a rebuild or merge.

``NrtSearchEngine`` wraps a built on-disk index (`SearchEngine`) plus an
in-memory delta segment (an `OracleIndex` accumulator — the same trusted
token/dict derivation the build pipeline is conformance-tested against,
oracle.py).  ``add_pages`` parses into the segment; ``search`` scores
base+segment candidates with COMBINED corpus statistics (n_docs, sum of
doc lengths, per-term df), so a doc's BM25 score — and therefore the
ranking — is exactly what a full rebuild over base+delta would produce.
The public model is Lucene's NRT reader (IndexWriter.getReader); the
reference has no NRT path at all — it rebuilds per run
(/root/reference/search_engine.py:29-72).

Exact-rebuild parity holds when the dict verdicts are delta-stable:
tokenizer="simple"-class configs (no capitals/entity rules reachable)
with prune_df1=False — gated by tests/test_round5_ops.py against a real
rebuild.  Under the full reference config the segment applies
capitals/entity rules segment-locally and the df==1 prune on the
COMBINED df, so NRT is eventually-consistent until ``flush`` (exactly
Lucene's posture: global decisions re-derive at merge time).

At cluster scale the segment is per-ingest-actor state (the same
placement as ST4's accumulators-turned-shuffles): deltas stay small
because ``flush`` periodically persists them through the build's own
spill+reduce via index/merge.py (no re-parse of the base corpus).
"""

from __future__ import annotations

import math

import numpy as np

from search_engine_ray.ids import doc_id_for_url
from search_engine_ray.index import manifest as mf
from search_engine_ray.index.encoding import tf_norm
from search_engine_ray.oracle import OracleIndex
from search_engine_ray.query.engine import (
    SearchEngine,
    _topk_reference_order,
)


class NrtSearchEngine:
    def __init__(self, out_dir: str):
        self.base = SearchEngine(out_dir)
        self.out_dir = out_dir
        man = mf.read_manifest(out_dir)
        # integer sum from the manifest — reconstructing it as
        # avg*n would be off by an ulp and break exact rebuild parity
        self._base_sum_dl = int(man["sum_doc_length"])
        self._raw = OracleIndex(self.base.cfg)
        self._pages: list[tuple[str, int, str]] = []
        self._view = None  # cached finalized segment view

    # ------------------------------------------------------------ ingest
    @property
    def n_docs(self) -> int:
        return self.base.n_docs + self._raw.n_docs

    @property
    def segment_docs(self) -> int:
        return self._raw.n_docs

    def add_pages(self, pages) -> int:
        """Add documents; returns how many parsed (visible to the very
        next ``search``).  ``pages``: iterable of (url, warc_ts_us,
        text) or a pages Arrow table (url/warc_ts/text columns).  A url
        already present in the base index or the segment is rejected —
        an update is delete+add, exactly as in the reference's
        id-keyed world (and Lucene's updateDocument)."""
        import pyarrow as pa

        if isinstance(pages, pa.Table):
            pages = zip(pages.column("url").to_pylist(),
                        [x.value for x in pages.column("warc_ts")],
                        pages.column("text").to_pylist())
        # validate the WHOLE batch before mutating anything: a dup-url
        # reject must leave the engine exactly as it was (no
        # half-applied batch, no stale cached view)
        batch = [(url, int(ts), text) for url, ts, text in pages]
        seen: set[int] = set()
        for url, _ts, _text in batch:
            did = doc_id_for_url(url)
            _pos, found = self.base._meta_for(np.array([did], np.int64))
            if bool(found[0]) or did in self._raw.doc_meta or did in seen:
                raise ValueError(f"url already indexed: {url!r}")
            seen.add(did)
        added = 0
        try:
            for url, ts, text in batch:
                if self._raw.add_page(url, ts, text):
                    self._pages.append((url, ts, text))
                    added += 1
        finally:
            self._view = None
        return added

    # ----------------------------------------------------------- segment
    def _segment(self):
        """Finalized view of the in-memory segment WITHOUT mutating the
        accumulator (OracleIndex.finalize is one-shot; NRT keeps
        accepting adds): {term: (ids, tfs, dls)}, {term: df}, {id: ts}.
        Dict rules are applied segment-locally except the df==1 prune,
        which must see the COMBINED df (search applies it)."""
        if self._view is not None:
            return self._view
        o = self._raw
        # the oracle's own non-mutating rules pass (prune deferred to
        # the combined df — search applies it) so the segment can never
        # drift from the build semantics it mirrors
        fpost, df = o.finalized_rules(prune_df1=False)
        post: dict[str, tuple] = {}
        for term, pl in fpost.items():
            post[term] = (
                np.array([p[0] for p in pl], np.int64),
                np.array([p[4] for p in pl], np.int64),
                np.array([p[1] for p in pl], np.int64),
            )
        seg_ts = {d: int(m[1]) for d, m in o.doc_meta.items()}
        self._view = (post, df, seg_ts)
        return self._view

    # ------------------------------------------------------------ search
    def search(self, query_text: str, k: int = 10, mode: str = "bm25"):
        """BM25 (score, doc_id, ts) top-k over base+segment with
        combined corpus statistics — rank-identical to a rebuild under
        delta-stable dict verdicts (module docstring)."""
        if mode != "bm25":
            raise ValueError("NRT serving supports mode='bm25'")
        if k < 0:
            return []
        if k == 0:
            k = max(self.n_docs, 1)
        query, _, _ = self.base.parser.parse_sentence(query_text)
        if not query:
            return []
        post, seg_df, seg_ts = self._segment()
        cfg = self.base.cfg
        N = self.n_docs
        sum_dl = self._base_sum_dl + self._raw.sum_dl
        avgdl = sum_dl / N if N else 0.0
        terms = list(dict.fromkeys(query))
        self.base.prefetch([t for t in terms if t in self.base.df_map])
        id_parts, contrib_parts = [], []
        for t in terms:
            df = self.base.df_map.get(t, 0) + seg_df.get(t, 0)
            if df == 0 or (cfg.prune_df1 and df < 2):
                # unknown everywhere, or the rebuild would df==1-prune
                continue
            idf = math.log10(N / df)
            bp = self.base.postings(t)
            if bp is not None and len(bp["doc_ids"]):
                id_parts.append(bp["doc_ids"])
                contrib_parts.append(idf * tf_norm(
                    bp["tfs"], bp["dls"].astype(np.float64),
                    avgdl, cfg.bm25_k1, cfg.bm25_b))
            sp = post.get(t)
            if sp is not None:
                ids, tfs, dls = sp
                id_parts.append(ids)
                contrib_parts.append(idf * tf_norm(
                    tfs, dls.astype(np.float64),
                    avgdl, cfg.bm25_k1, cfg.bm25_b))
        if not id_parts:
            return []
        ids = np.concatenate(id_parts)
        contribs = np.concatenate(contrib_parts)
        cand, inv = np.unique(ids, return_inverse=True)
        scores = np.bincount(inv, weights=contribs, minlength=len(cand))
        pos, found = self.base._meta_for(cand)
        ts = self.base._meta["ts"][pos] * found
        if seg_ts:
            s_ids = np.fromiter(sorted(seg_ts), np.int64, len(seg_ts))
            s_vals = np.array([seg_ts[int(i)] for i in s_ids], np.int64)
            p2 = np.clip(np.searchsorted(s_ids, cand), 0, len(s_ids) - 1)
            hit = s_ids[p2] == cand
            ts = np.where(hit, s_vals[p2], ts)
        return _topk_reference_order(scores, cand, ts, k)

    # ------------------------------------------------------------- flush
    def flush(self, work_dir: str) -> str:
        """Persist the segment through the build's own pipeline and fold
        it into the base via index/merge.py (no re-parse of the base
        corpus); returns the merged index dir.  The engine REPOINTS to
        the merged index and clears the segment, so serving continues
        seamlessly over the same documents (the Lucene NRT-commit
        contract) and flushed urls stay dup-protected.  ``work_dir``
        receives pages/, delta/ and merged/ subdirs."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from search_engine_ray.index.build import build_index
        from search_engine_ray.index.merge import merge_indexes
        from search_engine_ray.text.extract import wrap_html

        if not self._pages:
            return self.out_dir
        pages_dir = os.path.join(work_dir, "pages")
        delta_dir = os.path.join(work_dir, "delta")
        merged_dir = os.path.join(work_dir, "merged")
        os.makedirs(pages_dir, exist_ok=True)
        urls, tss, texts = zip(*self._pages)
        pq.write_table(pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(list(tss), pa.timestamp("us")),
            # the parse stage extracts from html (input_hint contract);
            # the F1 wrap is its byte-identical inverse
            "html": pa.array([wrap_html(t, "seg") for t in texts],
                             pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }), os.path.join(pages_dir, "segment.parquet"))
        build_index(pages_dir, delta_dir, self.base.cfg)
        merge_indexes([self.out_dir, delta_dir], merged_dir)
        self.base = SearchEngine(merged_dir)
        self.out_dir = merged_dir
        self._base_sum_dl = int(
            mf.read_manifest(merged_dir)["sum_doc_length"])
        self._raw = OracleIndex(self.base.cfg)
        self._pages = []
        self._view = None
        return merged_dir
