"""Real GloVe snapshot loading (reference loads glove.twitter.27B.25d.txt
at import, /root/reference/search_engine.py:13-23): the engine, build and
oracle consume a snapshot via EngineConfig.glove_path and agree on
reference-mode scores."""

import numpy as np
import pytest


def _write_snapshot_txt(path, words, dim, seed=3):
    rng = np.random.default_rng(seed)
    with open(path, "w", encoding="utf-8") as f:
        for w in words:
            v = rng.standard_normal(dim)
            f.write(w + " " + " ".join(f"{x:.6f}" for x in v) + "\n")


def test_snapshot_txt_and_parquet_load(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.glove import GloveCache, load_glove_snapshot

    p = str(tmp_path / "mini.txt")
    _write_snapshot_txt(p, ["covid", "vaccine", "data"], 25)
    snap = load_glove_snapshot(p, dim=25)
    assert set(snap) == {"covid", "vaccine", "data"}
    assert snap["covid"].shape == (25,)

    g = GloveCache(p, 25)
    assert g.get("covid") is not None
    assert g.get("absentword") is None  # real-vocabulary miss path

    # parquet form round-trips to the same vectors
    pqp = str(tmp_path / "mini.parquet")
    pq.write_table(pa.table({
        "word": pa.array(list(snap)),
        "vector": pa.array([snap[w].tolist() for w in snap]),
    }), pqp)
    snap2 = load_glove_snapshot(pqp, dim=25)
    for w in snap:
        assert np.allclose(snap[w], snap2[w])

    # dim mismatch fails loudly
    bad = str(tmp_path / "bad.txt")
    _write_snapshot_txt(bad, ["x"], 10)
    with pytest.raises(ValueError):
        load_glove_snapshot(bad, dim=25)


def test_engine_oracle_parity_with_snapshot(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.fixtures import gen_pages
    from search_engine_ray.index.build import build_index
    from search_engine_ray.oracle import OracleIndex
    from search_engine_ray.query.engine import SearchEngine

    pages = gen_pages(150, seed=11)
    # snapshot covering most of the corpus vocabulary (some words absent,
    # exercising the miss path)
    from search_engine_ray.text.tokenizer import simple_tokenize

    vocab = sorted({t for txt in pages.column("text").to_pylist()
                    for t in simple_tokenize(txt)})[:300]
    snap_dir = tmp_path_factory.mktemp("glove")
    snap = str(snap_dir / "mini.txt")
    _write_snapshot_txt(snap, vocab, 25)

    data_dir = tmp_path_factory.mktemp("gpages")
    out_dir = str(tmp_path_factory.mktemp("gindex"))
    pq.write_table(pages, str(data_dir / "pages.parquet"),
                   row_group_size=128)
    cfg = EngineConfig(num_shards=4, term_buckets=4, parser_concurrency=2,
                       glove_path=snap)
    build_index(str(data_dir), out_dir, cfg)

    oracle = OracleIndex(cfg)
    oracle.build(list(zip(
        pages.column("url").to_pylist(),
        [x.value for x in pages.column("warc_ts")],
        pages.column("text").to_pylist(),
    )))
    eng = SearchEngine(out_dir)
    assert eng.cfg.glove_path == snap  # manifest round-trips the path
    for q in ("covid vaccine", "the president said", "data"):
        a = eng.search(q, k=10, mode="reference")
        b = oracle.search(q, k=10)
        assert [(d, ts) for _, d, ts in a] == [(d, ts) for _, d, ts in b], q
        for (sa, _, _), (sb, _, _) in zip(a, b):
            assert abs(sa - sb) < 1e-9, q
