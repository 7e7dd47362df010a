"""Distributed (shard-actor) query serving must be rank-identical to the
in-process engine in both scorer modes."""

import pytest

from search_engine_ray.fixtures import gen_queries


@pytest.fixture(scope="module")
def dist_engine(ray_session, built_index):
    from search_engine_ray.query.distributed import DistributedSearchEngine

    return DistributedSearchEngine(built_index[0], num_actors=2)


@pytest.mark.parametrize("mode", ["bm25", "reference"])
def test_distributed_matches_inprocess(dist_engine, engine, mode):
    for q in gen_queries():
        a = engine.search(q, k=10, mode=mode)
        b = dist_engine.search(q, k=10, mode=mode)
        assert [(d, ts) for _, d, ts in a] == [(d, ts) for _, d, ts in b], q
        for (sa, _, _), (sb, _, _) in zip(a, b):
            assert abs(sa - sb) < 1e-9, q


def test_meta_positions_found_mask():
    """A doc id absent from docmeta must come back found=False (callers
    zero its ts/glove) instead of borrowing a neighbor's row."""
    import numpy as np

    from search_engine_ray.query.distributed import meta_positions

    ids = np.array([10, 20, 30], dtype=np.int64)
    pos, found = meta_positions(ids, np.array([5, 20, 25, 40]))
    assert found.tolist() == [False, True, False, False]
    assert ids[pos[1]] == 20
    # empty docmeta: nothing found, no crash
    pos, found = meta_positions(np.zeros(0, np.int64), np.array([1, 2]))
    assert found.tolist() == [False, False]
    assert pos.tolist() == [0, 0]


def test_repeated_term_missing_from_shard_parity(ray_session,
                                                 tmp_path_factory):
    """Reference-mode qtf must use GLOBAL term knownness: a query repeating
    a term whose postings live in only one shard must score identically on
    actors that hold none of its postings (ADVICE r1: local-presence qtf
    changed the query-vector norm on those actors)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.ids import doc_id_for_url
    from search_engine_ray.index.build import build_index
    from search_engine_ray.query.distributed import DistributedSearchEngine
    from search_engine_ray.query.engine import SearchEngine
    from search_engine_ray.text.extract import wrap_html

    S = 4
    # find two urls whose hashed doc ids land in the SAME shard, and
    # filler urls spread over the others
    rare, fillers = [], []
    i = 0
    while len(rare) < 2 or len(fillers) < 12:
        url = f"ex.com/p{i}"
        if doc_id_for_url(url) % S == 0 and len(rare) < 2:
            rare.append(url)
        elif doc_id_for_url(url) % S != 0 and len(fillers) < 12:
            fillers.append(url)
        i += 1
    urls = rare + fillers
    # 'merge'/'data' must have df < N (nonzero idf) or every local dvec
    # zeroes out and the qtf bug is invisible
    texts = (["the qwxzebra molecule binds the merge protein data"] * 2
             + ["common merge data protein words appear here often"] * 6
             + ["common protein words appear here generally today"] * 6)
    t = pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array([1595808000_000_000 + j * 1_000_000
                             for j in range(len(urls))],
                            pa.timestamp("us")),
        "html": pa.array([wrap_html(x, f"t{j}")
                          for j, x in enumerate(texts)], pa.binary()),
    })
    data_dir = tmp_path_factory.mktemp("skewpages")
    out_dir = str(tmp_path_factory.mktemp("skewindex"))
    pq.write_table(t, str(data_dir / "pages.parquet"))
    build_index(str(data_dir), out_dir,
                EngineConfig(num_shards=S, term_buckets=4,
                             parser_concurrency=2))
    eng = SearchEngine(out_dir)
    dist = DistributedSearchEngine(out_dir, num_actors=S)
    # 'qwxzebra' df=2 (survives the df==1 prune), all postings in shard 0;
    # repeating it makes qtf degenerate on shards 1..3 under the old code
    for q in ("qwxzebra qwxzebra merge", "qwxzebra qwxzebra qwxzebra data"):
        a = eng.search(q, k=10, mode="reference")
        b = dist.search(q, k=10, mode="reference")
        assert [(d, ts) for _, d, ts in a] == [(d, ts) for _, d, ts in b], q
        for (sa, _, _), (sb, _, _) in zip(a, b):
            assert abs(sa - sb) < 1e-9, q


@pytest.mark.parametrize("mode", ["bool_and", "bool_or"])
def test_distributed_boolean_matches_inprocess(dist_engine, engine, mode):
    for q in gen_queries():
        assert dist_engine.search(q, k=10, mode=mode) == \
            engine.search(q, k=10, mode=mode), (q, mode)
    # k smaller than the local result sets still yields the global
    # ascending first-k
    assert dist_engine.search("covid", k=3, mode="bool_and") == \
        engine.search("covid", k=3, mode="bool_and")


def test_distributed_and_not_matches_inprocess(dist_engine, engine):
    cases = [(["covid", "vaccine"], []),
             (["covid", "vaccine"], ["data"]),
             (["covid"], ["zzznope"]),       # unknown exclude = no-op
             (["zzznope"], ["covid"]),       # unknown include -> []
             (["covid"], ["covid"]),         # self-exclusion -> []
             ([], ["covid"])]                # empty include -> []
    for inc, exc in cases:
        assert dist_engine.search_bool_and_not(inc, exc, k=10) == \
            engine.search_bool_and_not(inc, exc, k=10), (inc, exc)


def test_distributed_fuzzy_matches_inprocess(dist_engine, engine):
    for q in ("covit vaccine", "qqqqqqqq", "covid"):
        for mode in ("bm25", "bool_and"):
            assert dist_engine.search(q, k=10, mode=mode, fuzzy=True) == \
                engine.search(q, k=10, mode=mode, fuzzy=True), (q, mode)


def test_bool_and_not_negative_k(dist_engine, engine):
    assert engine.search_bool_and_not(["covid"], [], k=-1) == []
    assert dist_engine.search_bool_and_not(["covid"], [], k=-1) == []


def test_distributed_tiered_matches_inprocess(dist_engine, engine):
    """Two-round champion protocol (local prefixes -> global re-select
    -> must_ids-masked fan-out) is rank-identical to the in-process
    search_tiered at both a pruning m and an exact-equivalent m."""
    for q in gen_queries():
        for m in (3, 10**9):
            a = engine.search_tiered(q, k=10, m=m)
            b = dist_engine.search_tiered(q, k=10, m=m)
            assert [(d, ts) for _, d, ts in a] \
                == [(d, ts) for _, d, ts in b], (q, m)
            for (sa, _, _), (sb, _, _) in zip(a, b):
                assert abs(sa - sb) < 1e-9, (q, m)


def test_distributed_match_counts(dist_engine, engine):
    for q in list(gen_queries()) + ["zzznotaterm virus", "", "the"]:
        assert dist_engine.match_counts(q) == engine.match_counts(q), q


def test_distributed_common_terms_matches_inprocess(dist_engine, engine):
    rare = min(engine.df_map, key=lambda t: engine.df_map[t])
    for q in list(gen_queries()) + [f"{rare} virus covid", rare,
                                    "zzznotaterm"]:
        a = engine.search_common_terms(q, k=10)
        b = dist_engine.search_common_terms(q, k=10)
        assert [(d, ts) for _, d, ts in a] == [(d, ts) for _, d, ts in b], q
        for (sa, _, _), (sb, _, _) in zip(a, b):
            assert abs(sa - sb) < 1e-9, q
