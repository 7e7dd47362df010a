"""Golden-oracle conformance (SURVEY.md §5.1): the distributed Ray build
and query engine must match the single-process reference-semantics oracle
— identical dictionary, identical postings, rank-identical top-k."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import EngineConfig
from search_engine_ray.fixtures import gen_pages, gen_queries
from search_engine_ray.oracle import OracleIndex


def test_manifest_stats_match_oracle(built_index, small_oracle):
    _, man, _, _ = built_index
    assert man["n_docs"] == small_oracle.n_docs
    assert abs(man["avg_doc_length"] - small_oracle.avg_dl) < 1e-12


def test_dictionary_identical(engine, small_oracle):
    assert set(engine.df_map) == set(small_oracle.df)
    for t, df in small_oracle.df.items():
        assert engine.df_map[t] == df, t


def test_postings_identical(engine, small_oracle):
    for term, plist in small_oracle.postings.items():
        o = sorted(plist)
        p = engine.postings(term)
        assert p is not None, term
        assert (p["doc_ids"] == np.array([x[0] for x in o])).all(), term
        assert (p["dls"] == np.array([x[1] for x in o])).all(), term
        # mtf decodes lazily (only the reference scorer reads it)
        from search_engine_ray.query.engine import SearchEngine

        assert (SearchEngine._mtfs_of(p)
                == np.array([x[2] for x in o])).all(), term
        assert (p["tfs"] == np.array([x[4] for x in o])).all(), term


@pytest.mark.parametrize("mode", ["reference", "bm25"])
def test_topk_rank_identical(engine, small_oracle, mode):
    for q in gen_queries():
        ro = small_oracle.search(q, k=10, mode=mode)
        re_ = engine.search(q, k=10, mode=mode)
        assert [(d, ts) for _, d, ts in ro] == [(d, ts) for _, d, ts in re_], q
        for (so, _, _), (se, _, _) in zip(ro, re_):
            assert abs(so - se) < 1e-9, q


def test_wand_equals_taat(engine):
    for q in gen_queries():
        for k in (1, 5, 10, 50):
            a = engine.search(q, k=k, mode="bm25")
            b = engine.search(q, k=k, mode="bm25_wand")
            assert a == b, (q, k)


def test_capitals_rewrite_quirk(engine, small_oracle):
    # 'NASA' appears only capitalized in the fixture -> UPPER-rewritten,
    # lowercase query unreachable (indexer.py:161-165 as-written)
    assert "NASA" in engine.df_map
    assert "nasa" not in engine.df_map
    assert engine.search("nasa", k=5) == []


def test_resume_skips_completed_stages(built_index):
    """Kill-and-rerun: a missing stage marker rebuilds ONLY that stage;
    completed stages are untouched (manifest-based checkpoint resume)."""
    import os

    from search_engine_ray.index import manifest as mf
    from search_engine_ray.index.build import build_index
    from search_engine_ray.query.engine import SearchEngine

    out_dir, man, cfg, data_dir = built_index
    parsed_marker = os.path.join(out_dir, "parsed", mf.STAGE_MARKER)
    parsed_mtime = os.path.getmtime(parsed_marker)
    dict_table_before = sorted(
        SearchEngine(out_dir, preload_docmeta=False).df_map.items())

    # simulate failure after dict stage: postings marker lost
    os.remove(os.path.join(out_dir, "postings", mf.STAGE_MARKER))
    man2 = build_index(data_dir, out_dir, cfg)
    assert os.path.getmtime(parsed_marker) == parsed_mtime  # not re-run
    assert man2["n_docs"] == man["n_docs"]
    eng2 = SearchEngine(out_dir, preload_docmeta=False)
    assert sorted(eng2.df_map.items()) == dict_table_before
    # postings readable and consistent after resume
    p = eng2.postings("covid")
    assert p is not None and len(p["doc_ids"]) == eng2.df_map["covid"]


def test_bool_and_matches_posting_intersection(engine, small_oracle):
    """bool_and == set intersection of the oracle's posting lists for
    the parsed query terms; unknown/pruned terms empty the result."""
    for q in ("covid vaccine", "the data said", "covid", "zzznope covid"):
        terms, _, _ = engine.parser.parse_sentence(q)
        terms = list(dict.fromkeys(terms))
        expect: list[int] = []
        if terms and all(t in small_oracle.postings for t in terms):
            sets = [set(p[0] for p in small_oracle.postings[t])
                    for t in terms]
            expect = sorted(set.intersection(*sets))[:10]
        got = engine.search(q, k=10, mode="bool_and")
        assert got == expect, q


def test_bool_and_respects_k(engine):
    allr = engine.search("covid", k=10_000, mode="bool_and")
    assert engine.search("covid", k=3, mode="bool_and") == allr[:3]
    assert allr == sorted(allr)


def test_bool_or_matches_posting_union(engine, small_oracle):
    """bool_or == set union of the oracle's posting lists; unknown
    terms are skipped, not result-emptying."""
    for q in ("covid vaccine", "zzznope covid", "zzznope", "the"):
        terms, _, _ = engine.parser.parse_sentence(q)
        sets = [set(p[0] for p in small_oracle.postings.get(t, []))
                for t in dict.fromkeys(terms)]
        expect = sorted(set.union(*sets))[:10] if sets else []
        assert engine.search(q, k=10, mode="bool_or") == expect, q


def test_bool_and_not(engine, small_oracle):
    """and_not == AND(include) minus union(exclude); unknown exclude
    terms are no-ops, unknown include terms empty the result."""
    def posting_set(t):
        return set(p[0] for p in small_oracle.postings.get(t, []))

    inc = ["covid", "vaccine"]
    base = sorted(posting_set("covid") & posting_set("vaccine"))
    # exclude nothing / unknown exclude
    assert engine.search_bool_and_not(inc, [], k=10) == base[:10]
    assert engine.search_bool_and_not(inc, ["zzznope"], k=10) == base[:10]
    # real exclusion
    expect = [d for d in base if d not in posting_set("data")][:10]
    assert engine.search_bool_and_not(inc, ["data"], k=10) == expect
    # excluding an include term empties the result
    assert engine.search_bool_and_not(inc, ["covid"], k=10) == []
    # unknown include empties the result
    assert engine.search_bool_and_not(["zzznope"], ["covid"], k=10) == []


def test_fuzzy_search_corrects_typos(engine):
    """fuzzy=True replaces unknown terms with their best one-edit
    dictionary correction; far-off terms stay unknown; known terms are
    never rewritten."""
    # 'covid' is in the dictionary; 'covit' is one edit away
    fixed = engine.search("covit vaccine", k=10, mode="bm25", fuzzy=True)
    want = engine.search("covid vaccine", k=10, mode="bm25")
    assert fixed == want and len(fixed) > 0
    # correction picks the HIGHEST-df neighbor deterministically
    corr = engine.fuzzy_correct("covit")
    assert corr == "covid"
    # gibberish with no one-edit neighbor is left alone (-> unknown)
    assert engine.fuzzy_correct("qqqqqqqq") is None
    assert engine.search("qqqqqqqq", k=5, mode="bm25", fuzzy=True) == \
        engine.search("qqqqqqqq", k=5, mode="bm25")
    # known terms are never rewritten by fuzzy
    assert engine.search("covid", k=10, mode="bm25", fuzzy=True) == \
        engine.search("covid", k=10, mode="bm25")
    # works across modes, incl. boolean
    assert engine.search("covit", k=10, mode="bool_and", fuzzy=True) == \
        engine.search("covid", k=10, mode="bool_and")
