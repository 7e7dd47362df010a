"""Unit tests for the fulltext serving ops (ops/fulltext.py): prefix /
fuzzy dictionary lookups, KWIC snippets, facet counts.  The happy-path
value parity vs DuckDB is gated by test_entry.py (driver mirror); these
cover the vectorized one-edit kernel and the empty/degenerate shapes."""

import itertools
import os
import random

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata absent")


def _levenshtein(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


def test_one_edit_mask_matches_levenshtein():
    from search_engine_ray.ops.fulltext import _one_edit_mask

    rng = random.Random(0)
    # include multi-byte code points: the kernel must be CHARACTER
    # exact (UTF-32 scatter), not UTF-8-byte based — 'café' is one
    # edit from 'cafe' even though it is two bytes longer
    alpha = "ab1é中"
    terms = ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 5)))
             for _ in range(2000)]
    terms += ["".join(t) for n in range(1, 4)
              for t in itertools.product("ab", repeat=n)]
    terms += ["cafe", "café", "caffé", "straße", "strasse"]
    for q in ["a", "ab", "aba", "b1a", "abab", "1", "café", "cafe",
              "straße", "é中"]:
        mask = _one_edit_mask(terms, q)
        for t, got in zip(terms, mask):
            assert bool(got) == (_levenshtein(t, q) <= 1), (t, q)


def test_fuzzy_corrector_unicode_and_buckets():
    """FuzzyCorrector handles non-ASCII dictionaries (the default
    parser keeps Latin-1 terms) and picks the highest-df neighbor from
    the adjacent length buckets only."""
    from search_engine_ray.ops.fulltext import FuzzyCorrector

    fc = FuzzyCorrector({"café": 5, "cafe": 9, "cafés": 2,
                         "x" * 40: 1, "\x01__ndocs__": 99})
    assert fc("cafè") == "cafe"   # dist 1 to both; df 9 wins
    # highest df wins WITHIN the <=1 set regardless of distance (the
    # engines only consult the corrector for unknown terms, so the
    # dist-0 self case never reaches it in serving)
    assert fc("cafés") == "café"
    assert fc("qqqqqqqq") is None
    assert fc("\x01__ndocsX") is None  # reserved rows never surface


def test_resolve_winners_keeps_max_orig_term():
    from search_engine_ray.ops.fulltext import _resolve_winners

    parts = [pd.DataFrame({"term": ["STRASSE", "other"],
                           "orig_term": ["strasse", "other"],
                           "df": [3, 7]}),
             pd.DataFrame({"term": ["STRASSE"],
                           "orig_term": ["straße"],
                           "df": [5]})]
    out = _resolve_winners(parts).to_pydict()
    # 'straße' > 'strasse' lexicographically -> its df (5) wins,
    # mirroring manifest.load_df_and_orig
    assert out == {"term": ["STRASSE", "other"], "df": [5, 7]}
    empty = _resolve_winners([]).to_pydict()
    assert empty == {"term": [], "df": []}


def test_prefix_search_empty_and_full(ray_session):
    from search_engine_ray.ops import sqlcheck as sq
    from search_engine_ray.ops.fulltext import prefix_search

    none = prefix_search(SF_DIR, prefix="zzzz")
    assert none.num_rows == 0
    assert none.column_names == ["term", "df"]
    # prefix "" matches the whole dictionary == index_dict_clean
    full = prefix_search(SF_DIR, prefix="").to_pydict()
    ref = sq.q_index_dict_clean(SF_DIR).to_pydict()
    assert full == ref


def test_fuzzy_terms_no_match(ray_session):
    from search_engine_ray.ops.fulltext import fuzzy_terms

    out = fuzzy_terms(SF_DIR, q="qqqqqqqq")
    assert out.num_rows == 0
    assert out.column_names == ["term", "dist", "df"]


def test_doc_snippets_term_absent_and_window_edges(ray_session):
    from search_engine_ray.ops.fulltext import doc_snippets

    assert doc_snippets(SF_DIR, term="nosuchterm").count() == 0
    # window=0 -> the snippet is exactly the term itself
    rows = doc_snippets(SF_DIR, term="spark", window=0).take_all()
    assert rows and all(r["snippet"] == "spark" for r in rows)


def test_facet_counts_term_absent(ray_session):
    from search_engine_ray.ops.fulltext import facet_counts

    out = facet_counts(SF_DIR, term="nosuchterm")
    assert out.num_rows == 0
    assert out.column_names == ["source", "lang", "n_docs"]


def test_attach_snippets_serp(built_index):
    """attach_snippets joins a KWIC window onto every batch result row
    via ONE pages scan; every bm25-ranked doc's snippet contains at
    least one parsed query term, windows are bounded, and row
    order/count of the result table is preserved."""
    from search_engine_ray.ops.fulltext import attach_snippets
    from search_engine_ray.query.batch import search_many
    from search_engine_ray.query.distributed import DistributedSearchEngine
    from search_engine_ray.text.parser import Parser

    out_dir, _, cfg, data_dir = built_index
    eng = DistributedSearchEngine(out_dir, num_actors=2)
    queries = ["covid vaccine", "data said", "zzznope"]
    res = search_many(eng, queries, k=5, mode="bm25")
    assert res.num_rows > 0
    got = attach_snippets(out_dir, data_dir, res, queries, window=3)
    assert got.num_rows == res.num_rows
    assert got.column("doc_id").to_pylist() == \
        res.column("doc_id").to_pylist()  # row order preserved
    parser = Parser(tokenizer=cfg.tokenizer,
                    harvest_page_url=cfg.harvest_page_url)
    terms = {qi: set(parser.parse_sentence(q)[0])
             for qi, q in enumerate(queries)}
    for qid, snip in zip(got.column("query_id").to_pylist(),
                         got.column("snippet").to_pylist()):
        toks = snip.split()
        assert 1 <= len(toks) <= 7  # window=3 -> at most 3+1+3
        assert terms[qid] & set(toks), (qid, snip)


def test_attach_snippets_duplicated_pages_store(built_index, tmp_path):
    """A crash-interrupted pages store can hold the same url twice
    (append-then-marker protocol); the snippet join must still emit
    exactly ONE row per ranked result, not expand duplicates."""
    import shutil

    from search_engine_ray.ops.fulltext import attach_snippets
    from search_engine_ray.query.batch import search_many
    from search_engine_ray.query.distributed import DistributedSearchEngine

    out_dir, _, _, data_dir = built_index
    dup_dir = tmp_path / "pages_dup"
    dup_dir.mkdir()
    shutil.copy(f"{data_dir}/pages.parquet", dup_dir / "pages.parquet")
    shutil.copy(f"{data_dir}/pages.parquet", dup_dir / "pages2.parquet")
    eng = DistributedSearchEngine(out_dir, num_actors=2)
    queries = ["covid vaccine"]
    res = search_many(eng, queries, k=5, mode="bm25")
    assert res.num_rows > 0
    got = attach_snippets(out_dir, str(dup_dir), res, queries, window=3)
    assert got.num_rows == res.num_rows
    assert got.column("doc_id").to_pylist() == \
        res.column("doc_id").to_pylist()
    assert all(s for s in got.column("snippet").to_pylist())


def test_autocomplete_nonpositive_k(ray_session):
    """k<=0 must complete nothing (head(-1) would return all-but-last)."""
    from search_engine_ray.ops.fulltext import autocomplete

    sf = "/root/testdata/sf0.01"
    for k in (0, -1):
        out = autocomplete(sf, prefixes=("s",), k=k)
        assert out.num_rows == 0
        assert out.column_names == ["prefix", "rank", "term", "df"]
