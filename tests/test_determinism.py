"""Physical-plan invariance: the index CONTENT (dictionary, postings,
corpus stats, query results) must be identical regardless of shard
count, term-bucket count, or combine batch sizes — the distributed
merge is associative/commutative by construction (SURVEY.md §5.3)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_engine_ray.config import EngineConfig
from search_engine_ray.fixtures import gen_pages


@pytest.mark.parametrize("cfg_b", [
    EngineConfig(num_shards=8, term_buckets=16, parser_concurrency=2,
                 parse_batch_size=128, run_batch_size=2048),
    EngineConfig(num_shards=2, term_buckets=4, parser_concurrency=1,
                 parse_batch_size=2048, run_batch_size=16384),
])
def test_index_content_invariant_to_physical_plan(ray_session, tmp_path,
                                                  cfg_b):
    from search_engine_ray.index.build import build_index
    from search_engine_ray.query.engine import SearchEngine

    pages = gen_pages(200)
    d = tmp_path / "pages"
    d.mkdir()
    pq.write_table(pages, str(d / "p.parquet"))
    cfg_a = EngineConfig(num_shards=4, term_buckets=8, parser_concurrency=2)
    man_a = build_index(str(d), str(tmp_path / "ia"), cfg_a)
    man_b = build_index(str(d), str(tmp_path / "ib"), cfg_b)
    assert man_a["n_docs"] == man_b["n_docs"]
    assert abs(man_a["avg_doc_length"] - man_b["avg_doc_length"]) < 1e-12

    ea = SearchEngine(str(tmp_path / "ia"))
    eb = SearchEngine(str(tmp_path / "ib"))
    assert ea.df_map == eb.df_map
    for term in list(ea.df_map)[:100]:
        pa_, pb_ = ea.postings(term), eb.postings(term)
        assert (pa_["doc_ids"] == pb_["doc_ids"]).all(), term
        assert (pa_["tfs"] == pb_["tfs"]).all(), term
        assert (pa_["dls"] == pb_["dls"]).all(), term
    for q in ["covid vaccine news", "Donald Trump", "masks"]:
        ra = ea.search(q, k=10, mode="bm25")
        rb = eb.search(q, k=10, mode="bm25")
        assert [(d_, t) for _, d_, t in ra] == [(d_, t) for _, d_, t in rb]
        assert all(abs(x[0] - y[0]) < 1e-12 for x, y in zip(ra, rb))
