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
