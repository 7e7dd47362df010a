"""Reference-signature compatibility entry point.

The reference's grader contract is ``search_engine.main(corpus_path,
output_path, stemming, queries, num_docs_to_retrieve)``
(/root/reference/search_engine.py:99-112): build the index over the
tweet corpus, run each query through the blended reference scorer and
print ``tweet id: <id>, score: <score>`` lines, best first.  A user of
the reference can call :func:`main` here with the same arguments and get
the same behavior on the Ray engine — including the as-written quirk
that ``queries=None`` does nothing at all (the reference only builds
inside the ``if queries is not None`` branch).
"""

from __future__ import annotations


def handle_queries(queries) -> list[str]:
    """List passthrough, else one query per non-empty file line (the
    reference does NOT strip lines; search_engine.py:121-132)."""
    if isinstance(queries, list):
        return queries
    from search_engine_ray.query.batch import read_queries_file

    return read_queries_file(queries)


def main(corpus_path=None, output_path: str = "", stemming: bool = False,
         queries=None, num_docs_to_retrieve: int = 1) -> list[list[tuple]]:
    """Reference-signature entry point (tweet-shape corpus).

    Returns the per-query ranked ``(score, tweet_id)`` tuples (best
    first) in addition to printing the reference's lines, so the result
    is also usable programmatically."""
    if queries is None:
        return []  # reference quirk: no queries -> nothing happens

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.index.build import build_index
    from search_engine_ray.query.engine import SearchEngine

    cfg = EngineConfig(stemming=stemming)
    build_index(corpus_path, output_path, cfg, input_format="tweets")

    eng = SearchEngine(output_path)
    out: list[list[tuple]] = []
    for query in handle_queries(queries):
        res = eng.search(query, k=num_docs_to_retrieve, mode="reference")
        # ASCENDING, exactly like the reference's print loop: main()
        # iterates retrieve_top_k's (score, ts, id)-sorted list as-is
        # (search_engine.py:109-112 over ranker.py:63), so the worst of
        # the top-k prints first
        ranked = [(score, doc_id) for score, doc_id, _ts in res]
        for score, doc_id in ranked:
            print(f"tweet id: {doc_id}, score: {score}")
        out.append(ranked)
    return out
