import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_pages():
    """F1 fixture table, 'small' scale (oracle conformance)."""
    from search_engine_ray.fixtures import gen_pages

    return gen_pages(300)


@pytest.fixture(scope="session")
def small_oracle(small_pages):
    from search_engine_ray.oracle import OracleIndex

    t = small_pages
    pages = list(zip(
        t.column("url").to_pylist(),
        [x.value for x in t.column("warc_ts")],
        t.column("text").to_pylist(),
    ))
    return OracleIndex().build(pages)


@pytest.fixture(scope="session")
def built_index(ray_session, small_pages, tmp_path_factory):
    """Full Ray index build over the small fixture corpus (shared)."""
    import pyarrow.parquet as pq

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.index.build import build_index

    data_dir = tmp_path_factory.mktemp("pages")
    out_dir = str(tmp_path_factory.mktemp("index"))
    pq.write_table(small_pages, str(data_dir / "pages.parquet"),
                   row_group_size=128)  # several parse partitions
    cfg = EngineConfig(num_shards=4, term_buckets=4, parser_concurrency=2)
    man = build_index(str(data_dir), out_dir, cfg)
    return out_dir, man, cfg, str(data_dir)


@pytest.fixture(scope="session")
def engine(built_index):
    from search_engine_ray.query.engine import SearchEngine

    return SearchEngine(built_index[0])
