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
