import pytest


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (TESTDATA.md contract)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = __import__("ray.data", fromlist=["DataContext"]).DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
