import pytest


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (driver requirement)."""
    import ray

    from schemasaurus_ray.util import apply_malloc_tuning

    if not ray.is_initialized():
        apply_malloc_tuning()  # before ray.init so workers inherit it
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
    yield
    ray.shutdown()
