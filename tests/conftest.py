import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (see repo instructions)."""
    import ray

    from jsonschema_ray.raycompat import quiet_empty_schema_warnings

    quiet_empty_schema_warnings()
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield ray
    ray.shutdown()
