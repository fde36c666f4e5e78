import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def webpages_small(tmp_path_factory):
    """Deterministic small web_pages + warc_records tables (4 fragments)."""
    from prompture_ray.synth import generate

    root = tmp_path_factory.mktemp("webpages")
    generate(root, n_rows=3000, n_parts=4, use_ray=False)
    return root
