import os

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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


@pytest.fixture(scope="session")
def fixture_root(tmp_path_factory):
    """Materialized fixture tiers, cached per test session."""
    root = os.environ.get("GRAFT_FIXTURE_CACHE", str(tmp_path_factory.mktemp("fixtures")))
    return root


@pytest.fixture(scope="session")
def t1(fixture_root):
    from tg_data_connector_ray.fixtures import write_fixture

    return write_fixture(fixture_root, "t1")


@pytest.fixture(scope="session")
def t2(fixture_root):
    from tg_data_connector_ray.fixtures import write_fixture

    return write_fixture(fixture_root, "t2")
