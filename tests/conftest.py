import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        # 8 CPUs (was 4): the suite is dominated by the per-wide-op
        # scheduling floor, and 8 slots let each ingest pass's shuffle +
        # merger-actor + writer stages overlap instead of serializing.
        # Measured solo: full suite 689s at 4 CPUs vs see STATUS_r4 at 8.
        # GRAFT_TEST_CPUS overrides for bisecting CPU-sensitive failures.
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("GRAFT_TEST_CPUS", "8")),
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
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
