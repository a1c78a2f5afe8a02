"""Session-scoped Ray fixture + shared synthetic-data fixtures.

Ray is initialised ONCE per pytest session (per the driver contract) and
shut down at teardown. Tests that only exercise pure kernels don't touch
Ray at all.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

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
def smoke_dir() -> str:
    from coco_search_ray.sources.synth import ensure_tier

    return ensure_tier("smoke")


@pytest.fixture(scope="session")
def smoke_catalog(smoke_dir):
    from coco_search_ray.sources.synth import load_catalog

    return load_catalog(smoke_dir)
