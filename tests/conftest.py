"""Session-scoped Ray fixture — Ray is initialized ONCE per pytest session."""

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
def synth_dir(tmp_path_factory) -> str:
    """Small deterministic synthetic images table shared across tests."""
    from reddacted_ray.synth import write_dataset

    out = tmp_path_factory.mktemp("images") / "sf_test"
    return write_dataset(str(out), num_rows=1200, seed=42, rows_per_shard=300)
