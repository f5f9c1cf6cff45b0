"""Shared pytest fixtures. Ray is initialised ONCE per session."""

from __future__ import annotations

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
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def golden_groups():
    from openie_backend_ray.fixtures.reverb_tsv import read_groups

    return read_groups()


@pytest.fixture(scope="session")
def golden_extractions():
    from openie_backend_ray.fixtures.reverb_tsv import read_extractions

    return read_extractions()
