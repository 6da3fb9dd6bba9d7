"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import shutil

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_small(ray_session):
    """Deterministic 10k-row pages table (smoke scale), generated once."""
    from rsyslog_ray import gen

    d = gen.pages_dir(0.001)
    gen.ensure_pages(0.001, use_ray=True)
    return d


@pytest.fixture()
def tmp_out(tmp_path):
    d = str(tmp_path / "out")
    yield d
    shutil.rmtree(d, ignore_errors=True)
