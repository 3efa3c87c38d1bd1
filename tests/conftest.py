"""Shared pytest fixtures: one Ray session per test session.

Hypothesis profiles: the default stays at each test's own settings; a
``deep`` profile (HYPOTHESIS_PROFILE=deep, or --hypothesis-profile)
multiplies search effort for offline fuzz sweeps of the property
suites — not part of the normal CI budget.
"""

from __future__ import annotations

import pytest
from hypothesis import settings as _hsettings

_hsettings.register_profile("default", max_examples=80, deadline=None)
_hsettings.register_profile("deep", max_examples=1500, deadline=None,
                            derandomize=False)
_hsettings.load_profile(
    __import__("os").environ.get("HYPOTHESIS_PROFILE", "default"))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_dir(tmp_path_factory):
    """Unit-scale deterministic pages log + host metadata (FIXTURES.md)."""
    from bitquery_kafka_streams_rust_ray.sources.pages import (
        PagesSpec,
        generate_host_metadata,
        generate_pages,
    )

    out = str(tmp_path_factory.mktemp("pages_unit"))
    spec = PagesSpec(num_rows=2_000)
    manifest = generate_pages(out, spec)
    generate_host_metadata(out, spec)
    return out, spec, manifest
