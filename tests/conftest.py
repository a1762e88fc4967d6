"""Shared pytest fixtures.

The Spark session is session-scoped (JVM startup ~10 s) and configured the
way the real job runs: AQE on, Arrow on, UTC, shuffle partitions ≈ cores.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from frogocr_spark.session import get_spark

    s = get_spark(app_name="frogocr-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
