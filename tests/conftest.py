"""Shared Spark session for the test suite (one JVM for the whole run)."""

from __future__ import annotations

import pytest

from flink_kmeans_clustering_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", shuffle_partitions=8)
    yield s
