"""Shared Spark session for the test suite (one JVM for all tests)."""

from __future__ import annotations

import pytest

from babylon_data_loader_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="babylon-tests", master="local[4]", shuffle_partitions=4
    )
    yield spark
    spark.stop()


@pytest.fixture()
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
