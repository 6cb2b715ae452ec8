"""Shared pytest fixtures: one local SparkSession per test run, plus
access to the reference implementation (when present) for differential
golden testing."""

from __future__ import annotations

import os
import sys
import pathlib

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = pathlib.Path(
    os.environ.get("KML2GEOJSON_REFERENCE", "/root/reference")
)
REFERENCE_DATA = REFERENCE_ROOT / "tests" / "data"

TESTDATA_ROOT = pathlib.Path(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"))


def reference_available() -> bool:
    return (REFERENCE_ROOT / "kml2geojson" / "main.py").is_file()


@pytest.fixture(scope="session")
def reference_module():
    """Import the reference implementation for differential testing."""
    if not reference_available():
        pytest.skip("reference repo not available")
    sys.path.insert(0, str(REFERENCE_ROOT))
    import kml2geojson as ref  # noqa

    return ref


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    session = (
        SparkSession.builder.master("local[4]")
        .appName("kml2geojson_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "6g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield session
    session.stop()
