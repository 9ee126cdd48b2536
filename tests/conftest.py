import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("shaclapi_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(spark, tmp_path_factory):
    """Small deterministic clips fixture shared by the test session."""
    from shaclapi_spark import datagen

    out = str(tmp_path_factory.mktemp("fixtures"))
    paths = datagen.ensure_fixture(spark, out, n_clips=2000)
    return paths


@pytest.fixture(scope="session")
def fixture_tables(spark, fixture_dir):
    return {name: spark.read.parquet(path) for name, path in fixture_dir.items()}
