import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    builder = SparkSession.builder
    try:
        # KMS jar on the initial classpath -> native encrypted parquet
        # paths (jvm_crypto) run in the suite; fallback tests disable
        # them via ICEBERG_SPARK_JVM_CRYPTO=0
        from iceberg_spark.jvm_crypto import _build_jar

        jar = _build_jar()
        if jar:
            builder = builder.config("spark.jars", jar)
    except Exception:
        pass
    s = (
        builder.master("local[8]")
        .appName("iceberg_spark_tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def catalog(spark, tmp_path):
    from iceberg_spark import Catalog

    return Catalog(spark, str(tmp_path / "warehouse"))


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
