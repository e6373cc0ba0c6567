"""Real-Iceberg integration round-trip (gated: needs a runtime jar).

Skipped in this sandbox — no ``iceberg-spark-runtime`` jar is available
offline (see ``sources/tables.py`` module docstring for the dated
attempt).  On any machine with the jar, run:

    SPARK_ICEBERG_JAR=/path/to/iceberg-spark-runtime-4.0_2.13-<v>.jar \
        pytest -m iceberg tests/test_iceberg_integration.py

The test builds its OWN SparkSession (jars cannot be added to a running
JVM), so it must not share the suite's session fixture.
"""

import os

import pytest

JAR = os.environ.get("SPARK_ICEBERG_JAR")

pytestmark = pytest.mark.iceberg


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    if not JAR or not os.path.exists(JAR):
        pytest.skip("SPARK_ICEBERG_JAR not set / jar missing (offline sandbox)")
    from pyspark.sql import SparkSession

    warehouse = tmp_path_factory.mktemp("iceberg_wh")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-it")
        .config("spark.jars", JAR)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.ice.type", "hadoop")
        .config("spark.sql.catalog.ice.warehouse", str(warehouse))
        .getOrCreate()
    )
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.db")
    yield spark
    spark.stop()


def test_catalog_roundtrip_dynamic_overwrite(iceberg_spark):
    """create partitioned -> dynamic overwrite one day -> other days
    survive (the resume contract the recorder mocks encode)."""
    from dandi_s3_log_parser_spark.sources.tables import Catalog

    cat = Catalog(iceberg_spark, "/tmp/unused", iceberg_catalog="ice")
    df = iceberg_spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2)], "day string, v int"
    )
    cat.write(df, "t_days", partition_by=("day",))
    redo = iceberg_spark.createDataFrame([("2024-01-02", 99)], "day string, v int")
    cat.write(redo, "t_days", partition_by=("day",))
    got = {(r["day"], r["v"]) for r in cat.read("t_days").collect()}
    assert got == {("2024-01-01", 1), ("2024-01-02", 99)}
    cat.drop("t_days")


def test_merge_region_cache_real_merge_into(iceberg_spark):
    """First-write-wins MERGE INTO against a real Iceberg table."""
    from dandi_s3_log_parser_spark.operators.enrich import merge_region_cache
    from dandi_s3_log_parser_spark.sources.tables import Catalog

    cat = Catalog(iceberg_spark, "/tmp/unused", iceberg_catalog="ice")
    first = iceberg_spark.createDataFrame(
        [("h1", "eu"), ("h2", "us")], "ip_hash string, region string"
    )
    merge_region_cache(cat, first, table="t_cache")
    second = iceberg_spark.createDataFrame(
        [("h1", "ap"), ("h3", "sa")], "ip_hash string, region string"
    )
    merge_region_cache(cat, second, table="t_cache")
    got = {r["ip_hash"]: r["region"] for r in cat.read("t_cache").collect()}
    assert got == {"h1": "eu", "h2": "us", "h3": "sa"}  # h1 NOT rewritten
    cat.drop("t_cache")


def test_schema_evolution_append_widened_frame(iceberg_spark):
    """Appending a frame with a NEW column must ALTER TABLE ADD COLUMNS
    (metadata-only) and read back with NULLs for pre-evolution rows —
    the real-jar twin of the recorder-mock evolution tests."""
    from dandi_s3_log_parser_spark.sources.tables import Catalog

    cat = Catalog(iceberg_spark, "/tmp/unused", iceberg_catalog="ice")
    v1 = iceberg_spark.createDataFrame([("reduce", 10)], "stage string, rows_in long")
    cat.write(v1, "t_lineage", mode="append")
    v2 = iceberg_spark.createDataFrame(
        [("bin", 20, 5)], "stage string, rows_in long, bytes_spilled long"
    )
    cat.write(v2, "t_lineage", mode="append")
    got = {
        r["stage"]: (r["rows_in"], r["bytes_spilled"])
        for r in cat.read("t_lineage").collect()
    }
    assert got == {"reduce": (10, None), "bin": (20, 5)}
    cat.drop("t_lineage")
