"""Round-3 hardening: Iceberg MERGE INTO path, entry temp hygiene."""

from pathlib import Path

from pyspark.sql import functions as F

from dandi_s3_log_parser_spark.operators.enrich import merge_region_cache
from dandi_s3_log_parser_spark.sources.tables import Catalog


class _SqlRecorder:
    """Stands in for a SparkSession on the Iceberg MERGE path: records
    every SQL statement; exposes the catalog surface the code touches."""

    class _Cat:
        def __init__(self, outer):
            self._outer = outer

        def dropTempView(self, name):
            self._outer.dropped.append(name)

    def __init__(self):
        self.statements = []
        self.dropped = []
        self.catalog = self._Cat(self)

    def sql(self, stmt):
        self.statements.append(stmt)


def _iceberg_catalog(recorder, exists: bool):
    cat = Catalog.__new__(Catalog)
    cat.spark = recorder
    cat.root = Path("/nonexistent")
    cat.iceberg_catalog = "ice"
    cat.exists = lambda name: exists
    return cat


def test_merge_region_cache_issues_merge_into_on_iceberg(spark):
    """On an Iceberg catalog with an existing cache table, the merge
    must be a real MERGE INTO (insert-only, first-write-wins) — one
    snapshot commit, never a table rewrite — and the temp view must be
    dropped afterwards."""
    rec = _SqlRecorder()
    cat = _iceberg_catalog(rec, exists=True)
    ip_map = spark.createDataFrame(
        [("h1", "eu"), ("h2", "unknown")], "ip_hash string, region string"
    )
    merge_region_cache(cat, ip_map)
    assert len(rec.statements) == 1
    stmt = rec.statements[0]
    assert stmt.startswith("MERGE INTO ice.db.ip_region_cache t USING ")
    assert "ON t.ip_hash = s.ip_hash" in stmt
    assert "WHEN NOT MATCHED THEN INSERT (ip_hash, region)" in stmt
    # insert-only: an existing entry is never updated
    assert "WHEN MATCHED" not in stmt
    assert len(rec.dropped) == 1 and rec.dropped[0] in stmt


def test_merge_region_cache_iceberg_first_write_creates(spark):
    """No cache table yet -> plain create through the catalog write
    path, no MERGE statement."""
    calls = []

    rec = _SqlRecorder()
    cat = _iceberg_catalog(rec, exists=False)
    cat.write = lambda df, name, **kw: calls.append((name, kw.get("mode")))
    ip_map = spark.createDataFrame([("h1", "eu")], "ip_hash string, region string")
    merge_region_cache(cat, ip_map)
    assert calls == [("ip_region_cache", "overwrite")]
    assert rec.statements == []


def test_merge_region_cache_parquet_unchanged(spark, tmp_path):
    """The parquet fallback keeps first-write-wins + staging-swap
    semantics (regression guard for the new Iceberg branch)."""
    cat = Catalog(spark, tmp_path / "wh")
    first = spark.createDataFrame(
        [("h1", "eu"), ("h2", "us")], "ip_hash string, region string"
    )
    merge_region_cache(cat, first)
    second = spark.createDataFrame(
        [("h1", "ap"), ("h3", "sa")], "ip_hash string, region string"
    )
    merge_region_cache(cat, second)
    got = {
        r["ip_hash"]: r["region"]
        for r in cat.read("ip_region_cache").collect()
    }
    assert got == {"h1": "eu", "h2": "us", "h3": "sa"}  # h1 NOT rewritten
    assert not cat.exists("ip_region_cache__staging")


def test_entry_pipeline_warehouse_is_reused_and_exit_managed(spark):
    """Repeated q_pages_pipeline runs must reuse ONE process-lifetime
    warehouse (removed at interpreter exit) instead of depositing a new
    /tmp tree per correctness run."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as em

    sfdir = "/root/testdata/sf0.001"
    r1 = em.queries()["pages_pipeline"](spark, sfdir)
    wh1 = em._PIPELINE_WAREHOUSE.name
    n1 = r1.count()
    r2 = em.queries()["pages_pipeline"](spark, sfdir)
    assert em._PIPELINE_WAREHOUSE.name == wh1  # same dir, no second tree
    assert r2.count() == n1                    # resume re-serves same result
    assert Path(wh1).name.startswith("entry_pipeline_")
    # TemporaryDirectory carries an exit finalizer -> /tmp stays clean
    import tempfile

    assert isinstance(em._PIPELINE_WAREHOUSE, tempfile.TemporaryDirectory)


def test_backfill_over_64_days_keeps_per_day_rows_in(spark, tmp_path):
    """A >64-day work list is processed in <=64-day chunks so per-day
    rows_in lineage survives the large-backfill scenario (previously it
    was recorded as NULL for every day beyond the observe cap)."""
    import datetime

    from dandi_s3_log_parser_spark.plans.lineage import LineageLog
    from dandi_s3_log_parser_spark.plans.pipeline import (
        PipelineConfig,
        run_reduce_stage,
    )

    line = (
        "owner bucket [01/Jan/2020:05:06:35 +0000] 9.9.9.9 - REQ1 REST.GET.OBJECT "
        'blobs/aaa/bbb/cc "GET /blobs/aaa/bbb/cc HTTP/1.1" 200 - 512 512 1 1 '
        '"-" "agent/1.0" - H== - C - host TLSv1.2 - -'
    )
    t0 = datetime.datetime(2024, 1, 1, 12, 0)
    rows = [
        (f"u{i}", t0 + datetime.timedelta(days=i), (line + "\nbody").encode(),
         "body", "en")
        for i in range(70)
    ]
    pages = spark.createDataFrame(
        rows,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    catalog = Catalog(spark, tmp_path / "wh")
    lineage = LineageLog(catalog)
    days = run_reduce_stage(
        spark, catalog, pages, PipelineConfig(), lineage, "backfill"
    )
    assert len(days) == 70
    lin = lineage.read().toPandas()
    red = lin[lin["stage"] == "reduce"]
    assert len(red) == 70
    assert red["rows_in"].notna().all()
    assert (red["rows_in"] == 1).all()
    assert (red["rows_out"] == 1).all()
    # resume over the same input is a no-op (chunk-grain commit held)
    again = run_reduce_stage(
        spark, catalog, pages, PipelineConfig(), lineage, "backfill-2"
    )
    assert again == []


def test_cli_stream_reduce_drains(spark, tmp_path):
    """The stream-reduce CLI command drains a landing pages dir into the
    rclass-partitioned reduced_stream table (CLI twin of the streaming
    recast; exercised in-process via cli.main)."""
    from dandi_s3_log_parser_spark.cli import main
    from dandi_s3_log_parser_spark.datagen import generate, to_spark
    from dandi_s3_log_parser_spark.streaming.stream_reduce import (
        read_stream_reduced,
    )

    tables = generate(300, seed=5)
    pages, dims = to_spark(spark, tables)
    pages.write.mode("append").parquet(str(tmp_path / "pages"))
    dims["excluded_ips"].write.parquet(str(tmp_path / "dims" / "excluded_ips"))

    rc = main([
        "--local-cores", "8",
        "stream-reduce",
        "--pages", str(tmp_path / "pages"),
        "--dims", str(tmp_path / "dims"),
        "--warehouse", str(tmp_path / "wh"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--timeout", "300",
    ])
    assert rc == 0
    cat = Catalog(spark, tmp_path / "wh")
    assert read_stream_reduced(cat).count() > 0


def test_cli_report_panel(spark, capsys):
    """The report verb prints every panel section (source stats, length
    quantiles, equi-depth histogram, char-entropy band) and is
    read-only."""
    from dandi_s3_log_parser_spark.cli import main

    rc = main([
        "--local-cores", "8",
        "report",
        "--documents", "/root/testdata/sf0.001/documents.parquet",
        "--buckets", "4",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "report: source=" in out
    assert "report: len-quantiles" in out
    assert "report: len-hist" in out and "bucket=3" in out
    assert "report: char-entropy" in out
