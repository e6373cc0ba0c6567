"""Distributed page generator: deterministic in (n, seed), independent
of partitioning/parallelism — the property the N-vs-4N scaling protocol
relies on (same input at both cluster sizes)."""

import pyspark.sql.functions as F

from dandi_s3_log_parser_spark.datagen import generate_pages_spark


def _fingerprint(df):
    return df.select(
        F.expr("bit_xor(xxhash64(url, text, cast(warc_ts as long), lang, html))").alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()


def test_generate_pages_spark_partitioning_independent(spark):
    a = _fingerprint(generate_pages_spark(spark, 20_000, seed=7))
    b = _fingerprint(generate_pages_spark(spark, 20_000, seed=7).repartition(13))
    c = _fingerprint(generate_pages_spark(spark, 20_000, seed=7).coalesce(1))
    assert a["n"] == b["n"] == c["n"] == 20_000
    assert a["h"] == b["h"] == c["h"]


def test_generate_pages_spark_seed_sensitivity(spark):
    a = _fingerprint(generate_pages_spark(spark, 5_000, seed=1))
    b = _fingerprint(generate_pages_spark(spark, 5_000, seed=2))
    assert a["h"] != b["h"]


def test_generate_pages_spark_schema_and_invariant(spark):
    df = generate_pages_spark(spark, 2_000, seed=3)
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    # byte-identity invariant holds on generated data: html body == text
    from dandi_s3_log_parser_spark.functions.text import with_header_and_text

    bad = (
        with_header_and_text(df)
        .filter(F.col("extracted_text") != F.col("text"))
        .count()
    )
    assert bad == 0
