"""Streaming reduce: equivalence with batch + checkpointed incremental drain."""

import pandas.testing
from pyspark.sql import functions as F

from dandi_s3_log_parser_spark.datagen import generate, to_spark
from dandi_s3_log_parser_spark.operators.reduce import (
    parse_and_filter_log_lines,
    split_reduced,
)
from dandi_s3_log_parser_spark.functions.text import with_header_and_text
from dandi_s3_log_parser_spark.plans.lineage import LineageLog
from dandi_s3_log_parser_spark.sources.tables import Catalog
from dandi_s3_log_parser_spark.streaming.stream_reduce import (
    read_stream_errors,
    read_stream_reduced,
    stream_reduce,
)

COLS = ["timestamp", "ip_address", "object_key", "bytes_sent"]


def _sorted(df):
    return df[COLS].sort_values(COLS).reset_index(drop=True)


def test_stream_reduce_matches_batch_and_resumes(spark, tmp_path):
    tables = generate(600, seed=19)
    pages, dims = to_spark(spark, tables)

    # land the first half, drain, then land the rest and drain again
    pages_dir = tmp_path / "pages"
    ckpt = tmp_path / "ckpt"
    first = pages.filter(F.dayofmonth("warc_ts") <= 3)
    second = pages.filter(F.dayofmonth("warc_ts") > 3)
    first.write.mode("append").parquet(str(pages_dir))

    catalog = Catalog(spark, tmp_path / "wh")
    q = stream_reduce(
        spark, str(pages_dir), catalog, str(ckpt), excluded_ips=dims["excluded_ips"]
    )
    q.awaitTermination(300)
    mid = read_stream_reduced(catalog).count()
    assert mid > 0

    second.write.mode("append").parquet(str(pages_dir))
    q2 = stream_reduce(
        spark, str(pages_dir), catalog, str(ckpt), excluded_ips=dims["excluded_ips"]
    )
    q2.awaitTermination(300)

    got = _sorted(read_stream_reduced(catalog).toPandas())
    # batch reference over the same pages
    kept, _ = split_reduced(
        parse_and_filter_log_lines(
            with_header_and_text(pages), "header",
            excluded_ips=dims["excluded_ips"],
        )
    )
    want = _sorted(kept.select(*COLS).toPandas())
    assert len(got) > mid  # second drain added rows (checkpoint resumed, no re-read)
    pandas.testing.assert_frame_equal(got, want)

    lin = LineageLog(catalog, "stream_lineage").read().toPandas()
    assert (lin["rows_in"] >= lin["rows_out"]).all()


def test_stream_errors_side_channel_matches_batch(spark, tmp_path):
    """A malformed line lands in the stream error side-channel (never
    dropped — reference ``_error_collection.py`` semantics), and the
    batch and streaming reduce agree on both kept and error counts over
    the same input."""
    import datetime

    good = (
        "owner bucket [01/Jan/2020:05:06:35 +0000] 9.9.9.9 - REQ1 REST.GET.OBJECT "
        'blobs/aaa/bbb/cc "GET /blobs/aaa/bbb/cc HTTP/1.1" 200 - 512 512 1 1 '
        '"-" "agent/1.0" - H== - C - host TLSv1.2 - -'
    )
    # three opening ' "' quote starts, zero matching '" ' ends after them
    bad = (
        "owner bucket [01/Jan/2020:05:06:36 +0000] 9.9.9.9 - REQ2 REST.GET.OBJECT "
        'blobs/aaa/bbb/cc "GET /x "y "z'
    )
    ts = datetime.datetime(2020, 1, 1, 5, 6)
    pages = spark.createDataFrame(
        [
            ("u1", ts, (good + "\nbody").encode(), "body", "en"),
            ("u2", ts, (bad + "\nbody").encode(), "body", "en"),
        ],
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
    pages_dir = tmp_path / "pages"
    pages.write.mode("append").parquet(str(pages_dir))

    catalog = Catalog(spark, tmp_path / "wh")
    q = stream_reduce(spark, str(pages_dir), catalog, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    errs = read_stream_errors(catalog).toPandas()
    assert len(errs) == 1
    assert errs["parse_status"].iloc[0].startswith("error_")
    assert read_stream_reduced(catalog).count() == 1

    # batch parity on the identical input
    kept_b, errors_b = split_reduced(
        parse_and_filter_log_lines(with_header_and_text(pages), "header")
    )
    assert kept_b.count() == read_stream_reduced(catalog).count()
    assert errors_b.count() == len(errs)

    # the error count is committed to per-batch lineage
    lin = LineageLog(catalog, "stream_lineage").read().toPandas()
    err_rows = lin[lin["stage"] == "stream_reduce_errors"]
    assert err_rows["rows_out"].sum() == 1


def test_stream_first_seen_dedup_across_batches(spark, tmp_path):
    """Custom stateful streaming dedup: the first (key, value) row
    survives across microbatches AND restarts (checkpointed state); the
    surviving set equals the batch distinct set."""
    from dandi_s3_log_parser_spark.streaming.stream_dedup import stream_first_seen

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def drain():
        stream = spark.readStream.schema("ip string, key string").parquet(str(src))
        q = (
            stream_first_seen(stream, key_col="ip", dedup_col="key")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    batch1 = [("a", "k1"), ("a", "k2"), ("a", "k1"), ("b", "k1")]
    spark.createDataFrame(batch1, "ip string, key string").write.mode(
        "append"
    ).parquet(str(src))
    drain()

    # second landing repeats k1/k2 for 'a' (cross-batch dups) + one new
    batch2 = [("a", "k1"), ("a", "k2"), ("a", "k3"), ("b", "k2")]
    spark.createDataFrame(batch2, "ip string, key string").write.mode(
        "append"
    ).parquet(str(src))
    drain()

    got = sorted(map(tuple, spark.read.parquet(str(out)).collect()))
    want = sorted(set(batch1 + batch2))  # batch distinct semantics
    assert got == want


def test_stream_first_seen_cap_boundary_within_batch(spark, tmp_path):
    """Fail-open must engage mid-batch exactly when the state fills
    (cap=2): rows before the boundary dedup normally, rows at/after it
    pass through AND are never added to state — pinned by a second
    batch where the over-cap value passes again but the stored values
    still dedup."""
    from dandi_s3_log_parser_spark.streaming.stream_dedup import stream_first_seen

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def drain():
        stream = spark.readStream.schema("ip string, key string").parquet(str(src))
        q = (
            stream_first_seen(
                stream, key_col="ip", dedup_col="key", max_state_per_key=2
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    batch1 = [("a", "k0"), ("a", "k0"), ("a", "k1"), ("a", "k1"), ("a", "k2")]
    spark.createDataFrame(batch1, "ip string, key string").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    drain()
    got1 = sorted(r["key"] for r in spark.read.parquet(str(out)).collect())
    # k0 fresh; k0 repeat deduped (state size 1 < 2); k1 fresh fills the
    # state; k1 repeat and k2 fail open
    assert got1 == ["k0", "k1", "k1", "k2"]

    # second batch: the state is full, so EVERY row fails open — even
    # k0/k1 which are in state (the cap check precedes the membership
    # check, exactly the pre-vectorization semantics) — and nothing is
    # added (k2 stays out of state)
    batch2 = [("a", "k0"), ("a", "k1"), ("a", "k2")]
    spark.createDataFrame(batch2, "ip string, key string").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    drain()
    got2 = sorted(r["key"] for r in spark.read.parquet(str(out)).collect())
    assert got2 == ["k0", "k0", "k1", "k1", "k1", "k2", "k2"]


def test_stream_first_seen_fails_open_past_cap(spark, tmp_path):
    """Beyond max_state_per_key the operator passes rows through
    (bounded state beats silent unbounded growth at scale)."""
    from dandi_s3_log_parser_spark.streaming.stream_dedup import stream_first_seen

    src = tmp_path / "in"
    rows = [("a", f"k{i}") for i in range(10)] + [("a", "k0")]
    spark.createDataFrame(rows, "ip string, key string").write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema("ip string, key string").parquet(str(src))
    q = (
        stream_first_seen(stream, key_col="ip", dedup_col="key", max_state_per_key=0)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    n = spark.read.parquet(str(tmp_path / "out")).count()
    # cap 0 = state full from the start: every row (even the k0 repeat)
    # passes through — fail open, never silent unbounded state
    assert n == 11


def test_stream_url_frontier_dedup_on_canonical_key(spark, tmp_path):
    """Crawl-frontier composition: canonicalize URLs IN the stream and
    first-seen-dedup on the canonical form, so refetch spellings
    (tracking params, case, port) collapse across microbatches while
    genuinely new resources pass."""
    from pyspark.sql import functions as F

    from dandi_s3_log_parser_spark.functions.url import canonical_url
    from dandi_s3_log_parser_spark.streaming.stream_dedup import (
        stream_first_seen,
    )

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def drain():
        stream = (
            spark.readStream.schema("host string, url string")
            .parquet(str(src))
            .withColumn("canon", canonical_url(F.col("url")))
        )
        q = (
            stream_first_seen(stream, key_col="host", dedup_col="canon")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    b1 = [
        ("site.org", "https://Site.ORG/page?b=1&a=2"),
        ("site.org", "https://site.org/other"),
    ]
    spark.createDataFrame(b1, "host string, url string").write.mode(
        "append"
    ).parquet(str(src))
    drain()
    # batch 2: two new spellings of /page (must be dropped), one new URL
    b2 = [
        ("site.org", "HTTPS://site.org:443/page/?a=2&b=1"),
        ("site.org", "https://site.org/page?a=2&b=1&utm_source=x#f"),
        ("site.org", "https://site.org/third"),
    ]
    spark.createDataFrame(b2, "host string, url string").write.mode(
        "append"
    ).parquet(str(src))
    drain()

    canons = sorted(
        r["canon"] for r in spark.read.parquet(str(out)).collect()
    )
    assert canons == [
        "https://site.org/other",
        "https://site.org/page?a=2&b=1",
        "https://site.org/third",
    ]


def test_stream_anomaly_cross_batch_baseline(spark, tmp_path):
    """Batch 1 builds the baseline (all rows NULL z: scored against an
    empty state); batch 2 rows are scored against batch 1's exact
    stats, so the closed-form z comes out and a spike flags."""
    import math

    from dandi_s3_log_parser_spark.streaming.stream_anomaly import (
        stream_anomaly,
    )

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def drain():
        stream = spark.readStream.schema(
            "event_type string, value double"
        ).parquet(str(src))
        q = (
            stream_anomaly(stream, min_history=3)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    b1 = [("k", 2.0), ("k", 4.0), ("k", 2.0), ("k", 4.0)]
    spark.createDataFrame(b1, "event_type string, value double").write.mode(
        "append"
    ).parquet(str(src))
    drain()
    # batch 1 stats: n=4, mean=3, var=1 -> batch 2 z = value - 3
    b2 = [("k", 30.0), ("k", 3.5)]
    spark.createDataFrame(b2, "event_type string, value double").write.mode(
        "append"
    ).parquet(str(src))
    drain()

    rows = spark.read.parquet(str(out)).collect()
    got = {r["value"]: r for r in rows}
    assert len(rows) == 6
    for r in rows:
        if r["value"] in (2.0, 4.0):
            assert r["z"] is None or math.isnan(r["z"])
            assert r["is_anomaly"] is False
    assert got[30.0]["z"] == 27.0 and got[30.0]["is_anomaly"] is True
    assert got[3.5]["z"] == 0.5 and got[3.5]["is_anomaly"] is False


def test_stream_anomaly_welford_merge_matches_batch_stats(spark, tmp_path):
    """After ingesting values across TWO batches, a third batch's z must
    use the stats of the union — the Welford merge is exact."""
    from dandi_s3_log_parser_spark.streaming.stream_anomaly import (
        stream_anomaly,
    )

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def drain():
        stream = spark.readStream.schema(
            "event_type string, value double"
        ).parquet(str(src))
        q = (
            stream_anomaly(stream, min_history=3)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    import statistics

    hist = [1.0, 5.0, 3.0, 7.0, 2.0, 6.0]
    for chunk in (hist[:3], hist[3:]):
        spark.createDataFrame(
            [("k", v) for v in chunk], "event_type string, value double"
        ).write.mode("append").parquet(str(src))
        drain()
    spark.createDataFrame(
        [("k", 10.0)], "event_type string, value double"
    ).write.mode("append").parquet(str(src))
    drain()

    mean = statistics.fmean(hist)
    std = statistics.pstdev(hist)
    want = round((10.0 - mean) / std, 4)
    r = [
        x
        for x in spark.read.parquet(str(out)).collect()
        if x["value"] == 10.0
    ][0]
    assert r["z"] == want


def test_stream_cdc_latest_wins_and_out_of_order(spark, tmp_path):
    """Changelog semantics: a key emits only when its winner changes;
    a late-arriving stale seq (out-of-order batch) emits nothing."""
    from dandi_s3_log_parser_spark.streaming.stream_cdc import stream_cdc_latest

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    schema = "id long, name string, seq long, op string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            stream_cdc_latest(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    batch1 = [(1, "v1", 10, "U"), (1, "v2", 20, "U"), (2, "w1", 5, "U")]
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(str(src))
    drain()
    got1 = {r["id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert (got1[1]["name"], got1[1]["seq"]) == ("v2", 20)  # in-batch max
    assert got1[2]["name"] == "w1"

    # batch 2: key 1 gets a STALE change (seq 15 < 20) -> no emission;
    # key 2 gets a delete with a higher seq -> emitted
    batch2 = [(1, "stale", 15, "U"), (2, None, 6, "D")]
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(str(src))
    drain()
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 3  # exactly one new emission
    latest2 = max(
        (r for r in rows if r["id"] == 2), key=lambda r: r["seq"]
    )
    assert (latest2["op"], latest2["seq"]) == ("D", 6)
    assert max(r["seq"] for r in rows if r["id"] == 1) == 20  # stale ignored


def test_stream_cdc_changelog_replays_to_batch_apply_cdc(spark, tmp_path):
    """Last emission per key (drop final deletes) + untouched snapshot
    rows == apply_cdc on the concatenated change stream."""
    import pyspark.sql.functions as F

    from dandi_s3_log_parser_spark.operators.cdc import apply_cdc
    from dandi_s3_log_parser_spark.streaming.stream_cdc import stream_cdc_latest

    src = tmp_path / "in"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    schema = "id long, name string, seq long, op string"
    b1 = [(1, "a", 1, "U"), (2, "b", 2, "U"), (3, "c", 3, "U")]
    b2 = [(1, None, 9, "D"), (2, "b2", 8, "U"), (4, "d", 7, "U")]

    for batch in (b1, b2):
        spark.createDataFrame(batch, schema).write.mode("append").parquet(
            str(src)
        )
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            stream_cdc_latest(stream)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    snap = spark.createDataFrame(
        [(3, "old3"), (5, "keep5")], "id long, name string"
    )
    # replay: last emission per key, drop deletes, apply over snapshot
    log = spark.read.parquet(str(out))
    winner = log.groupBy("id").agg(
        F.max_by(F.struct("name", "op"), "seq").alias("w")
    )
    ups = winner.filter(F.col("w.op") == "U").select(
        "id", F.col("w.name").alias("name")
    )
    replayed = (
        snap.join(winner.select("id"), "id", "left_anti").unionByName(ups)
    )
    batch_next = apply_cdc(
        snap, spark.createDataFrame(b1 + b2, schema)
    )
    assert sorted(map(tuple, replayed.collect())) == sorted(
        map(tuple, batch_next.collect())
    )


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream watermarked interval join == the static inner join
    with the identical condition when nothing is late past the
    watermark; matches outside [l_ts, l_ts + delay] never emit."""
    from pyspark.sql import functions as F

    from dandi_s3_log_parser_spark.streaming.stream_join import (
        stream_interval_join,
    )

    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    base = "2024-01-01 00:{:02d}:00"
    lrows = [("u1", base.format(0)), ("u1", base.format(30)),
             ("u2", base.format(5))]
    rrows = [("u1", base.format(4)),   # within 10m of u1@00 -> match
             ("u1", base.format(29)),  # 29m after u1@00 (no), before
                                       # u1@30 (no: r < l) -> no match
             ("u1", base.format(33)),  # within 10m of u1@30 -> match
             ("u2", base.format(16)),  # 11m after u2@05 -> outside
             ("u3", base.format(1))]   # no left key -> no match
    spark.createDataFrame(lrows, "k string, l_ts_s string").select(
        "k", F.col("l_ts_s").cast("timestamp").alias("l_ts")
    ).write.mode("append").parquet(str(lsrc))
    spark.createDataFrame(rrows, "k string, r_ts_s string").select(
        "k", F.col("r_ts_s").cast("timestamp").alias("r_ts")
    ).write.mode("append").parquet(str(rsrc))

    ls = spark.readStream.schema("k string, l_ts timestamp").parquet(str(lsrc))
    rs = spark.readStream.schema("k string, r_ts timestamp").parquet(str(rsrc))
    q = (
        stream_interval_join(
            ls, rs, key_col="k", left_ts="l_ts", right_ts="r_ts",
            max_delay="10 minutes", watermark="1 hour",
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sorted(
        (r["k"], str(r["l_ts"]), str(r["r_ts"]))
        for r in spark.read.parquet(str(out)).collect()
    )
    # batch reference with the identical condition
    lb = spark.read.parquet(str(lsrc))
    rb = spark.read.parquet(str(rsrc))
    cond = (
        (lb["k"] == rb["k"])
        & (rb["r_ts"] >= lb["l_ts"])
        & (rb["r_ts"] <= lb["l_ts"] + F.expr("INTERVAL 10 minutes"))
    )
    want = sorted(
        (r["k"], str(r["l_ts"]), str(r["r_ts"]))
        for r in lb.join(rb, cond).select(lb["k"], "l_ts", "r_ts").collect()
    )
    assert got == want
    assert got == [
        ("u1", "2024-01-01 00:00:00", "2024-01-01 00:04:00"),
        ("u1", "2024-01-01 00:30:00", "2024-01-01 00:33:00"),
    ]


def test_stream_interval_join_rejects_column_collision(spark):
    import pytest as _pytest

    from dandi_s3_log_parser_spark.streaming.stream_join import (
        stream_interval_join,
    )

    a = spark.createDataFrame([("u", 1)], "k string, ts int")
    b = spark.createDataFrame([("u", 2)], "k string, ts int")
    with _pytest.raises(ValueError, match="rename"):
        stream_interval_join(
            a, b, key_col="k", left_ts="ts", right_ts="ts"
        )
