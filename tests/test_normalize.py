"""Unicode normalization kernel: NFC folding, case, whitespace, NULLs,
and the Arrow-batch (not per-row) execution shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from dandi_s3_log_parser_spark.functions.normalize import normalize_text


def _norm(spark, values):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               "i long, t string")
    rows = df.select("i", normalize_text(F.col("t")).alias("n")) \
             .orderBy("i").collect()
    return [r["n"] for r in rows]


def test_nfc_folds_composed_and_decomposed(spark):
    composed = "caf\u00e9"
    decomposed = "cafe\u0301"
    assert composed != decomposed  # guard vs editor renormalization
    assert _norm(spark, [composed, decomposed]) == [composed, composed]


def test_case_whitespace_and_strip(spark):
    got = _norm(spark, ["  CAFÉ\t du\tMONDE \n", "weiß"])
    assert got == ["café du monde", "weiß"]


def test_null_preserved_empty_stays_empty(spark):
    got = _norm(spark, [None, "", "   "])
    assert got == [None, "", ""]


def test_normalize_is_arrow_batched(spark):
    """The kernel must appear as ArrowEvalPython (vectorized), never
    BatchEvalPython (row-at-a-time pickling)."""
    df = spark.createDataFrame([(1, "x")], "i long, t string")
    plan = (
        df.select(normalize_text(F.col("t")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# Canonical URL (crawl-dedup key)
# ---------------------------------------------------------------------------


def test_canonical_url_rules(spark):
    """Each rule, hand-checked: case, default ports (scheme-aware),
    fragment, tracking params, query sort, trailing slash, junk
    passthrough."""
    from dandi_s3_log_parser_spark.functions.url import canonical_url
    from pyspark.sql import functions as F

    cases = [
        ("HTTPS://Example.COM/A/b/", "https://example.com/A/b"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("http://example.com:80/x", "http://example.com/x"),
        # non-default port survives; scheme mismatch leaves :80 on https
        ("https://example.com:80/x", "https://example.com:80/x"),
        ("http://h.io:8080/y", "http://h.io:8080/y"),
        ("https://h.io/p#section-2", "https://h.io/p"),
        # a '?' INSIDE the fragment is fragment content, not a query
        # (SPA-style routes; round-4 ADVICE medium)
        ("https://h.io/p#/route?x=1&b=2", "https://h.io/p"),
        # real query + fragment containing another '?': keep only the real one
        ("https://h.io/p?b=2&a=1#frag?z=9", "https://h.io/p?a=1&b=2"),
        ("https://h.io/p?utm_source=a&utm_campaign=b", "https://h.io/p"),
        ("https://h.io/p?z=1&a=2&fbclid=xyz", "https://h.io/p?a=2&z=1"),
        # ref is tracking; href is not (anchored param match)
        ("https://h.io/p?ref=x&href=y", "https://h.io/p?href=y"),
        ("https://h.io///", "https://h.io"),
        ("not a url at all", "not a url at all"),
        ("", ""),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, f"{u!r}: got {got[i]!r}, want {want!r}"


def test_canonical_url_collapses_variants(spark):
    """The point of the op: refetch spellings of one resource share one
    canonical key."""
    from dandi_s3_log_parser_spark.functions.url import canonical_url
    from pyspark.sql import functions as F

    variants = [
        "https://Site.ORG/page?b=1&a=2",
        "HTTPS://site.org:443/page/?a=2&b=1",
        "https://site.org/page?a=2&b=1&utm_medium=email#top",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    n = (
        df.select(canonical_url(F.col("url")).alias("c"))
        .distinct()
        .count()
    )
    assert n == 1
