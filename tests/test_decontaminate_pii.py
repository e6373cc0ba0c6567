"""Benchmark decontamination + PII redaction: hand-built corpora with
hand-computed expectations, plus physical-plan assertions (bench_set
side must broadcast; PII path must stay UDF-free).

The sf0.01 DuckDB parity gate (`decontaminate`, `pii_redact`) covers
the same operators at corpus scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dandi_s3_log_parser_spark.functions.text import (
    pii_email_count,
    pii_phone_count,
    pii_redact,
)
from dandi_s3_log_parser_spark.operators.decontaminate import (
    _bloom_contains,
    benchmark_ngrams,
    bloom_decontaminate,
    build_bloom,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # shares the 3-gram "the quick fox" with the bench_set
        (1, "see the quick fox jump today"),
        # shares two distinct bench_set 3-grams
        (2, "the quick fox and lazy dog sleeps now"),
        # clean
        (3, "completely different words here entirely"),
        # repeats a contaminated gram — must count once (distinct)
        (4, "the quick fox the quick fox"),
        # shorter than n tokens
        (5, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame(
        [(100, "the quick fox runs"), (101, "lazy dog sleeps all day")],
        "doc_id long, text string",
    )


def test_benchmark_ngrams_distinct(bench_set):
    grams = {r["gram"] for r in benchmark_ngrams(bench_set, n=3).collect()}
    assert "the quick fox" in grams
    assert "lazy dog sleeps" in grams
    # 2 grams from doc 100, 3 from doc 101, no overlap
    assert len(grams) == 5


def test_decontaminate_hand_computed(corpus, bench_set):
    got = {
        r["doc_id"]: r
        for r in decontaminate(corpus, bench_set, n=3).collect()
    }
    assert len(got) == 5  # every input doc reported
    assert got[1]["matched_ngrams"] == 1 and got[1]["contaminated"]
    # doc 2: "the quick fox" + "lazy dog sleeps" + "dog sleeps now"? no —
    # "dog sleeps now" is not a bench_set gram ("dog sleeps all" is)
    assert got[2]["matched_ngrams"] == 2 and got[2]["contaminated"]
    assert got[3]["matched_ngrams"] == 0 and not got[3]["contaminated"]
    assert got[4]["matched_ngrams"] == 1  # distinct, not 2
    assert got[5]["matched_ngrams"] == 0


def test_decontaminate_min_overlap_threshold(corpus, bench_set):
    got = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(corpus, bench_set, n=3, min_overlap=2).collect()
    }
    assert got[2] is True
    assert got[1] is False  # one shared gram < threshold


def test_decontaminate_benchmark_side_broadcasts(corpus, bench_set):
    """The eval-gram join must be a broadcast hash join: a shuffled join
    here would re-exchange the full corpus gram explosion."""
    plan = decontaminate(corpus, bench_set, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bloom_decontaminate_equals_exact(corpus, bench_set):
    """The Bloom variant must be byte-identical to the raw-broadcast
    variant — false positives are verified away, never reported."""
    exact = sorted(
        map(tuple, decontaminate(corpus, bench_set, n=3).collect())
    )
    bloom = sorted(
        map(tuple, bloom_decontaminate(corpus, bench_set, n=3).collect())
    )
    assert bloom == exact
    # and again at an adversarially tiny filter where false positives
    # are guaranteed (64 bits, 2 hashes): the exact verify must absorb
    # them all
    tiny = sorted(
        map(
            tuple,
            bloom_decontaminate(
                corpus, bench_set, n=3, n_bits=64, k=2
            ).collect(),
        )
    )
    assert tiny == exact


def test_bloom_zero_false_negatives(spark, bench_set):
    """Every gram that went into the filter must probe as maybe-member
    (the Bloom guarantee the exact-verify join relies on)."""
    grams = benchmark_ngrams(bench_set, n=3)
    bloom = build_bloom(grams, n_bits=1 << 14, k=5)
    probed = (
        grams.crossJoin(F.broadcast(bloom))
        .select(
            _bloom_contains(
                F.col("gram"), F.col("bloom_words"), n_bits=1 << 14, k=5
            ).alias("hit")
        )
        .collect()
    )
    assert probed and all(r["hit"] for r in probed)


def test_bloom_filters_most_nonmembers(spark, bench_set):
    """At the default sizing (1 Mbit, k=5) a 5-gram benchmark set must
    reject essentially every foreign probe (deterministic hashes, so
    this is a fixed fact, not a flaky sample)."""
    grams = benchmark_ngrams(bench_set, n=3)
    bloom = build_bloom(grams)
    foreign = spark.range(1000).select(
        F.concat(F.lit("foreign gram "), F.col("id")).alias("gram")
    )
    n_pass = (
        foreign.crossJoin(F.broadcast(bloom))
        .filter(
            _bloom_contains(
                F.col("gram"), F.col("bloom_words"), n_bits=1 << 20, k=5
            )
        )
        .count()
    )
    assert n_pass == 0


def test_bloom_probe_is_native_and_broadcast(corpus, bench_set):
    """The probe side must stay in codegen (no EvalPython) and the
    one-row filter must arrive via a broadcast join, not an exchange of
    corpus grams."""
    plan = (
        bloom_decontaminate(corpus, bench_set, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "xxhash64" in plan


def test_pii_counts_and_redact(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@test.org or x@y.io thanks"),
            (2, "call 555-123-4567 now"),
            (3, "nothing here"),
            (4, "both bob@corp.example.com and 555-000-1111"),
        ],
        "id long, t string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            pii_email_count(F.col("t")).alias("e"),
            pii_phone_count(F.col("t")).alias("p"),
            pii_redact(F.col("t")).alias("red"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["p"]) == (2, 0)
    assert out[1]["red"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert (out[2]["e"], out[2]["p"]) == (0, 1)
    assert out[2]["red"] == "call <PHONE> now"
    assert out[3]["red"] == "nothing here"
    assert out[4]["red"] == "both <EMAIL> and <PHONE>"


def test_pii_redact_phone_inside_email_local_part(spark):
    """Email-first ordering (ADVICE r3): a phone-shaped span inside an
    email local part must be consumed by the email redaction — no
    '<PHONE>@domain' remnant may survive.  The documented overlap
    caveat is also pinned: pii_phone_count (a match count on the raw
    input) sees the span, while the output carries no <PHONE> token."""
    df = spark.createDataFrame(
        [(1, "reach 555-867-5309@example.com today")], "id long, t string"
    )
    row = df.select(
        pii_email_count(F.col("t")).alias("e"),
        pii_phone_count(F.col("t")).alias("p"),
        pii_redact(F.col("t")).alias("red"),
    ).first()
    assert row["red"] == "reach <EMAIL> today"
    assert "@" not in row["red"].replace("<EMAIL>", "")
    assert (row["e"], row["p"]) == (1, 1)  # counts are input-match counts


def test_pii_path_is_native(spark):
    """No BatchEvalPython / ArrowEvalPython in the PII plan — the whole
    redaction must run inside whole-stage codegen."""
    df = spark.createDataFrame([(1, "a@b.co")], "id long, t string")
    plan = (
        df.select(pii_redact(F.col("t")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
