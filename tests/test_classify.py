"""Hashed-feature linear classifier: hand-computed scores, totality,
broadcast-join plan shape.  The sf0.01 DuckDB parity gate
(`quality_classifier`) covers it at corpus scale.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from dandi_s3_log_parser_spark.operators.classify import (
    hash_weights,
    linear_quality_score,
)


def _bucket(tok: str, n: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n


def _weight(b: int) -> float:
    return int(hashlib.md5(f"w|{b}".encode()).hexdigest()[:6], 16) / 16**6 * 2 - 1


def test_linear_quality_score_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "Alpha beta beta"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    n = 64
    got = {
        r["doc_id"]: r
        for r in linear_quality_score(
            docs, hash_weights(spark, n), n_buckets=n
        ).collect()
    }
    # total: empty and NULL text restored with 0 tokens, score sigmoid(0)
    assert len(got) == 3
    for d in (2, 3):
        assert got[d]["n_tokens"] == 0
        assert got[d]["mean_w"] == 0.0
        assert got[d]["score"] == 0.5
    # doc 1: lowercase tokens alpha, beta, beta through the same md5 trick
    mw = (_weight(_bucket("alpha", n)) + 2 * _weight(_bucket("beta", n))) / 3
    mw = round(mw, 4)
    assert got[1]["n_tokens"] == 3
    assert got[1]["mean_w"] == pytest.approx(mw, abs=1e-9)
    assert got[1]["score"] == pytest.approx(
        round(1 / (1 + math.exp(-mw)), 4), abs=1e-9
    )


def test_linear_quality_score_missing_buckets_score_zero(spark):
    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    empty_w = hash_weights(spark, 8).limit(0)
    got = linear_quality_score(docs, empty_w, n_buckets=8).collect()[0]
    assert got["n_tokens"] == 3
    assert got["mean_w"] == 0.0
    assert got["score"] == 0.5


def test_linear_quality_score_plan_broadcasts_weights(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = linear_quality_score(docs, hash_weights(spark, 256), n_buckets=256)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
