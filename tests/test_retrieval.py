"""Okapi BM25 top-k retrieval (operators/retrieval.py)."""

import math

import pytest
from pyspark.sql import functions as F

from dandi_s3_log_parser_spark.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query string")


def _bm25_ref(corpus, query, k1=1.2, b=0.75):
    """Plain-python reference: dict doc_id -> score."""
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    qterms = set(query.lower().split())
    scores = {}
    for term in qterms:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, t in toks.items():
            tf = t.count(term)
            if tf == 0:
                continue
            dl = len(t)
            c = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
            scores[d] = scores.get(d, 0.0) + round(c, 12)
    return {d: round(s, 6) for d, s in scores.items()}


def test_bm25_matches_python_reference(spark):
    corpus = [
        (1, "spark join hash join shuffle"),
        (2, "window agg spark batch window"),
        (3, "hash table scan filter"),
        (4, "join join join hash"),
    ]
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(
            _docs(spark, corpus), _queries(spark, [(0, "hash join")]), k=10
        ).collect()
    }
    want = _bm25_ref(corpus, "hash join")
    assert got == pytest.approx(want)


def test_bm25_rank_orders_by_score_then_doc_id(spark):
    # docs 1 and 2 are identical -> identical score, rank by doc_id
    corpus = [(1, "a b c"), (2, "a b c"), (3, "a a a a a a a a z z z z")]
    rows = bm25_topk(
        _docs(spark, corpus), _queries(spark, [(0, "a")]), k=3
    ).collect()
    by_rank = [(r["rank"], r["doc_id"]) for r in rows]
    tied = [d for rk, d in by_rank if rk in (1, 2)] \
        if rows[0]["score"] == rows[1]["score"] else None
    assert [r["query_id"] for r in rows] == [0, 0, 0]
    assert [r["rank"] for r in rows] == [1, 2, 3]
    if tied is not None:
        assert tied == sorted(tied)


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    """Same tf, shorter document -> higher score when b > 0."""
    corpus = [
        (1, "needle " + "filler " * 3),
        (2, "needle " + "filler " * 30),
    ]
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(
            _docs(spark, corpus), _queries(spark, [(0, "needle")]), k=2
        ).collect()
    }
    assert got[1] > got[2]


def test_bm25_query_terms_deduplicated(spark):
    """'hash hash' scores identically to 'hash' (set-of-words model)."""
    corpus = [(1, "hash join scan"), (2, "merge sort")]
    d = _docs(spark, corpus)
    a = bm25_topk(d, _queries(spark, [(0, "hash hash")]), k=5).collect()
    b = bm25_topk(d, _queries(spark, [(0, "hash")]), k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]


def test_bm25_no_match_and_multi_query(spark):
    corpus = [(1, "alpha beta"), (2, "gamma delta")]
    q = _queries(spark, [(0, "zzz"), (1, "alpha"), (2, "gamma alpha")])
    rows = bm25_topk(_docs(spark, corpus), q, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert 0 not in by_q  # no term matched anywhere
    assert by_q[1] == [1]
    assert sorted(by_q[2]) == [1, 2]


def test_bm25_k_truncates(spark):
    corpus = [(i, "common term here") for i in range(10)]
    rows = bm25_topk(
        _docs(spark, corpus), _queries(spark, [(0, "common")]), k=3
    ).collect()
    assert len(rows) == 3
    assert [r["doc_id"] for r in rows] == [0, 1, 2]  # tie -> id order


def test_bm25_deterministic_under_partitioning(spark):
    corpus = [
        (i, f"term{i % 5} term{i % 3} filler{i} shared")
        for i in range(60)
    ]
    q = _queries(spark, [(0, "shared term1"), (1, "term2 filler7")])
    one = bm25_topk(_docs(spark, corpus).coalesce(1), q, k=10)
    many = bm25_topk(_docs(spark, corpus).repartition(13), q, k=10)
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect())
    )


def test_bm25_validates_params(spark):
    d = _docs(spark, [(1, "a")])
    q = _queries(spark, [(0, "a")])
    with pytest.raises(ValueError, match="k must"):
        bm25_topk(d, q, k=0)
    with pytest.raises(ValueError, match="k1"):
        bm25_topk(d, q, b=1.5)
