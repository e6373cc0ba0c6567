"""Round-5 operators: HITS hubs/authorities and asymmetric containment
near-dup."""

import pytest
from pyspark.sql import functions as F

from dandi_s3_log_parser_spark.operators.dedup import containment_near_dup
from dandi_s3_log_parser_spark.operators.graph import hits


# ---------------------------------------------------------------------------
# hits
# ---------------------------------------------------------------------------


def test_hits_star_graph_separates_hub_from_authority(spark):
    """0->1, 0->2, 0->3: node 0 is the only hub (auth 0 — nothing
    links TO it), nodes 1-3 are equal pure authorities (hub 0)."""
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(e).collect()}
    assert got[0] == (1.0, 0.0)
    assert got[1] == got[2] == got[3]
    assert got[1][0] == 0.0 and got[1][1] == pytest.approx(1 / 3)


def test_hits_scores_normalized_to_sum_one(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 0), (0, 2)], "src long, dst long"
    )
    rows = hits(e, iters=3).collect()
    assert sum(r["hub"] for r in rows) == pytest.approx(1.0, abs=1e-6)
    assert sum(r["auth"] for r in rows) == pytest.approx(1.0, abs=1e-6)


def test_hits_dedups_edges_and_drops_self_loops(spark):
    noisy = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 1), (1, 0)], "src long, dst long"
    )
    clean = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    a = sorted(map(tuple, hits(noisy, iters=3).collect()))
    b = sorted(map(tuple, hits(clean, iters=3).collect()))
    assert a == b


def test_hits_deterministic_under_partitioning(spark):
    edges = [(i % 7, (i * 3 + 1) % 8) for i in range(40)]
    one = spark.createDataFrame(edges, "src long, dst long").coalesce(1)
    many = spark.createDataFrame(edges, "src long, dst long").repartition(9)
    assert sorted(map(tuple, hits(one).collect())) == sorted(
        map(tuple, hits(many).collect())
    )


def test_hits_empty_graph_and_bad_iters(spark):
    empty = spark.createDataFrame([(0, 0)], "src long, dst long")
    assert hits(empty).collect() == []  # only a self-loop: no edges left
    with pytest.raises(ValueError, match="iters"):
        hits(empty, iters=-1)


# ---------------------------------------------------------------------------
# containment_near_dup
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_is_asymmetric(spark):
    """Excerpt's shingles all appear in the parent: containment
    (excerpt -> parent) = 1.0, but the reverse direction is far below
    threshold and must NOT be emitted."""
    parent = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    excerpt = "alpha beta gamma delta"  # first 4 tokens -> 2 shingles
    d = _docs(spark, [(1, parent), (2, excerpt)])
    rows = containment_near_dup(d, threshold=0.8, n=3).collect()
    assert [(r["id_a"], r["id_b"], r["containment"]) for r in rows] == [
        (2, 1, 1.0)
    ]


def test_containment_exact_value_over_full_shingle_sets(spark):
    """3 of doc a's 4 shingles appear in doc b -> containment 0.75,
    reported exactly (verification uses FULL sets, not capped ones)."""
    a = "w1 w2 w3 w4 w5 w6"  # shingles: w1w2w3 w2w3w4 w3w4w5 w4w5w6
    b = "w1 w2 w3 w4 w5 zz"  # shares w1w2w3 w2w3w4 w3w4w5
    d = _docs(spark, [(1, a), (2, b)])
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_near_dup(d, threshold=0.5, n=3).collect()
    }
    assert got[(1, 2)] == 0.75 and got[(2, 1)] == 0.75


def test_containment_df_cap_drops_boilerplate_only_pairs(spark):
    """Two docs whose ONLY shared shingle exceeds df_cap generate no
    candidate — the boilerplate guard; with a higher cap the pair
    reappears."""
    boiler = "click here now"
    rows = [(i, f"{boiler} unique{i} tail{i} end{i}") for i in range(5)]
    d = _docs(spark, rows)
    capped = containment_near_dup(d, threshold=0.1, n=3, df_cap=3)
    assert capped.collect() == []
    uncapped = containment_near_dup(d, threshold=0.1, n=3, df_cap=100)
    assert uncapped.count() == 20  # all 5*4 ordered pairs share boiler


def test_containment_threshold_validated(spark):
    d = _docs(spark, [(1, "a b c d")])
    with pytest.raises(ValueError, match="threshold"):
        containment_near_dup(d, threshold=0.0)


def test_containment_short_docs_never_pair(spark):
    """Docs under n tokens have no shingles and appear in no pair (and
    never divide by zero)."""
    d = _docs(spark, [(1, "one two"), (2, "one two"), (3, "x y z w")])
    assert containment_near_dup(d, threshold=0.1, n=3).collect() == []


# ---------------------------------------------------------------------------
# remove_repeated_spans
# ---------------------------------------------------------------------------

from dandi_s3_log_parser_spark.operators.dedup import remove_repeated_spans


def test_remove_spans_cuts_shared_run_and_keeps_rest(spark):
    """A 5-token run shared by two docs is cut from both; unique
    text survives, untouched docs pass through byte-identical."""
    shared = "one two three four five"
    d = _docs(
        spark,
        [
            (1, f"Intro {shared} outro1"),
            (2, f"{shared} tail2 here"),
            (3, "totally   unrelated\ttext"),  # raw whitespace kept
        ],
    )
    got = {r["doc_id"]: (r["text"], r["n_removed"])
           for r in remove_repeated_spans(d, k=5, min_docs=2).collect()}
    assert got[1] == ("Intro outro1", 5)
    assert got[2] == ("tail2 here", 5)
    assert got[3] == ("totally   unrelated\ttext", 0)


def test_remove_spans_fully_covered_doc_becomes_empty(spark):
    t = "a b c d e"
    d = _docs(spark, [(1, t), (2, t)])
    got = {r["doc_id"]: (r["text"], r["n_removed"])
           for r in remove_repeated_spans(d, k=5, min_docs=2).collect()}
    assert got[1] == ("", 5) and got[2] == ("", 5)


def test_remove_spans_preserves_original_case(spark):
    """Detection is case-insensitive (lowered tokens); the rebuilt text
    keeps the surviving tokens' ORIGINAL case."""
    shared = "alpha beta gamma delta epsilon"
    d = _docs(
        spark,
        [(1, f"KEEP-Me {shared.upper()}"), (2, f"{shared} other x y")],
    )
    got = {r["doc_id"]: r["text"]
           for r in remove_repeated_spans(d, k=5, min_docs=2).collect()}
    assert got[1] == "KEEP-Me"
    assert got[2] == "other x y"


def test_remove_spans_accepts_precomputed_spans(spark):
    from dandi_s3_log_parser_spark.operators.dedup import (
        repeated_ngram_spans,
    )

    shared = "p q r s t"
    d = _docs(spark, [(1, f"{shared} u1 u2"), (2, f"z0 {shared} z1")])
    spans = repeated_ngram_spans(d, k=5, min_docs=2)
    a = sorted(map(tuple, remove_repeated_spans(d, spans).collect()))
    b = sorted(map(tuple,
                   remove_repeated_spans(d, k=5, min_docs=2).collect()))
    assert a == b
    assert a[0][1] == "u1 u2"


# ---------------------------------------------------------------------------
# chunk_fixed_windows
# ---------------------------------------------------------------------------

from dandi_s3_log_parser_spark.operators.curation import chunk_fixed_windows


def test_chunk_short_doc_single_chunk(spark):
    d = _docs(spark, [(1, "a b c")])
    rows = chunk_fixed_windows(d, chunk_tokens=5).collect()
    assert [(r["chunk_id"], r["n_tokens"], r["text"]) for r in rows] == [
        (0, 3, "a b c")
    ]


def test_chunk_exact_multiple_no_overlap(spark):
    d = _docs(spark, [(1, "a b c d e f")])
    rows = chunk_fixed_windows(d, chunk_tokens=3, overlap=0).collect()
    assert [(r["chunk_id"], r["text"]) for r in rows] == [
        (0, "a b c"), (1, "d e f")
    ]


def test_chunk_overlap_and_clamped_tail(spark):
    """len 7, chunk 3, overlap 1 (step 2): starts 0,2,4 — every chunk
    exactly 3 tokens, last ends at the document end."""
    d = _docs(spark, [(1, "a b c d e f g")])
    rows = chunk_fixed_windows(d, chunk_tokens=3, overlap=1).collect()
    assert [(r["chunk_id"], r["n_tokens"], r["text"]) for r in rows] == [
        (0, 3, "a b c"), (1, 3, "c d e"), (2, 3, "e f g")
    ]


def test_chunk_tail_clamp_increases_last_overlap(spark):
    """len 8, chunk 5, step 5: naive start 5 leaves a 3-token tail;
    the clamp moves the last chunk to start 3 so it is full-size."""
    d = _docs(spark, [(1, "t0 t1 t2 t3 t4 t5 t6 t7")])
    rows = chunk_fixed_windows(d, chunk_tokens=5, overlap=0).collect()
    assert [(r["chunk_id"], r["text"]) for r in rows] == [
        (0, "t0 t1 t2 t3 t4"), (1, "t3 t4 t5 t6 t7")
    ]


def test_chunk_every_token_covered(spark):
    d = _docs(spark, [(i, " ".join(f"w{j}" for j in range(i)))
                      for i in range(1, 40)])
    out = chunk_fixed_windows(d, chunk_tokens=7, overlap=2)
    per_doc = {}
    for r in out.collect():
        per_doc.setdefault(r["doc_id"], set()).update(
            r["text"].split())
    for i, toks in per_doc.items():
        assert toks == {f"w{j}" for j in range(i)}


def test_chunk_empty_and_validation(spark):
    d = _docs(spark, [(1, "   "), (2, "x y")])
    rows = chunk_fixed_windows(d, chunk_tokens=4).collect()
    assert [r["doc_id"] for r in rows] == [2]
    import pytest as _pt
    with _pt.raises(ValueError, match="chunk_tokens"):
        chunk_fixed_windows(d, chunk_tokens=0)
    with _pt.raises(ValueError, match="overlap"):
        chunk_fixed_windows(d, chunk_tokens=4, overlap=4)
