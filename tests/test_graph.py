"""Fixed-iteration PageRank."""

import pytest
from pyspark.sql import functions as F

from dandi_s3_log_parser_spark.operators.graph import pagerank


def test_pagerank_two_node_cycle_is_stationary(spark):
    """a<->b is already the stationary distribution: every iteration
    returns exactly (0.5, 0.5) regardless of damping."""
    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=3).collect()}
    assert got == {0: 0.5, 1: 0.5}


def test_pagerank_mass_conserved_with_dangling(spark):
    """0->2, 1->2: node 2 is dangling; its mass redistributes uniformly
    so total rank stays 1 and the sink outranks its sources equally."""
    e = spark.createDataFrame([(0, 2), (1, 2)], "src long, dst long")
    rows = pagerank(e, iters=5).collect()
    total = sum(r["rank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-6)
    got = {r["node"]: r["rank"] for r in rows}
    assert got[2] > got[0] and got[0] == got[1]


def test_pagerank_dedups_edges_and_drops_self_loops(spark):
    """Duplicate edges and self-loops must not change the result:
    (0,1)x3 + (0,0) behaves exactly like the single edge (0,1)."""
    noisy = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 1), (0, 0), (1, 0)], "src long, dst long"
    )
    clean = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    a = sorted(map(tuple, pagerank(noisy, iters=4).collect()))
    b = sorted(map(tuple, pagerank(clean, iters=4).collect()))
    assert a == b


def test_pagerank_deterministic_under_partitioning(spark):
    """Decimal-summed contributions: bit-identical ranks regardless of
    input partitioning (the cross-cluster-size reproducibility
    contract)."""
    rows = [(i % 13, (i * 5 + 2) % 17) for i in range(300)]
    e = spark.createDataFrame(rows, "src long, dst long")
    a = sorted(map(tuple, pagerank(e, iters=4).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(11), iters=4).collect()))
    assert a == b
    with pytest.raises(ValueError):
        pagerank(e, iters=-1)
    with pytest.raises(ValueError):
        pagerank(e, damping=1.0)


def test_pagerank_empty_after_self_loop_removal(spark):
    e = spark.createDataFrame([(3, 3), (5, 5)], "src long, dst long")
    out = pagerank(e, iters=2)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["node", "rank"]
