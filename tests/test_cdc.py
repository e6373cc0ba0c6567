"""apply_cdc — latest-wins CDC merge onto a snapshot."""

from __future__ import annotations

import pytest

from dandi_s3_log_parser_spark.operators.cdc import apply_cdc


@pytest.fixture(scope="module")
def snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, bal double",
    )


def _ch(spark, rows):
    return spark.createDataFrame(
        rows, "id long, name string, bal double, seq long, op string"
    )


def test_apply_cdc_upsert_delete_insert_passthrough(spark, snap):
    changes = _ch(spark, [
        (1, "a2", 11.0, 100, "U"),   # replace key 1
        (2, None, 0.0, 101, "D"),    # delete key 2
        (9, "new", 99.0, 102, "U"),  # insert brand-new key 9
    ])
    got = {r["id"]: r for r in apply_cdc(snap, changes).collect()}
    assert set(got) == {1, 3, 9}
    assert (got[1]["name"], got[1]["bal"]) == ("a2", 11.0)
    assert (got[3]["name"], got[3]["bal"]) == ("c", 30.0)  # untouched
    assert got[9]["name"] == "new"


def test_apply_cdc_latest_wins_within_key(spark, snap):
    """Only the highest-seq change applies — including a delete that is
    later resurrected by a higher-seq upsert."""
    changes = _ch(spark, [
        (1, "old", 1.0, 10, "U"),
        (1, None, 0.0, 20, "D"),
        (1, "final", 3.0, 30, "U"),
        (2, "gone", 0.0, 40, "U"),
        (2, None, 0.0, 50, "D"),
    ])
    got = {r["id"]: r for r in apply_cdc(snap, changes).collect()}
    assert set(got) == {1, 3}
    assert (got[1]["name"], got[1]["bal"]) == ("final", 3.0)


def test_apply_cdc_requires_snapshot_columns(spark, snap):
    bad = spark.createDataFrame(
        [(1, 5, "U")], "id long, seq long, op string"
    )
    with pytest.raises(ValueError, match="missing snapshot columns"):
        apply_cdc(snap, bad)


def test_apply_cdc_schema_matches_snapshot(spark, snap):
    changes = _ch(spark, [(1, "x", 1.0, 1, "U")])
    out = apply_cdc(snap, changes)
    assert out.columns == snap.columns


def test_apply_cdc_rejects_malformed_op(spark, snap):
    """A malformed op ('u', 'I', NULL) used to fall through to the
    delete path and silently drop the row (round-4 ADVICE); the plan
    now raises at execution time instead of losing data."""
    for bad_op in ("u", "I", None):
        changes = _ch(spark, [(1, "x", 1.0, 1, bad_op)])
        with pytest.raises(Exception) as exc:
            apply_cdc(snap, changes).collect()
        assert "apply_cdc: op must be" in str(exc.value), bad_op


def test_apply_cdc_plan_snapshot_never_shuffled(spark, snap):
    """No window anywhere, and with a small delta AQE turns the anti
    join into a broadcast — the snapshot side carries no Exchange (the
    only sorts in the plan belong to the delta's SortAggregate)."""
    changes = _ch(spark, [(1, "x", 1.0, 1, "U")])
    out = apply_cdc(snap, changes)
    out.collect()  # finalize AQE
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
