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
