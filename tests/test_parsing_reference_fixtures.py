"""Golden-file parity with the reference's own reduction fixtures.

Mirrors the reference's e2e test strategy
(``tests/test_reduction/test_reduce_raw_s3_log.py`` and
``..._bad_lines.py``): run the reduction on the reference's raw log
fixtures and frame-compare against its expected TSVs.
"""

import pandas as pd
import pandas.testing
import pytest

from dandi_s3_log_parser_spark.operators.reduce import (
    parse_and_filter_log_lines,
    reduced_to_tsv_strings,
    split_reduced,
)

EXAMPLES = "tests/test_reduction/examples"


def _run_reduction(spark, raw_log_path, native_fast=True):
    raw = spark.read.text(str(raw_log_path))
    parsed = parse_and_filter_log_lines(raw, "value", native_fast=native_fast)
    kept, errors = split_reduced(parsed)
    out = (
        reduced_to_tsv_strings(kept)
        .orderBy("timestamp")
        .toPandas()
        .reset_index(drop=True)
    )
    return out, errors


def _golden(path):
    df = pd.read_csv(path, sep="\t")
    df["bytes_sent"] = df["bytes_sent"].astype("int64")
    return df.sort_values("timestamp").reset_index(drop=True)


@pytest.mark.parametrize("native_fast", [True, False], ids=["fast", "slow"])
def test_reduction_example_0(spark, reference_dir, native_fast):
    base = reference_dir / EXAMPLES / "reduction_example_0"
    out, errors = _run_reduction(spark, base / "raw_logs/2020/01/01.log", native_fast)
    golden = _golden(base / "expected_output/2020/01/01.tsv")
    pandas.testing.assert_frame_equal(out, golden)
    assert errors.count() == 0


@pytest.mark.parametrize("native_fast", [True, False], ids=["fast", "slow"])
def test_reduction_example_2_bad_lines(spark, reference_dir, native_fast):
    """Malformed/injection lines are cleanly dropped with ZERO error rows
    (reference ``test_reduce_raw_s3_log_bad_lines.py:41-44``); BOTH the
    native fast path and the all-rows Arrow-UDF path must hit the same
    golden (path-equivalence, SURVEY §5)."""
    base = reference_dir / EXAMPLES / "reduction_example_2"
    out, errors = _run_reduction(spark, base / "raw_logs/2022/04/06.log", native_fast)
    golden = _golden(base / "expected_output/2022/04/06.tsv")
    pandas.testing.assert_frame_equal(out, golden)
    assert errors.count() == 0


@pytest.mark.parametrize("native_fast", [True, False], ids=["fast", "slow"])
def test_reduction_example_1_batch(spark, reference_dir, native_fast):
    """Folder-tree batch reduction: each day file maps to its golden
    (reference ``test_reduce_all_dandi_raw_s3_logs.py``)."""
    base = reference_dir / EXAMPLES / "reduction_example_1"
    for raw in sorted((base / "raw_logs").rglob("*.log")):
        rel = raw.relative_to(base / "raw_logs").with_suffix(".tsv")
        expected_path = base / "expected_output" / rel
        out, _ = _run_reduction(spark, raw, native_fast)
        golden = _golden(expected_path)
        pandas.testing.assert_frame_equal(out, golden)
