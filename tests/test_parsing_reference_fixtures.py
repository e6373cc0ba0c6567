"""Golden-file parity with the reference's own reduction fixtures.

Mirrors the reference's e2e test strategy
(``tests/test_reduction/test_reduce_raw_s3_log.py`` and
``..._bad_lines.py``): run the reduction on the reference's raw log
fixtures and frame-compare against its expected TSVs.
"""

import pandas as pd
import pandas.testing

from dandi_s3_log_parser_spark.operators.reduce import (
    parse_and_filter_log_lines,
    reduced_to_tsv_strings,
    split_reduced,
)

EXAMPLES = "tests/test_reduction/examples"


def _run_reduction(spark, raw_log_path):
    raw = spark.read.text(str(raw_log_path))
    parsed = parse_and_filter_log_lines(raw, "value")
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


def test_reduction_example_0(spark, reference_dir):
    base = reference_dir / EXAMPLES / "reduction_example_0"
    out, errors = _run_reduction(spark, base / "raw_logs/2020/01/01.log")
    golden = _golden(base / "expected_output/2020/01/01.tsv")
    pandas.testing.assert_frame_equal(out, golden)
    assert errors.count() == 0


def test_reduction_example_2_bad_lines(spark, reference_dir):
    """Malformed/injection lines are cleanly dropped with ZERO error rows
    (reference ``test_reduce_raw_s3_log_bad_lines.py:41-44``)."""
    base = reference_dir / EXAMPLES / "reduction_example_2"
    out, errors = _run_reduction(spark, base / "raw_logs/2022/04/06.log")
    golden = _golden(base / "expected_output/2022/04/06.tsv")
    pandas.testing.assert_frame_equal(out, golden)
    assert errors.count() == 0


def test_reduction_example_1_batch(spark, reference_dir):
    """Folder-tree batch reduction: each day file maps to its golden
    (reference ``test_reduce_all_dandi_raw_s3_logs.py``)."""
    base = reference_dir / EXAMPLES / "reduction_example_1"
    for raw in sorted((base / "raw_logs").rglob("*.log")):
        rel = raw.relative_to(base / "raw_logs").with_suffix(".tsv")
        expected_path = base / "expected_output" / rel
        out, _ = _run_reduction(spark, raw)
        golden = _golden(expected_path)
        pandas.testing.assert_frame_equal(out, golden)
