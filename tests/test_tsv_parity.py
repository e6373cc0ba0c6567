"""TSV sink parity with the reference's binning golden file tree."""

from pathlib import Path

import pandas as pd
import pandas.testing

from dandi_s3_log_parser_spark.operators.route import route_binned
from dandi_s3_log_parser_spark.sources.tsv import (
    export_binned_tsv_tree,
    read_reduced_tsv,
    write_reduced_tsv,
)

BINNING = "tests/test_binning/examples/binning_example_0"


def test_binning_golden_tree(spark, reference_dir, tmp_path):
    """Reference reduced logs in -> exact golden per-key TSV tree out
    (path set + frame equality, mirroring
    ``tests/test_binning/test_bin_reduced_s3_logs_by_object_key.py``)."""
    base = reference_dir / BINNING
    reduced = read_reduced_tsv(spark, str(base / "reduced_logs" / "*" / "*" / "*.tsv"))
    binned = route_binned(reduced, salt_buckets=2)
    written = export_binned_tsv_tree(binned, tmp_path)

    expected_dir = base / "expected_output"
    expected = sorted(
        p.relative_to(expected_dir) for p in expected_dir.rglob("*.tsv")
    )
    assert sorted(written) == expected
    for rel in expected:
        got = pd.read_csv(tmp_path / rel, sep="\t")
        want = pd.read_csv(expected_dir / rel, sep="\t")
        pandas.testing.assert_frame_equal(got, want)


def test_reduced_tsv_roundtrip(spark, reference_dir, tmp_path):
    base = reference_dir / "tests/test_reduction/examples/reduction_example_0"
    golden = base / "expected_output/2020/01/01.tsv"
    df = read_reduced_tsv(spark, str(golden))
    out = tmp_path / "roundtrip.tsv"
    write_reduced_tsv(df, out)
    assert out.read_text() == golden.read_text()


def test_empty_reduced_tsv_has_no_header(spark, tmp_path):
    """Empty result -> empty file, no header (reference
    ``_s3_log_file_reducer.py:150``)."""
    df = spark.createDataFrame(
        [], "timestamp timestamp, ip_address string, object_key string, bytes_sent long"
    )
    out = tmp_path / "empty.tsv"
    write_reduced_tsv(df, out)
    assert out.read_text() == ""
