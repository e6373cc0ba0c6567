"""Packaging contract: the pipeline ships as spark-submit --py-files.

north_rule: "run via spark-submit --py-files on a multi-executor
cluster" — evidenced here with a local[4] master, the package arriving
on the (thread) executors exclusively via the zip.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pyspark
import pytest

REPO = Path(__file__).resolve().parents[1]
SPARK_SUBMIT = Path(pyspark.__path__[0]) / "bin" / "spark-submit"


@pytest.mark.slow
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    sys.path.insert(0, str(REPO))
    from scripts.build_pyfiles_zip import build

    zip_path = build(tmp_path / "dandi_s3_log_parser_spark.zip")
    assert zip_path.exists() and zip_path.stat().st_size > 10_000

    # datagen + pipeline both through the submitted job; cwd is tmp_path
    # so the repo's package dir cannot leak in via sys.path[0].
    env = dict(os.environ, PYTHONPATH="", SPARK_GRAFT_CPUS="4")
    data, wh = tmp_path / "data", tmp_path / "wh"
    base = [
        str(SPARK_SUBMIT),
        "--master", "local[4]",
        "--py-files", str(zip_path),
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=4",
        str(REPO / "jobs" / "pipeline_job.py"),
    ]
    r1 = subprocess.run(
        base + ["datagen", "--out", str(data), "--pages", "400", "--seed", "7"],
        capture_output=True, text=True, cwd=tmp_path, env=env, timeout=600,
    )
    assert r1.returncode == 0, r1.stdout[-2000:] + r1.stderr[-2000:]
    r2 = subprocess.run(
        base + [
            "pipeline", "--stage", "all",
            "--pages", str(data / "pages"),
            "--dims", str(data / "dims"),
            "--warehouse", str(wh),
        ],
        capture_output=True, text=True, cwd=tmp_path, env=env, timeout=600,
    )
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    # outputs exist and are non-trivial
    for table in ("reduced", "binned", "mapped_per_asset",
                  "dandiset_summary_by_day", "lineage"):
        assert any((wh / table).rglob("*.parquet")), table

    shutil.rmtree(tmp_path / "data", ignore_errors=True)


@pytest.mark.slow
def test_curate_cli_end_to_end(tmp_path):
    """The curate subcommand drives funnel -> dedup -> line dedup and
    writes a curated parquet through the same CLI surface as pipeline."""
    out = tmp_path / "curated"
    r = subprocess.run(
        [
            sys.executable, "-m", "dandi_s3_log_parser_spark.cli",
            "--local-cores", "4",
            "curate",
            "--documents", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out),
            "--min-chars", "100",
            "--lang", "en",
            "--line-df-limit", "3",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("curate:")]
    assert any("rule=too_short" in ln for ln in lines)
    assert any("rule=survived" in ln for ln in lines)
    assert lines[-1].startswith("curate: wrote ")
    import duckdb

    n = duckdb.sql(f"SELECT count(*) FROM '{out}/*.parquet'").fetchone()[0]
    assert 0 < n < 500  # sf0.001 has 500 docs; the funnel dropped some
    cols = {
        c[0]
        for c in duckdb.sql(
            f"DESCRIBE SELECT * FROM '{out}/*.parquet'"
        ).fetchall()
    }
    assert {"doc_id", "text"} <= cols


@pytest.mark.slow
def test_curate_cli_with_decontamination(tmp_path):
    """The full one-command curation story: funnel -> benchmark
    decontamination -> exact dedup -> line dedup.  The benchmark is 5
    verbatim corpus texts, so those docs (where funnel-surviving) are
    guaranteed contaminated and must be absent from the output."""
    import duckdb

    docs_src = "/root/testdata/sf0.001/documents.parquet"
    bench = tmp_path / "bench.parquet"
    duckdb.sql(
        f"COPY (SELECT text FROM '{docs_src}' ORDER BY doc_id LIMIT 5) "
        f"TO '{bench}' (FORMAT PARQUET)"
    )
    contaminated_ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{docs_src}' ORDER BY doc_id LIMIT 5"
        ).fetchall()
    ]
    out = tmp_path / "curated"
    r = subprocess.run(
        [
            sys.executable, "-m", "dandi_s3_log_parser_spark.cli",
            "--local-cores", "4",
            "curate",
            "--documents", docs_src,
            "--out", str(out),
            "--min-chars", "100",
            "--benchmark", str(bench),
            "--decontam-ngram", "3",
            "--max-per-source", "15",
            "--line-df-limit", "3",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    decon = next(
        ln for ln in r.stdout.splitlines()
        if ln.startswith("curate:") and "rule=benchmark_contaminated" in ln
    )
    n_bad = int(decon.split("docs=")[1].split()[0])
    assert n_bad > 0  # verbatim benchmark texts must be flagged
    ids = {
        row[0]
        for row in duckdb.sql(
            f"SELECT doc_id FROM '{out}/*.parquet'"
        ).fetchall()
    }
    assert not (ids & set(contaminated_ids))
    assert any("rule=over_source_cap" in ln for ln in r.stdout.splitlines())
    max_per_source = duckdb.sql(
        f"SELECT max(cnt) FROM (SELECT count(*) AS cnt "
        f"FROM '{out}/*.parquet' GROUP BY source)"
    ).fetchone()[0]
    assert max_per_source <= 15


@pytest.mark.slow
def test_curate_cli_null_lang_report_matches_output(tmp_path):
    """A NULL rule input (here lang IS NULL under --lang en) must mean
    "rule does not fail" in BOTH the funnel report and the written
    output: the CASE chain counts such docs as survived, and the keep
    filter coalesces each condition to FALSE so `~(c1|c2)` cannot turn
    NULL into a silent drop (ADVICE r3, medium)."""
    import duckdb

    docs = tmp_path / "docs.parquet"
    duckdb.sql(
        "COPY (SELECT i AS doc_id, "
        "  repeat('word' || CAST(i AS VARCHAR) || ' ', 60) AS text, "
        "  CASE WHEN i % 3 = 0 THEN NULL ELSE 'en' END AS lang "
        "FROM range(30) t(i)) TO '" + str(docs) + "' (FORMAT PARQUET)"
    )
    out = tmp_path / "curated"
    r = subprocess.run(
        [
            sys.executable, "-m", "dandi_s3_log_parser_spark.cli",
            "--local-cores", "4",
            "curate",
            "--documents", str(docs),
            "--out", str(out),
            "--min-chars", "100",
            "--lang", "en",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    survived = next(
        int(ln.rsplit("remaining=", 1)[1])
        for ln in r.stdout.splitlines()
        if ln.startswith("curate:") and "rule=survived" in ln
    )
    written = duckdb.sql(
        f"SELECT count(*) FROM '{out}/*.parquet'"
    ).fetchone()[0]
    # all 30 texts are unique and long, so dedup drops nothing: the
    # funnel's survived count and the written output must agree, and
    # the 10 NULL-lang docs must be present (not silently dropped)
    assert survived == written == 30
    nulls = duckdb.sql(
        f"SELECT count(*) FROM '{out}/*.parquet' WHERE lang IS NULL"
    ).fetchone()[0]
    assert nulls == 10


@pytest.mark.slow
def test_curate_cli_writes_training_shards(tmp_path):
    """--shards writes shard=N/ dirs whose row order is the
    deterministic corpus_shuffle training order."""
    out = tmp_path / "sharded"
    r = subprocess.run(
        [
            sys.executable, "-m", "dandi_s3_log_parser_spark.cli",
            "--local-cores", "4",
            "curate",
            "--documents", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out),
            "--min-chars", "0",
            "--shards", "4",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "in 4 shards" in r.stdout
    shard_dirs = sorted(p.name for p in out.iterdir() if p.name.startswith("shard="))
    assert shard_dirs == [f"shard={i}" for i in range(4)]
    import duckdb

    # every shard: exactly one file, pos dense from 1, file row order
    # (parquet preserves it) == training order
    for i in range(4):
        files = list((out / f"shard={i}").glob("*.parquet"))
        assert len(files) == 1, files
        rows = duckdb.sql(
            f"SELECT pos FROM read_parquet('{files[0]}')"
        ).fetchall()
        assert [p for (p,) in rows] == sorted(p for (p,) in rows)
        assert rows[0][0] == 1 and len(rows) == rows[-1][0]
    total = duckdb.sql(
        f"SELECT count(DISTINCT doc_id), count(*) FROM read_parquet('{out}/*/*.parquet')"
    ).fetchone()
    assert total[0] == total[1] == 500  # total: min-chars 0 keeps all


@pytest.mark.slow
def test_curate_cli_encode_and_shards_end_to_end(tmp_path):
    """The full one-command export: curate -> encode to token ids ->
    deterministic training shards, ids present in the shard files."""
    out = tmp_path / "encoded_shards"
    r = subprocess.run(
        [
            sys.executable, "-m", "dandi_s3_log_parser_spark.cli",
            "--local-cores", "4",
            "curate",
            "--documents", "/root/testdata/sf0.001/documents.parquet",
            "--out", str(out),
            "--min-chars", "0",
            "--encode-vocab", "50",
            "--shards", "2",
        ],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "encoded with top-50 vocab" in r.stdout
    import duckdb

    rows = duckdb.sql(
        f"SELECT n_tokens, len(ids) AS l, "
        f"len(list_filter(ids, x -> x > 0)) AS in_vocab "
        f"FROM read_parquet('{out}/*/*.parquet')"
    ).fetchall()
    assert len(rows) == 500
    for n_tokens, l, in_vocab in rows:
        assert n_tokens == l  # one id per token, order-preserving len
        assert 0 <= in_vocab <= l
    # the top-50 vocab must cover a meaningful share of tokens
    tot = sum(r[1] for r in rows)
    inv = sum(r[2] for r in rows)
    assert inv > 0.3 * tot
