"""stream-curate: the one-command streaming ingest->curate path.

Covers the library transformation (filter semantics + cross-batch
first-seen dedup) and the exactly-once guarantee across a REAL
kill -9 / restart of the CLI process (file-source offset log + sink
metadata log + checkpointed dedup state, see
streaming/stream_curate.py module docs).
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# (doc_id, text, lang, source, n_chars) rows; texts chosen so the
# default filters decide deterministically: EN stopword-rich text
# passes, DE text fails the allowlist, punctuation junk fails quality
EN1 = "the quick brown fox jumps over the lazy dog and the cat"
EN2 = "a man and a woman walk into the old town with a map"
EN3 = "this is the third document and it has some more text in it"
DE1 = "der hund und die katze sind nicht in das alte haus gegangen"
JUNK = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"


def _doc(i, text, src="web"):
    return (i, text, "xx", src, len(text))


def _write_docs(spark, docs_dir, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("append").parquet(str(docs_dir))


def test_curate_stream_filters_and_cross_batch_dedup(spark, tmp_path):
    """Library path: lang allowlist + quality threshold + first-seen
    text dedup hold across two availableNow drains on one checkpoint
    (the state store carries the seen-set between runs)."""
    from dandi_s3_log_parser_spark.streaming.stream_curate import stream_curate

    docs, out, ckpt = tmp_path / "docs", tmp_path / "out", tmp_path / "ckpt"

    _write_docs(spark, docs, [
        _doc(1, EN1), _doc(2, EN1), _doc(3, DE1), _doc(4, JUNK), _doc(5, EN2),
    ])
    q = stream_curate(spark, str(docs), str(out), str(ckpt))
    q.awaitTermination(300)

    got1 = {(r.doc_id, r.text) for r in spark.read.parquet(str(out)).collect()}
    assert got1 == {(1, EN1), (5, EN2)}  # dup text, de, junk all dropped

    # second landing: repeats EN1/EN2 (cross-run dups) + one new EN3 +
    # EN1 under a DIFFERENT source (dedup is per-source, so it survives)
    _write_docs(spark, docs, [
        _doc(6, EN1), _doc(7, EN2), _doc(8, EN3), _doc(9, EN1, src="mirror"),
    ])
    q = stream_curate(spark, str(docs), str(out), str(ckpt))
    q.awaitTermination(300)

    got2 = {(r.doc_id, r.text) for r in spark.read.parquet(str(out)).collect()}
    assert got2 == {(1, EN1), (5, EN2), (8, EN3), (9, EN1)}


def test_stream_curate_cli_exactly_once_across_kill(spark, tmp_path):
    """Exactly-once across a hard kill: a follow-mode CLI process is
    SIGKILLed after committing its first landing; a fresh drain on the
    same checkpoint must (a) not re-emit the killed process's rows and
    (b) still know its dedup state, so the final kept-set equals the
    batch-distinct semantics with every row exactly once."""
    docs, out, ckpt = tmp_path / "docs", tmp_path / "out", tmp_path / "ckpt"

    _write_docs(spark, docs, [_doc(1, EN1), _doc(2, EN2), _doc(3, EN1)])

    proc = subprocess.Popen(
        [
            sys.executable, "-m", "dandi_s3_log_parser_spark",
            "--local-cores", "2",
            "stream-curate",
            "--docs", str(docs), "--out", str(out),
            "--checkpoint", str(ckpt), "--follow",
        ],
        cwd=str(REPO),
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        env=dict(os.environ, PYTHONPATH=str(REPO)),
    )
    try:
        # wait until the first landing is committed and visible
        deadline = time.time() + 240
        committed = set()
        while time.time() < deadline:
            try:
                committed = {
                    r.doc_id for r in spark.read.parquet(str(out)).collect()
                }
            except Exception:
                committed = set()
            if committed:
                break
            time.sleep(2)
        assert committed == {1, 2}, f"first landing not committed: {committed}"
    finally:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)

    # land repeats + one new doc AFTER the kill, then resume in-process
    _write_docs(spark, docs, [_doc(4, EN1), _doc(5, EN3), _doc(6, EN2)])
    from dandi_s3_log_parser_spark.streaming.stream_curate import stream_curate

    q = stream_curate(spark, str(docs), str(out), str(ckpt))
    q.awaitTermination(300)

    rows = spark.read.parquet(str(out)).collect()
    ids = sorted(r.doc_id for r in rows)
    assert ids == [1, 2, 5]  # no loss, no replay dup, state survived the kill
    assert len(ids) == len(set(ids))
