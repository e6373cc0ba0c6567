"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The step every large-scale pretraining pipeline runs before training
(GPT-3 appendix C / Llama-style 13-gram overlap): any document whose
text contains an n-gram that also appears in a held-out benchmark is
flagged (and usually dropped) so eval scores are not contaminated by
memorized test data.

This is the corpus-side analog of the reference's excluded-IP filter
(``_s3_log_file_reducer.py:211-214``) — a "drop rows matching a small
deny set" operator — except the deny set here is derived from text
content rather than read from a config list.

Scale shape (10^12 docs vs a benchmark of ~10^5 eval items):

- the benchmark n-gram set is SMALL (eval suites are megabytes), so it
  is broadcast — the corpus-side explode-join is map-side, no shuffle
  of corpus grams;
- the broadcast inner join filters ~everything before the per-doc
  aggregation, so the only shuffle carries (doc_id, matched_gram)
  rows for contaminated docs — a vanishing fraction of the corpus;
- the final left join restoring zero-match docs is keyed on doc_id
  against the narrow (id, count) hit table.

n-gram construction reuses :func:`~..operators.dedup.with_shingles`
(linear-time arrays_zip slices, distinct per doc), so tokenizer
semantics are shared bit-for-bit with the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_shingles


def benchmark_ngrams(
    benchmark: DataFrame, *, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-grams of the benchmark set — one ``gram`` column.

    Distinct twice: per-document inside ``with_shingles`` (array_distinct)
    and globally after the explode, so the broadcast side is minimal.
    """
    return (
        with_shingles(benchmark, text_col, n, out_col="_sh")
        .select(F.explode("_sh").alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_overlap: int = 1,
) -> DataFrame:
    """Per-document benchmark-overlap report.

    Returns ``(id_col, matched_ngrams, contaminated)`` for EVERY input
    document: ``matched_ngrams`` = number of distinct n-grams the doc
    shares with the benchmark, ``contaminated`` = matched >= min_overlap.

    The benchmark side is explicitly ``F.broadcast`` — eval sets are
    dimension-sized by definition, and a shuffled join here would
    re-partition the full corpus gram explosion for no reason.
    """
    grams = benchmark_ngrams(benchmark, text_col=text_col, n=n)
    doc_grams = with_shingles(docs, text_col, n, out_col="_sh").select(
        F.col(id_col), F.explode("_sh").alias("gram")
    )
    # grams are distinct per doc already, so count(*) == count(DISTINCT)
    hits = (
        doc_grams.join(F.broadcast(grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("matched_ngrams"))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("matched_ngrams"), F.lit(0))
        .cast("long")
        .alias("matched_ngrams"),
        (F.coalesce(F.col("matched_ngrams"), F.lit(0)) >= min_overlap).alias(
            "contaminated"
        ),
    )
