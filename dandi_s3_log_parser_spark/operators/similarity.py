"""Approximate-nearest-neighbor search over embedding columns.

Two tiers (training-data pipeline requirement):

* ``cosine_topk``        — exact brute force, built from native array
                           expressions (``zip_with`` + ``aggregate``);
                           the correctness baseline and fine when the
                           query set is small (broadcasted).
* ``lsh_bucketed_topk``  — random-hyperplane (SimHash-for-vectors) LSH:
                           sign-bit signatures computed in a vectorized
                           pandas UDF (one matmul per Arrow batch),
                           bucket join on signature prefix, exact rerank
                           within buckets.  The 100 TB path: candidate
                           generation is an equi-join on bucket ids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    # cast BEFORE multiplying: float*float loses bits vs the all-double
    # math a SQL oracle does
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: corpus x broadcast(queries) -> window rank.

    Ties broken by neighbor id for full determinism; similarity rounded
    to 6 dp in the output.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = c.crossJoin(q).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("c_vec"), F.col("q_vec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 1234) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim)).astype(np.float64)


def make_signature_udf(dim: int, n_planes: int = 16, seed: int = 1234):
    """Vectorized sign-bit signature: one (batch x dim) @ (dim x planes)
    matmul per Arrow batch — zero per-row Python."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.LongType())
    def signature(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        mat = np.vstack(vecs.to_numpy())
        bits = (mat @ planes.T) > 0
        weights = 1 << np.arange(bits.shape[1], dtype=np.int64)
        return pd.Series(bits @ weights)

    return signature


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    dim: int,
    n_planes: int = 16,
    seed: int = 1234,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN: equal-signature bucket join then exact rerank inside buckets.

    Recall is tunable via ``n_planes`` (fewer planes = bigger buckets =
    higher recall, more rerank work).  At scale, add multi-probe by
    unioning queries with bit-flipped signatures.
    """
    sig = make_signature_udf(dim, n_planes, seed)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        sig(F.col(vec_col)).alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            sig(F.col(vec_col)).alias("bucket"),
        )
    )
    scored = c.join(q, "bucket").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("c_vec"), F.col("q_vec")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (guarded all-pairs baseline)."""
    docs = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).limit(max_rows)
    a = docs.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = docs.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )
