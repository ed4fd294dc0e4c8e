"""Embedding similarity search: brute-force cosine top-k (baseline) and an
LSH-bucketed approximate variant (the scale path), plus embedding-cosine
near-duplicate pairs.

Brute force is a crossJoin — O(Q·N) — correct and fine when the query side
is small (it is BROADCAST by Catalyst: the query set is tiny). The scale
path buckets vectors by random-hyperplane signs (vector SimHash) so only
same-bucket pairs are scored: candidate volume drops from N² to Σ bucket².
Projections are drawn from a fixed seed — deterministic, like every other
fingerprint in this engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(c):
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10, id_col: str = "vec_id", vec_col: str = "v"
) -> DataFrame:
    """queries(query_id, qv) × emb(id, v) → top-k cosine neighbors each."""
    sims = (
        queries.crossJoin(emb)
        .where(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine_expr(F.col("qv"), F.col(vec_col)).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def make_hyperplane_udf(dim: int, n_bits: int, n_tables: int, seed: int = 42):
    """Multi-table vector LSH: n_tables independent sign patterns, each
    under n_bits fixed random hyperplanes (one array<int> per vector)."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_tables * n_bits))
        m = np.stack(vecs.to_numpy())
        signs = (m @ planes) > 0  # (n, n_tables*n_bits)
        signs = signs.reshape(len(m), n_tables, n_bits)
        vals = (signs * (1 << np.arange(n_bits))).sum(axis=2).astype(np.int32)
        return pd.Series(list(vals))

    return bucket_udf


def lsh_topk(
    emb: DataFrame,
    k: int = 10,
    dim: int | None = None,
    n_bits: int = 4,
    n_tables: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Approximate all-pairs top-k: score only candidates that share a
    bucket in ANY of n_tables independent hyperplane tables.

    Per-table match probability for angle θ is (1-θ/π)^n_bits; the union
    over tables is what buys recall for moderate-similarity neighbors (a
    single table only finds near-colinear vectors). Candidate volume is
    Σ_tables Σ_buckets s² — tune n_bits up / n_tables down to trade compute
    for recall.
    """
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    bucket = make_hyperplane_udf(dim, n_bits, n_tables, seed)
    b = (
        emb.withColumn("_buckets", bucket(F.col(vec_col).cast("array<double>")))
        .select(id_col, F.posexplode("_buckets").alias("table_id", "bucket"))
        .localCheckpoint()
    )
    lhs = b.select(
        F.col(id_col).alias("query_id"), "table_id", "bucket"
    )
    cand = (
        lhs.join(b.select(F.col(id_col).alias("neighbor_id"), "table_id", "bucket"),
                 ["table_id", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates()
    )
    vecs = emb.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    nvecs = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    sims = (
        cand.join(vecs, "query_id")
        .join(nvecs, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("nv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "v"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold).

    Exact variant (crossJoin) — at scale swap the join for the bucketed
    candidates from lsh_topk; the interface (pairs out) is identical.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("sim"))
        .where(F.col("sim") >= threshold)
    )
