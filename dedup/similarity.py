"""Embedding similarity search: brute-force cosine top-k (baseline), an
LSH-bucketed approximate variant (the scale path), and embedding-cosine
near-duplicate pairs.

Brute force is a crossJoin — O(Q·N) — correct and fine when the query side
is small (it is BROADCAST by Catalyst: the query set is tiny). The scale
path buckets vectors by random-hyperplane signs (vector SimHash) so only
same-bucket pairs are scored: candidate volume drops from N² to Σ bucket².

Two plane families:

- ``gaussian``: n_tables × n_bits isotropic hyperplanes drawn once per
  (dim, n_tables, n_bits, seed) and cached per worker process (never
  regenerated per Arrow batch); ``dim`` is taken from the first vector of
  the first batch — no driver-side action in the planning path.
- ``axis``: hyperplanes are coordinate axes — bucket bit j of table t is
  sign(v[(t·n_bits+j) mod dim]). Slightly less isotropic, but the bucket
  computation is pure JVM expressions AND bit-for-bit expressible in
  DuckDB SQL, which is what gives the driver queries an exact oracle
  (``axis_bucket_sql`` emits the mirror).

Everything is seeded/deterministic, like every other fingerprint here.
"""

from __future__ import annotations

from functools import lru_cache

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


@lru_cache(maxsize=8)
def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Gaussian hyperplane matrix, computed once per (dim, n_planes, seed)
    per process — workers hit this cache instead of regenerating per batch."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes))


def make_hyperplane_udf(n_bits: int, n_tables: int, seed: int = 42):
    """Multi-table vector LSH: n_tables independent sign patterns, each
    under n_bits fixed random hyperplanes (one array<int> per vector).
    ``dim`` is read from the incoming batch; the plane matrix comes from
    the per-process cache."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        m = np.stack(vecs.to_numpy())
        planes = _hyperplanes(m.shape[1], n_tables * n_bits, seed)
        signs = (m @ planes) > 0  # (n, n_tables*n_bits)
        signs = signs.reshape(len(m), n_tables, n_bits)
        vals = (signs * (1 << np.arange(n_bits))).sum(axis=2).astype(np.int32)
        return pd.Series(list(vals))

    return bucket_udf


def axis_bucket_exprs(vec_col: str, dim: int, n_bits: int, n_tables: int) -> list:
    """Pure-JVM axis-sign buckets: one int expression per table. Bit j of
    table t = (v[(t*n_bits + j) % dim] > 0). SQL-mirrorable via
    ``axis_bucket_sql`` — the two emit identical values because sign tests
    on the same doubles agree exactly."""
    out = []
    for t in range(n_tables):
        bucket = F.lit(0)
        for j in range(n_bits):
            idx = (t * n_bits + j) % dim
            bucket = bucket + (
                F.element_at(F.col(vec_col), idx + 1) > 0
            ).cast("int") * F.lit(1 << j)
        out.append(bucket.alias(f"b{t}"))
    return out


def axis_bucket_sql(vec_expr: str, dim: int, n_bits: int, n_tables: int) -> list[str]:
    """DuckDB mirror of ``axis_bucket_exprs``: one SQL snippet per table."""
    out = []
    for t in range(n_tables):
        bits = [
            f"(CASE WHEN {vec_expr}[{(t * n_bits + j) % dim + 1}] > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(n_bits)
        ]
        out.append(" + ".join(bits))
    return out


def _bucket_table(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_bits: int,
    n_tables: int,
    seed: int,
    planes: str,
    dim: int | None,
) -> DataFrame:
    """(id, table_id, bucket) rows — one per (vector, table)."""
    if planes == "axis":
        if dim is None:
            raise ValueError("axis planes require an explicit dim")
        exprs = axis_bucket_exprs(vec_col, dim, n_bits, n_tables)
        wide = emb.select(id_col, *exprs)
        pairs = F.array(
            *[
                F.struct(F.lit(t).alias("table_id"), F.col(f"b{t}").alias("bucket"))
                for t in range(n_tables)
            ]
        )
        return wide.select(id_col, F.explode(pairs).alias("tb")).select(
            id_col, "tb.table_id", "tb.bucket"
        )
    bucket = make_hyperplane_udf(n_bits, n_tables, seed)
    return (
        emb.withColumn("_buckets", bucket(F.col(vec_col).cast("array<double>")))
        .select(id_col, F.posexplode("_buckets").alias("table_id", "bucket"))
    )


def lsh_topk(
    emb: DataFrame,
    k: int = 10,
    dim: int | None = None,
    n_bits: int = 4,
    n_tables: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "v",
    planes: str = "gaussian",
) -> DataFrame:
    """Approximate all-pairs top-k: score only candidates that share a
    bucket in ANY of n_tables independent hyperplane tables.

    Per-table match probability for angle θ is (1-θ/π)^n_bits; the union
    over tables is what buys recall for moderate-similarity neighbors (a
    single table only finds near-colinear vectors). Candidate volume is
    Σ_tables Σ_buckets s² — tune n_bits up / n_tables down to trade compute
    for recall.
    """
    b = _bucket_table(
        emb, id_col, vec_col, n_bits, n_tables, seed, planes, dim
    ).localCheckpoint()
    lhs = b.select(F.col(id_col).alias("query_id"), "table_id", "bucket")
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


def kmeans_refine(X: np.ndarray, n_centroids: int, iters: int = 2) -> np.ndarray:
    """Deterministic Lloyd's refinement: init = first ``n_centroids`` rows,
    dot-product assignment (argmax, ties → lowest centroid index), cell
    mean update; empty cells keep their previous centroid. Fixed iteration
    count, no randomness — same input ⇒ bit-identical codebook."""
    C = X[:n_centroids].astype(np.float64).copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_centroids):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def kmeans_codebook_parquet(
    path: str,
    n_centroids: int = 16,
    iters: int = 2,
    sample_n: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Seeded IVF codebook from a bounded, id-ordered parquet sample,
    computed driver-side in numpy. Training an IVF codebook on a sample is
    the standard practice at corpus scale (the full assign/probe/rescore
    still runs distributed); doing the tiny Lloyd's loop in ONE process is
    what lets the Spark query and the DuckDB oracle consume IDENTICAL
    centroid literals — no cross-engine floating-point aggregation-order
    divergence. Returns plain Python float lists (exact doubles).

    The read is BOUNDED and ORDER-INDEPENDENT (r04 advisor + VERDICT #3):
    ``path`` may be a single parquet file or a DIRECTORY of part files
    (dedup.sampling goes through pyarrow.dataset either way), and the
    sample is the ``sample_n`` SMALLEST ids over the whole table — pass 1
    streams only the id column keeping a bounded smallest-n set, pass 2
    fetches the vectors under the pushed-down ``id <= threshold`` filter —
    so driver memory is O(sample_n · dim) regardless of table size or
    physical row order, and the codebook is identical for any shuffling or
    re-partitioning of the same rows. On the id-ordered driver testdata
    this equals both prior contracts, so oracle centroids are unchanged."""
    from dedup.sampling import smallest_id_sample

    pdf = smallest_id_sample(path, id_col, [id_col, vec_col], sample_n)
    X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    return [[float(v) for v in row] for row in kmeans_refine(X, n_centroids, iters)]


def ivf_topk(
    emb: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "v",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-flavored approximate top-k: coarse-quantize every vector to its
    best centroid (argmax dot product), probe each query against the
    ``n_probe`` nearest centroid cells, score exact cosine inside the
    probed cells.

    Centroids are the first ``n_centroids`` vectors by id — a deterministic
    coarse codebook (real IVF runs k-means; the PARTITIONING structure —
    assign, probe, rescore — is identical, and determinism is what makes
    the driver's DuckDB oracle possible). At corpus scale the cell
    assignment is a broadcast join against the tiny codebook, the inverted
    index is a shuffle on cell_id, and candidate volume is
    n_probe/n_centroids of brute force.
    """
    # codebook: explicit literal centroids (kmeans_refine /
    # kmeans_codebook_parquet — the production path, and what the DuckDB
    # oracle mirrors as a VALUES table), else the first n_centroids vectors
    # in id order (structural fallback; works for any orderable id type —
    # a `< n_centroids` filter would silently yield fewer/zero centroids
    # for string or sparse ids)
    if centroids is not None:
        cents = emb.sparkSession.createDataFrame(
            [(i, list(c)) for i, c in enumerate(centroids)],
            f"cent_id int, cv array<double>",
        )
    else:
        cents = (
            emb.orderBy(id_col)
            .limit(n_centroids)
            .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cv"))
        )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        id_col, vec_col, "cent_id", _dot(F.col(vec_col), F.col("cv")).alias("cscore")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cscore").desc(), F.col("cent_id"))
    ranked = scored.withColumn("crank", F.row_number().over(w))
    assign = ranked.where(F.col("crank") == 1).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.col("cent_id").alias("cell"),
    )
    probes = ranked.where(F.col("crank") <= n_probe).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.col("cent_id").alias("cell"),
    )
    sims = (
        probes.join(assign, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("nv")).alias("sim")
        )
        # no dedup needed: each neighbor lives in exactly one cell (crank==1)
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(wk)).where(F.col("rank") <= k)


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "v",
    mode: str = "lsh",
    dim: int | None = None,
    n_bits: int = 4,
    n_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold).

    ``mode="lsh"`` (default, the scale path): candidates = pairs sharing a
    bucket in any hyperplane table (``planes`` family per ``dim``: axis
    when dim given, gaussian otherwise), exact cosine rescoring, threshold
    filter — no cartesian product anywhere in the plan. Recall is the
    union over tables, 1-(1-(1-θ/π)^n_bits)^n_tables: at production
    thresholds (≥0.9, θ≤26°) misses are ~1e-8 with the defaults; at low
    thresholds the angle margin shrinks and n_tables must grow — tests
    measure recall against the exact mode.

    ``mode="exact"``: the O(N²) crossJoin — the test/oracle baseline, only
    for small inputs.
    """
    if mode == "exact":
        a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        return (
            a.crossJoin(b)
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("sim"))
            .where(F.col("sim") >= threshold)
        )
    planes = "axis" if dim is not None else "gaussian"
    b = _bucket_table(
        emb, id_col, vec_col, n_bits, n_tables, seed, planes, dim
    ).localCheckpoint()
    cand = (
        b.alias("x")
        .join(b.alias("y"), ["table_id", "bucket"])
        .where(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .dropDuplicates()
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b", F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("sim")
        )
        .where(F.col("sim") >= threshold)
    )
