"""Candidate-pair verification (operator N6).

The analog of the reference's strict mode: fast tiers may false-positive,
verification decides (reference: /root/reference/src/processor.rs:61-64
selects full hash vs prefix hash; our knob is ``exact_verify``).

Two verifiers:
- ``estimate``: fraction of agreeing MinHash signature positions — an
  unbiased Jaccard estimator computed from columns already on hand with
  zip_with + aggregate (pure JVM, no shuffle beyond the two signature joins);
- ``exact``: recompute shingle-set Jaccard from the docs in an Arrow-batched
  pandas UDF (config ``exact_verify=True``) — the strict path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dedup.config import DedupConfig


def _agreement(col_a, col_b, num_perm: int):
    matches = F.aggregate(
        F.zip_with(col_a, col_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return matches.cast("double") / F.lit(float(num_perm))


def verify_pairs(
    pairs: DataFrame,
    signatures: DataFrame,
    cfg: DedupConfig | None = None,
    conversations: DataFrame | None = None,
) -> DataFrame:
    """pairs(conv_a, conv_b, source) → verified edges with a ``similarity``
    column, filtered to similarity ≥ jaccard_threshold.

    Only 'lsh' candidates are (re)verified here: every other tier arrives
    pre-verified by its own stronger check — 'exact' by full-content hash
    equality, 'span' by exact LCS length (suffix.verify_span_pairs),
    'simhash' by per-turn Hamming + coverage. Re-checking a span pair
    against GLOBAL Jaccard would be wrong by design: sharing one long span
    does not make two conversations globally similar.

    Signature joins broadcast when small; at scale they are plain
    shuffle-hash joins on conv_id, the same key the signature table is
    already partitioned by.
    """
    cfg = cfg or DedupConfig()
    exact_edges = pairs.where(F.col("source") != "lsh").withColumn(
        "similarity",
        F.when(F.col("source") == "exact", F.lit(1.0)).otherwise(F.lit(None).cast("double")),
    )
    cand = pairs.where(F.col("source") == "lsh")

    if cfg.exact_verify:
        if conversations is None:
            raise ValueError("exact_verify requires the conversations DataFrame")
        docs = conversations.select("conv_id", "doc")
        joined = (
            cand.join(docs.withColumnsRenamed({"conv_id": "conv_a", "doc": "doc_a"}), "conv_a")
            .join(docs.withColumnsRenamed({"conv_id": "conv_b", "doc": "doc_b"}), "conv_b")
            # UDF cost ∝ rows; spread the (small-bytes) pair table wide
            .repartition(conversations.sparkSession.sparkContext.defaultParallelism)
        )
        k = cfg.shingle_k

        @F.pandas_udf(T.DoubleType())
        def jac(doc_a: pd.Series, doc_b: pd.Series) -> pd.Series:
            from dedup.minhash import py_normalize, shingle_hashes

            out = np.empty(len(doc_a))
            for i, (x, y) in enumerate(zip(doc_a, doc_b)):
                # py_normalize — the SAME normalization the signature tier
                # shingles under (incl. the \x1c-\x1f separator class), so
                # exact-verify Jaccard is the quantity MinHash estimates
                sa = shingle_hashes(py_normalize(x or ""), k)
                sb = shingle_hashes(py_normalize(y or ""), k)
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                out[i] = inter / union if union else 1.0
            return pd.Series(out)

        verified = joined.withColumn("similarity", jac("doc_a", "doc_b")).drop(
            "doc_a", "doc_b"
        )
    else:
        sigs = signatures.select("conv_id", "minhash")
        verified = (
            cand.join(
                sigs.withColumnsRenamed({"conv_id": "conv_a", "minhash": "sig_a"}),
                "conv_a",
            )
            .join(
                sigs.withColumnsRenamed({"conv_id": "conv_b", "minhash": "sig_b"}),
                "conv_b",
            )
            .withColumn("similarity", _agreement(F.col("sig_a"), F.col("sig_b"), cfg.num_perm))
            .drop("sig_a", "sig_b")
        )

    verified = verified.where(F.col("similarity") >= F.lit(cfg.jaccard_threshold))
    return verified.select("conv_a", "conv_b", "source", "similarity").unionByName(
        exact_edges.select("conv_a", "conv_b", "source", "similarity")
    )
