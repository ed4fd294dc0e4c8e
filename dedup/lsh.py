"""LSH banding + candidate-pair generation (operators N4+N5).

The distributed replacement for the reference's DashMap key-collision
grouping (reference: /root/reference/src/processor.rs:71-74): instead of
inserting fingerprints into a concurrent hashmap, signatures are split into
``b`` bands of ``r`` rows, each band is hashed (JVM-side xxhash64 over the
int slice — no Python), and a self-equi-join on (band_id, band_hash) emits
candidate pairs.

Skew strategy (north rule: explicit handling, no silent caps):
- AQE skew-join is on session-wide (session.py) so runtime mega-partitions
  get split;
- buckets larger than ``band_bucket_cap`` would emit O(n²) pairs (templated
  tool outputs create such mega-bands); they are demoted to STAR pairs around
  the bucket-min member — O(n) edges that keep the bucket connected for the
  verify+CC stage — and counted into the returned overflow metric instead of
  being silently dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dedup.config import DedupConfig


def band_buckets(signatures: DataFrame, cfg: DedupConfig | None = None) -> DataFrame:
    """(conv_id, minhash) → (conv_id, band_id, band_hash) — one row per band.

    Built entirely from JVM expressions: transform+sequence builds the band
    structs, slice cuts the signature, xxhash64 hashes the int array.
    """
    cfg = cfg or DedupConfig()
    r = cfg.lsh_rows
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1)),
        lambda i: F.struct(
            i.cast("int").alias("band_id"),
            F.xxhash64(F.slice(F.col("minhash"), i * r + 1, r)).alias("band_hash"),
        ),
    )
    return signatures.select(
        "conv_id", F.explode(bands).alias("band")
    ).select("conv_id", "band.band_id", "band.band_hash")


def candidate_pairs(
    signatures: DataFrame, cfg: DedupConfig | None = None, materialize: bool = True
) -> tuple[DataFrame, DataFrame]:
    """LSH candidate pairs (conv_a < conv_b, source='lsh') plus a one-row-per
    overflowed-bucket metrics DataFrame (band_id, band_hash, bucket_n).

    ``materialize`` checkpoints the sized bucket table so the pair join and
    the overflow metric read it once instead of re-running the signature
    lineage per consumer (the pair join alone reads it twice).
    """
    cfg = cfg or DedupConfig()
    buckets = band_buckets(signatures, cfg)

    w = Window.partitionBy("band_id", "band_hash")
    sized = buckets.withColumn("bucket_n", F.count(F.lit(1)).over(w)).where(
        F.col("bucket_n") > 1  # singleton buckets can't produce pairs (≈ F3)
    )
    if materialize:
        sized = sized.localCheckpoint()

    small = sized.where(F.col("bucket_n") <= cfg.band_bucket_cap)
    big = sized.where(F.col("bucket_n") > cfg.band_bucket_cap)

    a, b = small.alias("a"), small.alias("b")
    pairs_small = (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("a.conv_id") < F.col("b.conv_id"))
        .select(
            F.col("a.conv_id").alias("conv_a"),
            F.col("b.conv_id").alias("conv_b"),
        )
    )

    # mega-bucket overflow path: star edges around the bucket-min member
    anchor = big.withColumn("anchor", F.min("conv_id").over(w))
    pairs_big = anchor.where(F.col("conv_id") != F.col("anchor")).select(
        F.least("conv_id", "anchor").alias("conv_a"),
        F.greatest("conv_id", "anchor").alias("conv_b"),
    )

    pairs = (
        pairs_small.unionByName(pairs_big)
        .dropDuplicates(["conv_a", "conv_b"])
        .withColumn("source", F.lit("lsh"))
    )
    overflow = (
        big.groupBy("band_id", "band_hash")
        .agg(F.max("bucket_n").alias("bucket_n"))
    )
    return pairs, overflow
