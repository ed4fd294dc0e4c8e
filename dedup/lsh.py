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

from pyspark.sql import DataFrame
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


def bucketed_pairs(
    rows: DataFrame,
    bucket_cols: list[str],
    member_cols: list[str],
    cap: int,
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """ONE-SHUFFLE candidate pairing, shared by the LSH and SimHash tiers.

    groupBy(bucket) → sorted member-struct array → pair explosion:
    - buckets ≤ ``cap`` members emit all pairs — via posexplode + slice, so
      the explosion is row-per-member (each row carries one array copy,
      ~bytes-per-member × bucket size), never one s² array;
    - bigger buckets emit O(s) STAR edges around the sort-min member and a
      row in the overflow metric — never silently dropped.

    Replaces the window-count + self-join formulation, whose physical plan
    computed the banded table THREE times (two join sides + the anchor
    path), each with its own exchange and sort — measured 3× slower at
    sf0.1. Memory bound: one bucket's member array per aggregation row;
    identical-boilerplate buckets are bounded by the template's copy count
    (a 10⁶-copy template ⇒ ~tens of MB per array — acceptable; the
    window formulation is the fallback if a corpus ever breaks this).

    Returns (pairs(a: struct, b: struct), overflow(bucket_cols, bucket_n)),
    with a < b in member-struct order (first member column ascending).
    """
    m = F.struct(*[F.col(c) for c in member_cols])
    agg = (
        rows.groupBy(*bucket_cols)
        .agg(F.sort_array(F.collect_list(m)).alias("ms"))
        .withColumn("s", F.size("ms"))
        .where(F.col("s") > 1)  # singleton buckets can't pair (≈ F3)
    )
    if materialize:
        agg = agg.localCheckpoint()
    small = agg.where(F.col("s") <= cap)
    big = agg.where(F.col("s") > cap)
    pairs_small = small.select(
        F.posexplode("ms").alias("i", "a"), "ms", "s"
    ).select("a", F.explode(F.expr("slice(ms, i + 2, s)")).alias("b"))
    pairs_big = big.select(
        F.col("ms").getItem(0).alias("a"),
        F.explode(F.expr("slice(ms, 2, s - 1)")).alias("b"),
    )
    overflow = big.select(*bucket_cols, F.col("s").alias("bucket_n"))
    return pairs_small.unionByName(pairs_big), overflow


def candidate_pairs(
    signatures: DataFrame, cfg: DedupConfig | None = None, materialize: bool = True
) -> tuple[DataFrame, DataFrame]:
    """LSH candidate pairs (conv_a < conv_b, source='lsh') plus a one-row-per
    overflowed-bucket metrics DataFrame (band_id, band_hash, bucket_n).

    ``materialize`` checkpoints the per-bucket member table so the pair
    explosion and the overflow metric read one computation of the banding.
    """
    cfg = cfg or DedupConfig()
    buckets = band_buckets(signatures, cfg)
    raw, overflow = bucketed_pairs(
        buckets,
        ["band_id", "band_hash"],
        ["conv_id"],
        cfg.band_bucket_cap,
        materialize=materialize,
    )
    pairs = (
        raw.select(
            F.col("a.conv_id").alias("conv_a"), F.col("b.conv_id").alias("conv_b")
        )
        .dropDuplicates(["conv_a", "conv_b"])
        .withColumn("source", F.lit("lsh"))
    )
    return pairs, overflow
