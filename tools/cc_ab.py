"""Isolated A/B of connected-components loop variants on the sf0.1 synth
edge table (r06 optimization round; guide §2.4 — remove shuffles outright).

Variant A = dedup.cc.connected_components (current tree).
Variant B = same loop, but the symmetric adjacency is ``persist()``-ed after
``repartition(cc_parts, conv_b).sortWithinPartitions(conv_b)`` instead of
``localCheckpoint()``-ed: an InMemoryTableScan advertises its child's
outputPartitioning/outputOrdering, so every hop's join reuses the adjacency
layout and shuffles ONLY the label side; the localCheckpoint scan reports
UnknownPartitioning and forces a re-exchange + re-sort of the adjacency per
hop (12 per run at 4 rounds × 3 hops — see plans/r06/cc_round_after.txt).

Method: materialize the edge table once (full pipeline to the edges stage,
stage checkpoints on disk), then interleave A/B legs with 1-proc spin
calibration before each leg (host drift correction). Labels must be
bit-identical across variants (count + bit_xor(xxhash64(conv_id||label))).

Usage: PYTHONPATH=/root/repo python tools/cc_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def variant_b(edges, max_iters=25, n_edges=None):
    """Persist-partitioned-adjacency CC loop; must emit labels bit-identical
    to dedup.cc.connected_components."""
    import pyspark
    from pyspark.sql import functions as F

    from dedup.cc import _HOPS_PER_ROUND, cc_loop_width
    from dedup.util import persistent_rdd_ids, unpersist_ids

    spark = edges.sparkSession
    _pre_ids = persistent_rdd_ids(spark)
    pinned = []
    edges = edges.select("conv_a", "conv_b")
    if n_edges is None:
        n_edges = edges.count()
    cc_parts = cc_loop_width(n_edges, spark.sparkContext.defaultParallelism)

    sym2 = (
        edges.unionByName(
            edges.select(
                F.col("conv_b").alias("conv_a"), F.col("conv_a").alias("conv_b")
            )
        )
        .unionByName(
            edges.select(F.col("conv_a").alias("conv_id"))
            .unionByName(edges.select(F.col("conv_b").alias("conv_id")))
            .distinct()
            .select(
                F.col("conv_id").alias("conv_a"), F.col("conv_id").alias("conv_b")
            )
        )
        .repartition(cc_parts, "conv_b")
        .sortWithinPartitions("conv_b")
        .persist(pyspark.StorageLevel.MEMORY_AND_DISK)
    )
    sym2.count()  # materialize the cache
    pinned.append(sym2)

    labels = (
        sym2.select(F.col("conv_b").alias("conv_id"))
        .distinct()
        .select(
            "conv_id",
            F.col("conv_id").alias("label"),
            F.col("conv_id").alias("label0"),
        )
        .persist(pyspark.StorageLevel.MEMORY_AND_DISK)
    )
    labels.count()
    pinned.append(labels)

    def _hop(lbls):
        j = sym2.join(lbls, sym2["conv_b"] == lbls["conv_id"])
        return (
            j.groupBy("conv_a")
            .agg(
                F.min("label").alias("label"),
                F.min(
                    F.when(F.col("conv_b") == F.col("conv_a"), F.col("label0"))
                ).alias("label0"),
            )
            .withColumnRenamed("conv_a", "conv_id")
        )

    prev_cached = None
    rounds = 0
    for it in range(max_iters):
        stepped = labels
        for _ in range(_HOPS_PER_ROUND):
            stepped = _hop(stepped)
        if it % 3 == 2:
            stepped = stepped.localCheckpoint()
        else:
            stepped = stepped.persist()
        pinned.append(stepped)
        changed = stepped.where(F.col("label0") != F.col("label")).count()
        if prev_cached is not None:
            prev_cached.unpersist()
            pinned.remove(prev_cached)
        prev_cached = stepped if it % 3 != 2 else None
        labels = stepped.select("conv_id", "label", F.col("label").alias("label0"))
        if changed == 0:
            rounds = it + 1
            break
    else:
        raise RuntimeError("did not converge")

    _loop_ids = persistent_rdd_ids(spark) - _pre_ids
    out = labels.select(
        "conv_id", F.col("label").alias("cluster_id")
    ).localCheckpoint()
    for df in pinned:
        df.unpersist()
    unpersist_ids(spark, _loop_ids)
    return out, rounds


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pyspark.sql import functions as F

    from bench import sf_of, spin_calibration, synth_corpus_path
    from dedup.cc import connected_components
    from dedup.config import DedupConfig
    from dedup.pipeline import DedupPipeline
    from dedup.session import get_spark
    from dedup.util import unpersist_ids, persistent_rdd_ids

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="cc-ab", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if str(cpus).isdigit() else None,
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_of(sf_dir)
    corpus_path = synth_corpus_path(sf, spark)

    run_dir = f"/tmp/cc_ab_run_sf{sf}"
    edges_path = os.path.join(run_dir, "edges")
    if not os.path.exists(os.path.join(edges_path, "_SUCCESS")):
        turns = spark.read.parquet(corpus_path)
        print("materializing edge table (one pipeline run to the edges stage)...")
        DedupPipeline(
            spark, DedupConfig(), run_dir=run_dir, fused=True, tier_metrics=False
        ).run(turns)
    edges = spark.read.parquet(edges_path).select("conv_a", "conv_b")
    n_edges = edges.count()
    print(f"edges: {n_edges}")

    def fingerprint(lbl):
        row = lbl.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(F.concat_ws("|", "conv_id", "cluster_id"))).alias("fp"),
        ).collect()[0]
        return (row["n"], row["fp"])

    results = {"A": [], "B": []}
    fps = {}
    sc = spark.sparkContext
    for rep in range(reps):
        for name in ("A", "B"):
            spin = spin_calibration(1, dur=2.0)
            sc.setJobDescription(f"cc_ab {name} rep{rep}")
            t0 = time.monotonic()
            if name == "A":
                out = connected_components(
                    edges, 25, n_edges=n_edges, input_deduped=True
                )
                rounds = None
            else:
                out, rounds = variant_b(edges, 25, n_edges=n_edges)
            fp = fingerprint(out)
            wall = time.monotonic() - t0
            sc.setJobDescription(None)
            unpersist_ids(spark, persistent_rdd_ids(spark))
            results[name].append((round(wall, 2), spin))
            fps.setdefault(name, fp)
            print(f"{name} rep{rep}: wall={wall:.2f}s spin1p={spin} fp={fp} rounds={rounds}")
    print("A:", results["A"])
    print("B:", results["B"])
    print("fingerprints equal:", fps.get("A") == fps.get("B"), fps)
    spark.stop()


if __name__ == "__main__":
    main()
