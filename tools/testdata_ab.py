"""A/B: the unfused pipeline's simhash turn-pair checkpoint (r06, guide §5
caching rule — checkpoint only what has >1 consumer or expensive lineage).

In the UNFUSED pipeline (`pipeline_testdata`'s accounting path) the simhash
turn-pair table is localCheckpoint'ed (`simhash_conv_pairs(materialize=True)`)
although it has exactly ONE consumer (the per-pair coverage aggregation) and
its expensive inputs (the turn-simhash table, the fp stats tables) are
already checkpointed — the fused path already runs with materialize=False.

Method: interleave A (materialize=True, current) / B (False) full unfused
pipeline runs over the driver-testdata-derived transcripts, 1-proc spin
before each leg, cluster-table fingerprint compared across variants.

Usage: PYTHONPATH=/root/repo python tools/testdata_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from unittest import mock

    from pyspark.sql import functions as F

    import dedup.pipeline as pl
    from bench import spin_calibration
    from dedup.config import DedupConfig
    from dedup.driver_tables import derive_transcripts
    from dedup.session import get_spark
    from dedup.simhash import simhash_conv_pairs
    from dedup.util import persistent_rdd_ids, unpersist_ids

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="testdata-ab", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if str(cpus).isdigit() else None,
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dturns = derive_transcripts(spark, sf_dir).localCheckpoint()
    print(f"turns: {dturns.count()}")
    _keep = persistent_rdd_ids(spark)  # never free the input's blocks

    def no_tp_ckpt(sh, cfg, materialize=True, return_overflow=False):
        return simhash_conv_pairs(
            sh, cfg, materialize=False, return_overflow=return_overflow
        )

    def fingerprint(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(F.concat_ws("|", "conv_id", "cluster_id"))).alias("fp"),
        ).collect()[0]
        return (row["n"], row["fp"])

    results = {"A": [], "B": []}
    fps = {}
    for rep in range(reps):
        for name in ("A", "B"):
            spin = spin_calibration(1, dur=2.0)
            ctx = (
                mock.patch.object(pl, "simhash_conv_pairs", no_tp_ckpt)
                if name == "B"
                else mock.patch.object(pl, "simhash_conv_pairs", simhash_conv_pairs)
            )
            t0 = time.monotonic()
            with ctx:
                res = pl.DedupPipeline(spark, DedupConfig(min_span_len=150)).run(dturns)
                res.clusters.write.format("noop").mode("overwrite").save()
                fp = fingerprint(res.clusters.select("conv_id", "cluster_id"))
            wall = time.monotonic() - t0
            unpersist_ids(spark, persistent_rdd_ids(spark) - _keep)
            results[name].append((round(wall, 2), spin))
            fps.setdefault(name, fp)
            print(f"{name} rep{rep}: wall={wall:.2f}s spin1p={spin} fp={fp}", flush=True)
    print("A (ckpt):   ", results["A"])
    print("B (no ckpt):", results["B"])
    print("fingerprints equal:", fps.get("A") == fps.get("B"), fps)
    spark.stop()


if __name__ == "__main__":
    main()
