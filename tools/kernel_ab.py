"""Per-tier pair-kernel A/B on recorded SHUFFLE BYTES, not walls
(VERDICT r04 #2). The ``stats`` kernel is the current default on BOTH
tiers (``DedupConfig.pairs_kernel``, flipped in r05 on this tool's
recorded bytes + walls); the tool remains the way to re-decide per tier.

Walls on this shared-hypervisor box swing 3× between identical runs
(BENCH/BASELINE.md r04 addendum: stats 218.3s/64.9s, counts 92.5s/139.3s),
so the counts-vs-stats choice must be decided by a quantity the
hypervisor cannot touch: the bytes each kernel actually exchanges.
Spark's AppStatusStore records per-stage shuffle read/write bytes
deterministically for a fixed plan + input; this tool runs BOTH kernels
on the same source table in one session and prints one JSON line with
each kernel's shuffle write/read bytes (and its wall, for context only).

Usage: PYTHONPATH=/root/repo python tools/kernel_ab.py [sf] [tier]
``tier`` is ``lsh`` (default) or ``simhash`` — the two pair kernels carry
different member structs (conv_id vs (conv_id, turn_idx)+simhash keys), so
each tier's default is decided by ITS OWN recorded bytes.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    tier = sys.argv[2] if len(sys.argv) > 2 else "lsh"
    import bench
    from dedup.assemble import assemble_conversations
    from dedup.config import DedupConfig
    from dedup.lsh import candidate_pairs
    from dedup.minhash import with_minhash
    from dedup.session import get_spark
    from dedup.simhash import simhash_conv_pairs, with_turn_simhash
    from dedup.util import (
        persistent_rdd_ids,
        shuffle_delta,
        shuffle_totals,
        unpersist_ids,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="kernel-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else None,
    )
    corpus = bench.synth_corpus_path(sf, spark)
    turns = spark.read.parquet(corpus)
    conv = assemble_conversations(turns).localCheckpoint()
    if tier == "simhash":
        source = (
            with_turn_simhash(turns, DedupConfig())
            .select("conv_id", "turn_idx", "simhash")
            .localCheckpoint()
        )
    else:
        source = with_minhash(conv).select("conv_id", "minhash").localCheckpoint()
    n_rows = source.count()
    base_ids = persistent_rdd_ids(spark)  # keep conv/source checkpoints alive

    out: dict = {
        "metric": f"{tier}_pair_kernel_ab", "sf": sf, "cpus": cpus, "n_rows": n_rows
    }
    for kernel in ("counts", "stats", "counts", "stats"):  # 2 reps each
        kcfg = DedupConfig(pairs_kernel=kernel)
        before = shuffle_totals(spark)
        t0 = time.monotonic()
        if tier == "simhash":
            pairs = simhash_conv_pairs(source, kcfg, materialize=True)
        else:
            pairs, _ = candidate_pairs(source, kcfg)
        pairs.write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        delta = shuffle_delta(before, shuffle_totals(spark))
        unpersist_ids(spark, persistent_rdd_ids(spark) - base_ids)
        rec = out.setdefault(kernel, [])
        rec.append(
            {
                "shuffle_write_bytes": delta.get("shuffle_write_bytes"),
                "shuffle_read_bytes": delta.get("shuffle_read_bytes"),
                "n_stages": delta.get("n_stages"),
                "wall_sec": round(wall, 2),
                "spin_np": bench.spin_calibration(
                    int(cpus) if cpus.isdigit() else 8
                ),
            }
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
