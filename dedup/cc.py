"""Connected components via iterative DataFrame min-label propagation (N7).

Replaces the reference's transitive grouping-by-hashmap-key
(reference: /root/reference/src/server.rs:18 — a DashMap keyed by exact hash
IS the connected components of an equality graph). Near-dup similarity is not
transitive, so the verified-edge graph needs real CC.

Algorithm: every node starts labeled with its own conv_id; each round every
node takes the min of its label and its neighbors' labels; converged when no
label changes. Duplicate clusters are near-cliques (LSH buckets emit dense
edges, mega-buckets emit stars), so the effective diameter is tiny and this
converges in a handful of rounds; ``cc_max_iters`` bounds pathological
chains. ``localCheckpoint`` after every round truncates the lineage so the
plan doesn't grow exponentially (the classic iterative-DataFrame trap).

Returns (conv_id, cluster_id) where cluster_id = min conv_id in the
component — deterministic, unlike the reference's random-seeded hash keys
and nondeterministic DashMap iteration order (src/formatter.rs:45).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cc_loop_width(n_edges: int, parallelism: int) -> int:
    """Shuffle width for the label loop, EDGE-PROPORTIONAL (not a fixed
    fraction of cluster parallelism): the label table is small relative to
    the corpus, so at low edge counts per-round cost is pure shuffle-task
    latency and the loop runs narrow — but a 100×-denser duplicate graph
    must not run its whole loop on a handful of partitions. Width scales
    with the SYMMETRIC adjacency row count (2·edges) at ~250k rows/task,
    clamped to [2, 8×parallelism] (more partitions than cores is fine —
    it bounds per-task memory; fewer than 2 never makes sense)."""
    return max(2, min((2 * n_edges + 250_000 - 1) // 250_000, 8 * parallelism))


def connected_components(
    edges: DataFrame,
    max_iters: int = 25,
    log=None,
    n_edges: int | None = None,
    input_deduped: bool = False,
    loop_conf: bool = False,
    metrics_out: dict | None = None,
) -> DataFrame:
    """edges(conv_a, conv_b) → labels(conv_id, cluster_id).

    ``n_edges``: optional pre-known (deduplicated) edge count — callers that
    already counted the edge table (the pipeline's stage checkpoint) pass it
    so the loop width is sized without an extra job.
    ``input_deduped``: the caller guarantees one row per undirected pair
    (the pipeline's edge stage is unique by construction), skipping the
    defensive dropDuplicates shuffle and the pre-count checkpoint.
    ``loop_conf``: DEPRECATED no-op, kept for signature compatibility. The
    r04 experiment pinned session confs for the loop (AQE off, shuffle
    width = loop width) on the theory that AQE re-planning was the
    per-round latency. Measured head-to-head at sf0.1 / local[8] (227k
    edges, 133k nodes, 2 reps each): AQE-off pinned-width 53.0-60.5s /
    148-204 MB shuffle write / ~349 stages; AQE ON (plain session confs)
    9.3s / 18 MB / 26 stages; AQE-off at width 32 still 59.6s. AQE's
    partition coalescing is what keeps the near-empty label exchanges
    cheap — disabling it was the clusters-stage regression (13→44→56s
    across r03-r05 benches), so the pinning is REMOVED, which also closes
    the r04 advisor note about mutating process-global session confs under
    concurrent driver threads.
    ``metrics_out``: optional dict the loop fills with its bound runtime
    knobs (``cc_loop_width``, ``cc_edges``, ``cc_rounds``) — the caps-audit
    contract (VERDICT r04 #7): every width/cap that binds is reported, so a
    100× run is auditable from its metrics JSON alone.
    """
    from dedup.util import persistent_rdd_ids, unpersist_ids

    spark = edges.sparkSession
    # every frame this loop pins (localCheckpoint/persist) is freed before
    # returning — at the RDD-id level: DataFrame.unpersist() is a no-op for
    # localCheckpoint-ed frames (the cache manager never saw their RDDs), so
    # standalone callers would otherwise leak label blocks for the session
    _pre_ids = persistent_rdd_ids(spark)
    pinned: list[DataFrame] = []

    edges = edges.select("conv_a", "conv_b")
    if not input_deduped:
        edges = edges.dropDuplicates()
    if n_edges is None:
        if not input_deduped:
            edges = edges.localCheckpoint()
            pinned.append(edges)
        n_edges = edges.count()
    cc_parts = cc_loop_width(n_edges, spark.sparkContext.defaultParallelism)
    if metrics_out is not None:
        metrics_out["cc_loop_width"] = cc_parts
        metrics_out["cc_edges"] = n_edges

    return _cc_loop(
        spark, edges, cc_parts, max_iters, log, pinned, _pre_ids, metrics_out
    )


#: propagation hops fused into each convergence-checked round. With the
#: self-loop hop below (one join + one aggregation per hop) a 3-hop round
#: is a shallower plan than the old 2-hop shape (which paid a second join
#: per hop), and 3 hops/round converged sf0.1 in 4 rounds vs 6 — measured
#: r06 at matched spins: 7.3-8.7 s vs 11.6-16.0 s for the old loop, label
#: sets bit-identical. 4 hops/round saved no further rounds.
_HOPS_PER_ROUND = 3


def _cc_loop(spark, edges, cc_parts, max_iters, log, pinned, _pre_ids, metrics_out=None):
    from dedup.util import persistent_rdd_ids, unpersist_ids

    # symmetric adjacency PLUS one self-loop row per node: min(label) over
    # neighbors ∪ self is then ONE join + ONE aggregation per hop. The r05
    # shape needed a second join back to the previous labels (for the self
    # term and the ride-along convergence column); the self-loop row carries
    # both — its label IS the node's own label, and the agg below recovers
    # the node's label0 from it via min(when(conv_b == conv_a, label0)).
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
        .localCheckpoint()
    )
    pinned.append(sym2)

    labels = (
        sym2.select(F.col("conv_b").alias("conv_id"))
        .distinct()
        .select(
            "conv_id",
            F.col("conv_id").alias("label"),
            F.col("conv_id").alias("label0"),
        )
        .localCheckpoint()
    )
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

    # NOTE: a pointer-jumping step (label ← label(label), Shiloach-Vishkin
    # path halving) was measured here and REMOVED: it cut rounds only 5 → 4
    # at sf0.1 (the graph's chains are short) while tripling per-round cost
    # (two extra exchanges + a sort of the label table per round) — net 2×
    # slower. Worth revisiting only if a corpus produces deep chains.

    # label0 rides along so the convergence check needs NO join back to the
    # previous round — `changed` is a plain agg over the stepped frame.
    # (The r05 note about 4-hop rounds paying 15-37 s of AQE planning was
    # measured on the OLD two-join hop; the one-join hop re-measured 2 vs 3
    # vs 4 hops/round in r06 and 3 won — see _HOPS_PER_ROUND.)
    prev_cached = None
    for it in range(max_iters):
        # one Spark job per round: the count() both materializes the
        # persisted frame and measures convergence; localCheckpoint every
        # third round truncates the lineage (per-round plans grow linearly
        # between cuts, which the analyzer tolerates; unbounded growth it
        # does not).
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
        labels = stepped.select(
            "conv_id", "label", F.col("label").alias("label0")
        )
        if log:
            log(f"cc round {it} ({_HOPS_PER_ROUND} hops): {changed} labels changed")
        if changed == 0:
            if metrics_out is not None:
                metrics_out["cc_rounds"] = it + 1
                metrics_out["cc_hops_per_round"] = _HOPS_PER_ROUND
            break
    else:
        raise RuntimeError(f"connected components did not converge in {max_iters} rounds")

    # cut the result loose from every loop-pinned frame, then free them all:
    # the caller gets exactly one pinned frame (its own checkpoint) back.
    # Freeing is RDD-id-level (util.unpersist_ids): df.unpersist() finds
    # persist()-ed frames in the cache manager but NOT localCheckpoint-ed
    # ones, whose RDDs are pinned directly (the r03 advisor leak).
    _loop_ids = persistent_rdd_ids(spark) - _pre_ids
    out = labels.select("conv_id", F.col("label").alias("cluster_id")).localCheckpoint()
    for df in pinned:
        df.unpersist()  # clears cache-manager entries for persist()-ed rounds
    unpersist_ids(spark, _loop_ids)  # frees the localCheckpoint-ed RDDs too
    return out
