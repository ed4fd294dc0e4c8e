"""Full pipeline orchestration: all tiers fused, keep policy, checkpoint
resume (FIXTURES.md ``keep_policy`` and ``resume``)."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest

from dedup.config import DedupConfig
from dedup.keep import apply_delete_rewrite, duplicate_report, losers
from dedup.pipeline import DedupPipeline
from dedup.schema import TRANSCRIPTS_SCHEMA


def _cluster_map(result):
    return {
        r.conv_id: (r.cluster_id, r.is_representative)
        for r in result.clusters.collect()
    }


@pytest.fixture(scope="module")
def pipeline_run(spark, turns_df):
    pipe = DedupPipeline(spark, DedupConfig())
    return pipe.run(turns_df)


def test_pipeline_finds_all_planted_kinds(pipeline_run, corpus):
    lab = {k: v[0] for k, v in _cluster_map(pipeline_run).items()}
    tp = corpus.truth_pairs
    for kind in ("exact", "near", "span"):
        pairs = tp[tp.kind == kind]
        hit = sum(
            1
            for a, b, _ in pairs.itertuples(index=False)
            if lab.get(a) is not None and lab.get(a) == lab.get(b)
        )
        assert hit / len(pairs) >= 0.99, f"{kind}: {hit}/{len(pairs)}"
    # no false merges of same-size pairs
    for a, b, _ in tp[tp.kind == "same_size"].itertuples(index=False):
        assert lab.get(a) is None or lab.get(a) != lab.get(b)


def test_keep_policy_oldest(pipeline_run, corpus):
    """Representative = oldest first_ts (planted originals predate copies)."""
    m = _cluster_map(pipeline_run)
    tp = corpus.truth_pairs
    for a, b, kind in tp[tp.kind == "exact"].itertuples(index=False):
        orig, copy = (a, b) if not a.endswith("_xd") else (b, a)
        assert m[orig][1] is True, orig
        assert m[copy][1] is False, copy


def test_delete_rewrite(spark, turns_df, pipeline_run):
    """Anti-join rewrite drops exactly the losers' turns (S10)."""
    lose = losers(pipeline_run.clusters)
    n_losers = lose.count()
    assert n_losers > 0
    kept = apply_delete_rewrite(turns_df, lose)
    remaining_ids = {r.conv_id for r in kept.select("conv_id").distinct().collect()}
    loser_ids = {r.conv_id for r in lose.collect()}
    assert remaining_ids.isdisjoint(loser_ids)
    all_ids = {r.conv_id for r in turns_df.select("conv_id").distinct().collect()}
    assert remaining_ids == all_ids - loser_ids


def test_report_deterministic_order(pipeline_run):
    rep = duplicate_report(pipeline_run.clusters).collect()
    keys = [(r.cluster_id, r.conv_id) for r in rep]
    assert keys == sorted(keys)


def test_checkpoint_resume_byte_identical(spark, turns_df, tmp_path_factory):
    """Run with a run_dir, wipe the LAST stage only, re-run: early stages
    resume from checkpoint, final clusters identical (FIXTURES.md resume)."""
    run_dir = str(tmp_path_factory.mktemp("run"))
    cfg = DedupConfig()
    r1 = DedupPipeline(spark, cfg, run_dir=run_dir).run(turns_df)
    first = sorted(
        (r.conv_id, r.cluster_id, r.is_representative) for r in r1.clusters.collect()
    )
    assert not any(s.resumed for s in r1.stages)

    # simulate a crash after 'pairs': wipe edges+clusters, re-run
    shutil.rmtree(f"{run_dir}/edges")
    shutil.rmtree(f"{run_dir}/clusters")
    r2 = DedupPipeline(spark, cfg, run_dir=run_dir).run(turns_df)
    resumed = {s.name for s in r2.stages if s.resumed}
    assert {"conversations", "signatures", "pairs"} <= resumed
    second = sorted(
        (r.conv_id, r.cluster_id, r.is_representative) for r in r2.clusters.collect()
    )
    assert first == second


def test_fused_run_identical_clusters(spark, turns_df, pipeline_run):
    """fused=True (no tier-internal checkpoints, deferred tier metrics)
    must produce byte-identical cluster assignments."""
    fused = DedupPipeline(
        spark, DedupConfig(), fused=True, tier_metrics=False
    ).run(turns_df)
    assert _cluster_map(fused) == _cluster_map(pipeline_run)
    assert "tier_metrics_skipped" in fused.metrics


def test_full_resume_runs_no_eager_tier_work(spark, turns_df, tmp_path):
    """Resuming a fully-materialized run must not construct the tier
    kernels: their eager localCheckpoints (bucket stats, simhash table,
    span anchors) would otherwise recompute tier work the parquet stages
    already hold. Detectable as zero new persistent RDDs across the
    resumed run."""
    from dedup.config import DedupConfig
    from dedup.pipeline import DedupPipeline
    from dedup.util import persistent_rdd_ids

    run_dir = str(tmp_path / "resume_run")
    DedupPipeline(spark, DedupConfig(), run_dir=run_dir).run(turns_df)
    pre = persistent_rdd_ids(spark)
    res2 = DedupPipeline(spark, DedupConfig(), run_dir=run_dir).run(turns_df)
    assert all(s.resumed for s in res2.stages), res2.stages
    assert persistent_rdd_ids(spark) == pre
