"""Physical-plan quality gates: the properties that make this design hold at
100 TB must be visible in .explain() output, not just asserted in prose.

- turn-level predicates reach the parquet scan (PushedFilters);
- column pruning: the scan reads only referenced columns (ReadSchema);
- the delete rewrite broadcasts the small loser set;
- the exact tier stays inside WholeStageCodegen (no Python in the hot path).
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from dedup.assemble import assemble_conversations
from dedup.config import DedupConfig
from dedup.exact import exact_clusters
from dedup.keep import apply_delete_rewrite


@pytest.fixture(scope="module")
def turns_parquet(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "turns")
    from dedup.schema import TRANSCRIPTS_SCHEMA
    from dedup.synth import corpus_to_spark

    corpus_to_spark(spark, corpus).write.mode("overwrite").parquet(path)
    return path


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_tool_filter_pushed_to_scan(spark, turns_parquet):
    turns = spark.read.parquet(turns_parquet)
    cfg = DedupConfig(include_tools=("js", "csv"), min_turn_idx=1)
    plan = _plan(assemble_conversations(turns, cfg))
    assert "PushedFilters" in plan
    # tool-IN and turn_idx bounds must appear among the pushed filters
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "tool" in pushed and "turn_idx" in pushed, pushed


def test_column_pruning_at_scan(spark, turns_parquet):
    turns = spark.read.parquet(turns_parquet)
    # a query touching only conv_id+turn_idx must not read text/ts/role/tool
    q = turns.groupBy("conv_id").agg(F.max("turn_idx").alias("max_turn"))
    plan = _plan(q)
    sched = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "conv_id" in sched and "turn_idx" in sched
    for col in ("text", "role", "tool", "ts"):
        assert col not in sched, (col, sched)


def test_delete_rewrite_uses_broadcast(spark, turns_parquet):
    turns = spark.read.parquet(turns_parquet)
    losers = spark.createDataFrame([("c00000001",)], ["conv_id"])
    plan = _plan(apply_delete_rewrite(turns, losers))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_exact_tier_is_codegen_only(spark, turns_parquet):
    """The exact tier must contain zero Python evals — pure JVM codegen +
    window aggregation."""
    turns = spark.read.parquet(turns_parquet)
    conv = assemble_conversations(turns)
    df = exact_clusters(conv, DedupConfig(strict=True))
    plan = _plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, marker
    # AQE hides codegen subtrees until runtime — inspect the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        codegen = _plan(exact_clusters(conv, DedupConfig(strict=True)), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in codegen and "Found 0" not in codegen


def test_lsh_banding_is_jvm_side(spark):
    """Band explode + band hashing must not invoke Python — only the
    signature UDF itself is Python."""
    from dedup.lsh import band_buckets

    sigs = spark.createDataFrame(
        [("a", list(range(128)))], "conv_id string, minhash array<int>"
    )
    plan = _plan(band_buckets(sigs))
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker


def test_winnowing_is_jvm_side(spark):
    """Winnowing must stay in codegen: md5 + window min, no Python eval."""
    from dedup.textfns import winnow_fingerprints

    docs = spark.createDataFrame([(1, "abc def ghi " * 40)], "doc_id long, text string")
    plan = _plan(winnow_fingerprints(docs))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_axis_lsh_neardup_is_jvm_side_no_cartesian(spark):
    """Axis-sign bucketed embedding near-dup: no Python eval, no all-pairs
    operator — the plan a 100 TB corpus needs."""
    from dedup.similarity import embedding_neardup_pairs

    emb = spark.createDataFrame(
        [(i, [float(i % 3) - 1.0] * 8) for i in range(20)], "vec_id long, v array<double>"
    )
    plan = _plan(embedding_neardup_pairs(emb, threshold=0.9, mode="lsh", dim=8))
    for bad in ("ArrowEvalPython", "BatchEvalPython", "CartesianProduct", "NestedLoopJoin"):
        assert bad not in plan, (bad, plan)


def test_md5_simhash_is_jvm_side(spark):
    """The SQL-mirrorable SimHash variant is pure JVM expressions."""
    from dedup.simhash import with_turn_simhash_md5

    turns = spark.createDataFrame(
        [("a", 0, "user", "hello world " * 10, "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    plan = _plan(with_turn_simhash_md5(turns))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_exact_tier_counts_deskewed_no_window(spark, turns_parquet):
    """VERDICT r03 #4: the multi-member filters and group-min anchors run as
    partial-aggregable HashAggregates + joins, NOT window functions — AQE
    can split a skewed join partition but never a window partition, so one
    10^7-copy template must not serialize into a single window task."""
    from dedup.exact import exact_pairs
    from dedup.multimodal import media_exact_dups

    turns = spark.read.parquet(turns_parquet)
    conv = assemble_conversations(turns)
    plan = _plan(exact_pairs(conv, DedupConfig(strict=True)))
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan

    feats = spark.createDataFrame(
        [(1, "image", 3, "h1"), (2, "image", 3, "h1")],
        "media_id long, kind string, n_bytes long, content_hash string",
    )
    mplan = _plan(media_exact_dups(feats))
    assert "Window" not in mplan, mplan


def test_keep_policy_deskewed_no_window(spark, turns_parquet):
    """VERDICT r04 #3: select_representatives is a groupBy-min(key struct)
    joined back, NOT a window over cluster_id — the keep policy runs over
    the SAME mega-clusters the exact tier produces (a 10^7-copy template is
    one cluster by construction), so a cluster_id window would serialize
    each mega-cluster into one unsplittable task."""
    from dedup.keep import select_representatives

    turns = spark.read.parquet(turns_parquet)
    conv = assemble_conversations(turns)
    clusters = conv.select("conv_id").withColumn(
        "cluster_id", F.lit("c0")
    )  # one mega-cluster: worst case
    for policy in ("oldest", "newest", "longest", "first_id"):
        plan = _plan(select_representatives(clusters, conv, policy))
        assert "Window" not in plan, (policy, plan)
        assert "HashAggregate" in plan, (policy, plan)
