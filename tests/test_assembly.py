"""N1 assembly: stable turn ordering + the per-turn text-equality invariant
(BASELINE.json input_hint; FIXTURES.md §1 — input rows arrive shuffled)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedup.assemble import assemble_conversations, explode_doc
from dedup.config import DedupConfig


def test_roundtrip_per_turn_text_equality(spark, turns_df, corpus):
    """Assembled docs, re-exploded, must equal the input turns exactly
    under stable turn_idx ordering — for every conversation."""
    conv = assemble_conversations(turns_df)
    exploded = explode_doc(conv)

    # dense turn position per conv (turn_idx is 0..n-1 in synth, so equal)
    orig = turns_df.select(
        "conv_id", F.col("turn_idx").alias("turn_pos"), F.coalesce("text", F.lit("")).alias("text")
    )
    mismatches = (
        exploded.join(orig, ["conv_id", "turn_pos"], "full_outer")
        .where(
            exploded["text"].isNull()
            | orig["text"].isNull()
            | (exploded["text"] != orig["text"])
        )
        .count()
    )
    assert mismatches == 0


def test_counts_and_sizes(turns_df, corpus):
    conv = assemble_conversations(turns_df).collect()
    pdf = corpus.turns
    expected_n = pdf.groupby("conv_id")["turn_idx"].count().to_dict()
    expected_chars = (
        pdf.assign(chars=pdf["text"].str.len()).groupby("conv_id")["chars"].sum().to_dict()
    )
    got = {r.conv_id: (r.n_turns, r.total_chars) for r in conv}
    assert len(got) == len(expected_n)
    for cid, (n, c) in got.items():
        assert n == expected_n[cid], cid
        assert c == expected_chars[cid], cid


def test_tool_include_exclude_compose(spark):
    """include minus exclude — transposes the reference's three scanner
    filter tests (reference: src/scanner.rs:125-259)."""
    import datetime as dt

    rows = [
        ("c1", 0, "user", "a", "js", dt.datetime(2024, 1, 1)),
        ("c1", 1, "tool", "b", "csv", dt.datetime(2024, 1, 1)),
        ("c1", 2, "tool", "c", "rs", dt.datetime(2024, 1, 1)),
        ("c1", 3, "tool", "d", "css", dt.datetime(2024, 1, 1)),
    ]
    from dedup.schema import TRANSCRIPTS_SCHEMA

    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)

    # include only
    cfg = DedupConfig(include_tools=("js", "csv"))
    texts = {r.doc for r in assemble_conversations(df, cfg).collect()}
    assert texts == {"a\x1eb"}

    # exclude only
    cfg = DedupConfig(exclude_tools=("js", "csv"))
    texts = {r.doc for r in assemble_conversations(df, cfg).collect()}
    assert texts == {"c\x1ed"}

    # include minus exclude
    cfg = DedupConfig(include_tools=("js", "csv", "rs"), exclude_tools=("csv",))
    texts = {r.doc for r in assemble_conversations(df, cfg).collect()}
    assert texts == {"a\x1ec"}


def test_min_size_excludes_small(spark):
    import datetime as dt

    from dedup.schema import TRANSCRIPTS_SCHEMA

    rows = [
        ("small", 0, "user", "ab", "", dt.datetime(2024, 1, 1)),
        ("big", 0, "user", "abcdefghij", "", dt.datetime(2024, 1, 1)),
        ("empty", 0, "user", "", "", dt.datetime(2024, 1, 1)),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    # default: empty excluded (reference default min-size 1b, src/params.rs:22)
    ids = {r.conv_id for r in assemble_conversations(df).collect()}
    assert ids == {"small", "big"}
    # threshold straddling (FIXTURES.md min_size)
    ids = {r.conv_id for r in assemble_conversations(df, DedupConfig(min_size=5)).collect()}
    assert ids == {"big"}


def test_turn_idx_bounds(spark):
    import datetime as dt

    from dedup.schema import TRANSCRIPTS_SCHEMA

    rows = [("c", i, "user", f"t{i}", "", dt.datetime(2024, 1, 1)) for i in range(6)]
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    cfg = DedupConfig(min_turn_idx=2, max_turn_idx=4)
    doc = assemble_conversations(df, cfg).collect()[0].doc
    assert doc == "t2\x1et3\x1et4"
