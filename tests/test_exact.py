"""Exact tier tests — each transposes a reference unit test to conversations
(reference tests: /root/reference/src/processor.rs:156-381,
/root/reference/src/fileinfo.rs:83-103; mapping in FIXTURES.md §2)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dedup.assemble import assemble_conversations
from dedup.config import DedupConfig
from dedup.exact import exact_clusters, exact_pairs, prune_singleton_blocks, with_block_key
from dedup.schema import TRANSCRIPTS_SCHEMA

TS = dt.datetime(2024, 1, 1)


def _conv(cid: str, texts: list[str]):
    return [(cid, i, "user", t, "", TS) for i, t in enumerate(texts)]


def _groups(spark, rows, cfg):
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    conv = assemble_conversations(df, cfg)
    clus = exact_clusters(conv, cfg).collect()
    out: dict[str, set[str]] = {}
    for r in clus:
        out.setdefault(r.dup_key, set()).add(r.conv_id)
    return out


def test_identical_convs_one_group(spark):
    """Byte-identical conversations ⇒ 1 group, every mode
    (reference: src/processor.rs:267-311)."""
    texts = ["hello world", "how are you", "fine thanks"]
    rows = _conv("a", texts) + _conv("b", texts)
    for strict in (False, True):
        groups = _groups(spark, rows, DedupConfig(strict=strict))
        assert len(groups) == 1
        assert set(next(iter(groups.values()))) == {"a", "b"}


def test_shared_prefix_fast_vs_strict(spark):
    """Same first-16KiB prefix + different tails ⇒ 1 group in fast mode
    (the documented false positive), 2 hash values & 0 groups in strict
    (reference: src/processor.rs:156-265 pair of tests).

    Same n_turns and total_chars so the pair shares a block; tails differ
    beyond the prefix window.
    """
    prefix = "x" * 20000
    rows = _conv("a", [prefix, "tailAAAA"]) + _conv("b", [prefix, "tailBBBB"])
    fast = _groups(spark, rows, DedupConfig(strict=False))
    assert len(fast) == 1 and set(next(iter(fast.values()))) == {"a", "b"}
    strict = _groups(spark, rows, DedupConfig(strict=True))
    assert strict == {}  # two singleton hash groups ⇒ nothing reported


def test_same_size_different_content_blocks_but_no_group(spark):
    """Equal sizes land in one block, but different content ⇒ no dup group
    (reference: src/processor.rs:313-381)."""
    rows = _conv("a", ["abcdef"]) + _conv("b", ["ghijkl"])
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    conv = assemble_conversations(df)
    blocked = prune_singleton_blocks(with_block_key(conv))
    assert blocked.count() == 2  # same block survives pruning
    assert _groups(spark, rows, DedupConfig()) == {}


def test_singleton_blocks_never_fingerprinted(spark):
    """Distinct sizes ⇒ singleton blocks pruned before hashing
    (reference: src/processor.rs:41-42)."""
    rows = _conv("a", ["x"]) + _conv("b", ["xx"]) + _conv("c", ["xxx"])
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    conv = assemble_conversations(df)
    assert prune_singleton_blocks(with_block_key(conv)).count() == 0


def test_empty_vs_padding_not_grouped(spark):
    """Empty-text conv is excluded by default min-size; a same-turn-count
    whitespace-padded conv never groups with anything else
    (reference: src/fileinfo.rs:83-103 — empty ≠ 4MB of NULs)."""
    rows = _conv("empty", ["", ""]) + _conv("pad", ["  ", "  "])
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    conv = assemble_conversations(df)
    ids = {r.conv_id for r in conv.collect()}
    assert ids == {"pad"}  # empty excluded like the reference's 1b default
    assert _groups(spark, rows, DedupConfig()) == {}


def test_exact_pairs_star_shape(spark):
    texts = ["same conversation text"]
    rows = _conv("a", texts) + _conv("b", texts) + _conv("c", texts)
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    conv = assemble_conversations(df)
    pairs = {(r.conv_a, r.conv_b) for r in exact_pairs(conv).collect()}
    assert pairs == {("a", "b"), ("a", "c")}  # star around min conv_id


def test_synth_exact_dups_found(spark, turns_df, corpus):
    """All planted exact-dup pairs recovered by the exact tier on the synth
    corpus, fast and strict."""
    truth = {
        (a, b)
        for a, b, k in corpus.truth_pairs.itertuples(index=False)
        if k == "exact"
    }
    assert truth, "corpus must plant exact dups"
    conv = assemble_conversations(turns_df)
    for strict in (False, True):
        clus = exact_clusters(conv, DedupConfig(strict=strict))
        groups: dict[str, set[str]] = {}
        for r in clus.collect():
            groups.setdefault(r.dup_key, set()).add(r.conv_id)
        found = set()
        for members in groups.values():
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    found.add((ms[i], ms[j]))
        assert truth <= found
