"""THE recall gate (BASELINE.md): the Spark pipeline must recover ≥ 0.99 of
the duplicate pairs the reference implementation would report on the same
corpus, at the same config, in both fast and strict modes."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedup.assemble import assemble_conversations
from dedup.config import DedupConfig
from dedup.pipeline import DedupPipeline
from tests.reference_oracle import groups_to_pairs, reference_duplicate_groups


def _assembled_docs(turns_df):
    conv = assemble_conversations(turns_df)
    return {r.conv_id: (r.n_turns, r.doc) for r in conv.collect()}


def _pipeline_pairs(spark, turns_df, cfg):
    res = DedupPipeline(spark, cfg).run(turns_df)
    clusters: dict[str, list[str]] = {}
    for r in res.clusters.collect():
        clusters.setdefault(r.cluster_id, []).append(r.conv_id)
    pairs = set()
    for members in clusters.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def test_recall_vs_reference_fast_and_strict(spark, turns_df):
    docs = _assembled_docs(turns_df)
    for strict in (False, True):
        ref_pairs = groups_to_pairs(
            reference_duplicate_groups(docs, strict=strict)
        )
        assert ref_pairs, "oracle must find planted duplicates"
        got = _pipeline_pairs(spark, turns_df, DedupConfig(strict=strict))
        missed = ref_pairs - got
        recall = 1 - len(missed) / len(ref_pairs)
        assert recall >= 0.99, f"strict={strict}: recall {recall}, missed {sorted(missed)[:5]}"


def test_reference_oracle_sanity(corpus):
    """The oracle itself finds exactly the planted exact dups (plus the
    prefix pair in fast mode) on the synth corpus."""
    pdf = corpus.turns
    docs = {}
    for cid, grp in pdf.groupby("conv_id"):
        g = grp.sort_values("turn_idx")
        docs[cid] = (len(g), "\x1e".join(g.text))
    strict_pairs = groups_to_pairs(reference_duplicate_groups(docs, strict=True))
    truth_exact = {
        (a, b) for a, b, k in corpus.truth_pairs.itertuples(index=False) if k == "exact"
    }
    assert truth_exact <= strict_pairs
    fast_pairs = groups_to_pairs(reference_duplicate_groups(docs, strict=False))
    assert strict_pairs <= fast_pairs
