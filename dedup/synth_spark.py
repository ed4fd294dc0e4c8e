"""Distributed deterministic transcript-corpus generator (bench scale).

The pandas generator (synth.py) is fine for unit-test corpora but takes
minutes beyond ~10^5 conversations. This one builds the same *shape* of
corpus — Zipf-ish turn counts, planted exact/near/span duplicates — entirely
from Spark expressions seeded by xxhash64, so a 10^6-conversation corpus
generates in seconds across all cores and the same recipe would generate the
10^12-turn corpus on a real cluster. Determinism: every value derives from
(conv_seq, turn_idx, word_idx, salt) hashes — no RNG state anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_VOCAB = (
    "the a of to and in for on with query table scan join filter sort merge "
    "group window hash key row batch value spark data slow fast small large "
    "order part line customer supplier region nation event token turn agent "
    "tool call result error retry plan step think answer user system context "
    "model run code test file read write open close send receive parse format "
    "index cache block shard shuffle stage task node cluster driver executor "
    "memory disk net time date stamp count sum min max avg first last prev next"
).split()

_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = ["", "js", "css", "csv", "rs", "sql", "py"]


def _h(*cols) -> Column:
    return F.xxhash64(*[c if isinstance(c, Column) else F.lit(c) for c in cols])


def _pick(arr: list[str], *salt) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in arr])
    return F.element_at(lit_arr, (F.pmod(_h(*salt), F.lit(len(arr))) + 1).cast("int"))


def _turn_text(seq: Column, turn: Column, n_words: Column, salt: str) -> Column:
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda j: _pick(_VOCAB, seq, turn, j, salt),
    )
    return F.array_join(words, " ")


def generate_transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    exact_dup_rate_mod: int = 10,
    near_dup_rate_mod: int = 9,
    span_rate_mod: int = 17,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) with planted
    duplicates: every ``exact_dup_rate_mod``-th conversation gets an exact
    copy (<id>_xd), every ``near_dup_rate_mod``-th a ~2%-word-edited copy
    (<id>_nd), every ``span_rate_mod``-th a span partner (<id>_sp) sharing
    one long turn."""
    base = spark.range(n_convs).select(F.col("id").alias("seq"))
    n_turns = (F.pmod(_h(F.col("seq"), seed, "nt"), F.lit(23)) + 2).cast("int")

    def expand(df, conv_id_expr, edit: bool, variant: str):
        t = df.select(
            "seq",
            conv_id_expr.alias("conv_id"),
            F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
        )
        seqc, turn = F.col("seq"), F.col("turn_idx")
        n_words = (F.pmod(_h(seqc, turn, seed, "nw"), F.lit(56)) + 5).cast("int")
        if not edit:
            text = _turn_text(seqc, turn, n_words, f"w{seed}")
        else:
            # ~2% of word slots re-drawn from an independent hash stream
            words = F.transform(
                F.sequence(F.lit(0), n_words - 1),
                lambda j: F.when(
                    F.pmod(_h(seqc, turn, j, seed, "edit?"), F.lit(50)) == 0,
                    _pick(_VOCAB, seqc, turn, j, f"edited{seed}"),
                ).otherwise(_pick(_VOCAB, seqc, turn, j, f"w{seed}")),
            )
            text = F.array_join(words, " ")
        return t.select(
            "conv_id",
            turn.cast("int").alias("turn_idx"),
            _pick(_ROLES, turn, "role").alias("role"),
            text.alias("text"),
            _pick(_TOOLS, seqc, turn, "tool").alias("tool"),
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=(seqc * 1000 + turn * 7 + F.lit(len(variant))))
            ).alias("ts"),
        )

    cid = F.format_string("c%08d", F.col("seq"))
    out = expand(base, cid, edit=False, variant="")
    out = out.unionByName(
        expand(
            base.where(F.col("seq") % exact_dup_rate_mod == 0),
            F.concat(cid, F.lit("_xd")),
            edit=False,
            variant="x",
        )
    )
    out = out.unionByName(
        expand(
            base.where(F.col("seq") % near_dup_rate_mod == 0),
            F.concat(cid, F.lit("_nd")),
            edit=True,
            variant="n",
        )
    )

    # span partners: base conv <seq> gets an appended mega-turn; partner
    # conv (3 short turns + the same mega-turn) shares only that span.
    span_base = base.where(F.col("seq") % span_rate_mod == 0)
    seqc = F.col("seq")
    span_text = _turn_text(seqc, F.lit(-1), F.lit(900), f"span{seed}")
    extra = span_base.select(
        F.concat(cid, F.lit("_spa")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("tool").alias("role"),
        span_text.alias("text"),
        F.lit("").alias("tool"),
        F.lit("2024-02-01 00:00:00").cast("timestamp").alias("ts"),
    )
    partner_turns = span_base.select(
        "seq", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("turn_idx")
    ).select(
        F.concat(F.format_string("c%08d", F.col("seq")), F.lit("_sp")).alias("conv_id"),
        F.col("turn_idx").cast("int"),
        F.lit("user").alias("role"),
        F.when(
            F.col("turn_idx") < 3,
            _turn_text(F.col("seq"), F.col("turn_idx"), F.lit(30), f"sp{seed}"),
        ).otherwise(_turn_text(F.col("seq"), F.lit(-1), F.lit(900), f"span{seed}")).alias("text"),
        F.lit("").alias("tool"),
        F.lit("2024-02-02 00:00:00").cast("timestamp").alias("ts"),
    )
    return out.unionByName(extra).unionByName(partner_turns)


def write_bench_corpus(spark: SparkSession, path: str, n_convs: int, seed: int = 42) -> None:
    df = generate_transcripts(spark, n_convs, seed)
    df.repartition(spark.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(path)
