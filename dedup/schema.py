"""Schemas for the transcript corpus and every derived table.

The input table shape is mandated by BASELINE.json ``input_hint``:
``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``. Relationally it plays the role of the
reference's implicit ``files(path, size, modified)`` table
(reference: /root/reference/src/fileinfo.rs:18-24).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Unit separator used to join turns into one document. Chosen outside the
#: printable range so round-tripping (doc → split → turns) is lossless for
#: any text that does not itself contain \x1e; synth.py guarantees that and
#: assembly strips it defensively from real input.
TURN_SEP = "\x1e"

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: conversations ≈ FileInfo (path→conv_id, size→(n_turns,total_chars),
#: modified→first_ts/last_ts); reference: src/fileinfo.rs:18-24.
CONVERSATIONS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.IntegerType(), False),
        T.StructField("total_chars", T.LongType(), False),
        T.StructField("first_ts", T.TimestampType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
        T.StructField("doc", T.StringType(), False),
    ]
)

SIGNATURES_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("block_key", T.LongType(), False),
        T.StructField("prefix_hash", T.StringType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("minhash", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("simhash", T.LongType(), False),
    ]
)

CANDIDATE_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("conv_a", T.StringType(), False),
        T.StructField("conv_b", T.StringType(), False),
        T.StructField("source", T.StringType(), False),  # lsh|simhash|span|exact
    ]
)

CLUSTERS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), False),
        T.StructField("is_representative", T.BooleanType(), False),
    ]
)
