"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

Everything except the winnowing fingerprint is pure JVM expressions
(whole-stage codegen; no Python on the hot path) and therefore also
expressible as DuckDB oracle SQL. The fingerprint reuses the seeded
rolling-hash machinery from the MinHash tier.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: tiny per-language stopword marker sets (deterministic heuristic)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
}


def tokens_expr(col: Column) -> Column:
    return F.split(F.lower(col), " ", -1)


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(col, " ", -1)).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-flavored token estimate: alpha runs, digits, and punctuation
    each count as one token (a crude GPT-2-style pre-tokenizer)."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0)
    ).cast("long")


def stopword_hits(col: Column, words: list[str]) -> Column:
    """Occurrences (with repeats) of marker words among the tokens."""
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens_expr(col), lambda t: F.array_contains(lit_arr, t)))


def lang_scores(col: Column) -> dict[str, Column]:
    n_tok = token_count(col).cast("double")
    return {
        lang: (stopword_hits(col, words) / n_tok)
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """Deterministic argmax over stopword-ratio scores; 'und' if all zero.
    Ties break by language name order (stable)."""
    scores = lang_scores(col)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_max(F.filter(pairs, lambda p: p.score > 0))
    return F.when(best.isNull(), F.lit("und")).otherwise(best.lang)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: penalize extreme length, high
    punctuation density, and low stopword density."""
    n = F.length(col).cast("double")
    punct = (n - F.length(F.regexp_replace(col, r"[^A-Za-z0-9\s]", ""))) / n
    stop = stopword_hits(col, LANG_MARKERS["en"]).cast("double") / token_count(col)
    len_ok = F.when((n >= 100) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        len_ok * (F.lit(1.0) - F.least(punct * 2, F.lit(1.0))) * F.least(stop * 5 + 0.5, F.lit(1.0)),
        6,
    )


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return docs.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        lang_id(c).alias("lang_pred"),
        quality_score(c).alias("quality"),
    )


def make_fingerprint_udf(w: int = 32, n_keep: int = 8):
    """BOTTOM-K SKETCH document fingerprint: the n_keep smallest mixed
    rolling-hash values of w-char windows. This is a resemblance estimator
    (like one-permutation MinHash), NOT winnowing — it has no positional
    coverage, so it cannot detect containment; use ``winnow_fingerprints``
    for that."""
    from dedup.minhash import py_normalize, shingle_hashes

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fingerprint_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            h = shingle_hashes(py_normalize(t or ""), w)  # unique + sorted
            out.append(h[:n_keep].astype(np.int64))
        return pd.Series(out)

    return fingerprint_udf


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    w: int = 8,
) -> DataFrame:
    """Real winnowing (Schleimer/Wilkerson/Aiken, MOSS): hash every k-char
    gram of the normalized text, slide a window of ``w`` consecutive gram
    hashes, keep each window's minimum — ties broken toward the smallest
    position by suffixing the zero-padded position to the hash, making the
    per-window key unique. Distinct selected (position, hash) rows are the
    fingerprint set.

    Guarantee: any shared substring of length ≥ k + w - 1 yields at least
    one shared fingerprint hash — positional coverage, which is what makes
    the sketch detect CONTAINMENT (doc-inside-doc), not just resemblance.

    Entirely JVM expressions (md5 per gram + one window min — no Python),
    and bit-for-bit mirrorable in DuckDB SQL (the driver oracle). Tail
    windows are clipped (ROWS BETWEEN CURRENT AND w-1 FOLLOWING shrinks at
    the end) identically in both engines; docs shorter than k contribute
    one whole-text gram, so every doc has ≥ 1 fingerprint.

    Returns (id_col, pos, fp_hash).
    """
    from pyspark.sql import Window

    from dedup.minhash import NORM_PATTERN

    nd = F.regexp_replace(F.lower(F.col(text_col)), NORM_PATTERN, " ")
    grams = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("nd") - F.lit(k - 1), F.lit(1))),
            lambda i: F.struct(
                i.alias("pos"), F.col("nd").substr(i, F.lit(k)).alias("g")
            ),
        )
    )
    keyed = (
        docs.select(id_col, nd.alias("nd"))
        .select(id_col, grams.alias("gp"))
        .select(
            id_col,
            F.col("gp.pos").alias("pos"),
            F.concat(
                F.md5("gp.g"), F.lpad(F.col("gp.pos").cast("string"), 10, "0")
            ).alias("key"),
        )
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        keyed.withColumn("winner", F.min("key").over(win))
        .select(
            id_col,
            F.substring("winner", 33, 10).cast("int").alias("pos"),
            F.substring("winner", 1, 32).alias("fp_hash"),
        )
        .dropDuplicates([id_col, "pos"])
    )


def winnow_fingerprints_np(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    w: int = 8,
) -> DataFrame:
    """Production twin of ``winnow_fingerprints``: same winnowing semantics
    (per-window minimum over k-gram hashes, leftmost tie-break, positional
    coverage ⇒ any shared substring of length ≥ k + w - 1 shares a
    fingerprint) computed in ONE Arrow-batched pandas pass with the seeded
    rolling-hash kernel — no per-character explode, no per-doc window sort.

    The JVM/md5 variant shuffles ~one row per document CHARACTER through a
    window sort (fine at oracle scale, ruinous at 100 TB); this path is
    O(doc bytes) of numpy per partition with zero shuffle. Hash values
    differ from the md5 variant (positions selected differ too), so the
    JVM twin remains the DuckDB-mirrorable oracle while this is the one a
    corpus-scale job should call.

    Returns (id_col, pos, fp_hash:long), distinct per (id, pos).
    """
    from dedup.minhash import batch_window_hashes, batch_ws_normalize_bytes

    id_field = docs.schema[id_col]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("pos", T.IntegerType()),
            T.StructField("fp_hash", T.LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col]
            texts = batch_ws_normalize_bytes(list(pdf[text_col]))
            H, starts, counts = batch_window_hashes(texts, k)
            out_id, out_pos, out_h = [], [], []
            for i in range(len(ids)):
                h = H[starts[i] : starts[i] + counts[i]]
                n = h.size
                if n == 0:
                    continue
                if n > w:
                    wins = np.lib.stride_tricks.sliding_window_view(h, w)
                    idx = np.arange(n - w + 1) + np.argmin(wins, axis=1)
                else:
                    idx = np.array([int(np.argmin(h))])
                # clipped tail windows (the JVM twin's ROWS BETWEEN CURRENT
                # AND w-1 FOLLOWING shrinks at the end): suffix leftmost
                # minima of the last w-1 positions — at most w-1 tiny argmins
                tail = [
                    i + int(np.argmin(h[i:]))
                    for i in range(max(n - w + 1, 1), n)
                ]
                sel = np.unique(np.concatenate([idx, np.array(tail, dtype=np.int64)])) if tail else np.unique(idx)
                out_id.extend([ids.iloc[i]] * sel.size)
                out_pos.extend((sel + 1).tolist())  # 1-based like the twin
                out_h.extend(h[sel].astype(np.int64).tolist())
            yield pd.DataFrame({id_col: out_id, "pos": out_pos, "fp_hash": out_h})

    return docs.select(id_col, text_col).mapInPandas(gen, schema=out_schema)
