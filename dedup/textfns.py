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
    """Winnowing-style document fingerprint: the n_keep smallest mixed
    rolling-hash values of w-char windows — a compact content signature
    whose overlap estimates containment (rows-only; not SQL-expressible)."""
    from dedup.minhash import py_normalize, shingle_hashes

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def fingerprint_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            h = shingle_hashes(py_normalize(t or ""), w)
            sel = np.sort(h)[:n_keep]
            out.append(sel.astype(np.int64))
        return pd.Series(out)

    return fingerprint_udf
