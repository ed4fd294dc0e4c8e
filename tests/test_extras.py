"""Text analysis, embedding similarity, multimodal plumbing, table IO."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )


def test_text_stats(docs):
    from dedup.textfns import with_text_stats

    rows = with_text_stats(docs).select(
        "doc_id", "text", "n_tokens", "n_bpe_tokens", "lang_pred", "quality"
    ).collect()
    for r in rows[:50]:
        assert r.n_tokens == len(r.text.split(" "))
        assert r.n_bpe_tokens >= r.n_tokens  # punctuation splits add tokens
        assert 0.0 <= r.quality <= 1.0
        assert r.lang_pred in {"en", "es", "de", "fr", "und"}


def test_fingerprint_overlap(spark):
    from dedup.textfns import make_fingerprint_udf

    udf = make_fingerprint_udf(w=16, n_keep=8)
    base = "the quick brown fox jumps over the lazy dog and keeps running forward " * 8
    rows = [(0, base), (1, base + " tiny tail change"), (2, "completely different words " * 12)]
    df = spark.createDataFrame(rows, "id long, text string")
    fps = {r.id: set(r.fp) for r in df.select("id", udf("text").alias("fp")).collect()}
    assert len(fps[0] & fps[1]) >= 6  # near-dup shares most minima
    assert len(fps[0] & fps[2]) <= 2


def test_brute_force_vs_numpy_topk(emb):
    from dedup.similarity import brute_force_topk

    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    got = brute_force_topk(emb, q, k=5).orderBy("query_id", "rank").collect()

    pdf = emb.toPandas()
    m = np.stack(pdf["v"].to_numpy())
    ids = pdf["vec_id"].to_numpy()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in range(3):
        qi = np.where(ids == qid)[0][0]
        sims = mn @ mn[qi]
        sims[qi] = -np.inf
        order = np.argsort(np.stack([-sims, ids], axis=1).view("f8,f8"), order=["f0", "f1"], axis=0)
        top = [int(ids[i]) for i in order[:5].ravel()]
        mine = [r.neighbor_id for r in got if r.query_id == qid]
        assert mine == top, (qid, mine, top)


def test_lsh_topk_recall(emb):
    """Bucketed ANN recalls a decent fraction of true top-10 at n_bits=8."""
    from dedup.similarity import brute_force_topk, lsh_topk

    q = emb.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    exact = brute_force_topk(emb, q, k=10).select("query_id", "neighbor_id")
    approx = lsh_topk(emb, k=10).select("query_id", "neighbor_id")
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall  # n_bits=4 x 16 tables at cosine~0.3 neighbors


def test_embedding_neardup_symmetric(emb):
    from dedup.similarity import embedding_neardup_pairs

    pairs = embedding_neardup_pairs(emb.limit(100), threshold=0.5)
    rows = pairs.collect()
    for r in rows:
        assert r.id_a < r.id_b
        assert r.sim >= 0.5


def test_multimodal_decode_and_dups(spark):
    from dedup.multimodal import decode_media, media_exact_dups, synth_media

    media = synth_media(spark, n=32)
    feats = decode_media(media)
    rows = feats.collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r.feature) == 16
        assert abs(float(np.linalg.norm(r.feature)) - 1.0) < 1e-5
        assert r.n_bytes > 0
    dups = media_exact_dups(feats).collect()
    assert len(dups) >= 2  # planted every-8th duplicates found


def test_multimodal_real_decode_is_explicit_stub(spark):
    from dedup.multimodal import decode_media, synth_media

    media = synth_media(spark, n=4)
    with pytest.raises(Exception, match="NotImplementedError|not in this container"):
        decode_media(media, fake=False).collect()


def test_table_io_roundtrip_and_delete(spark, tmp_path):
    from dedup.io import TableIO, iceberg_available

    assert iceberg_available(spark) is False  # sandbox: parquet fallback
    io = TableIO(spark, str(tmp_path))
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    io.write(df, "t")
    assert io.read("t").count() == 10
    io.delete_rows("t", "id", spark.range(3))
    left = {r.id for r in io.read("t").collect()}
    assert left == set(range(3, 10))
