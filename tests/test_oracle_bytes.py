"""Non-ASCII Spark-vs-DuckDB oracle parity (VERDICT r03 item #5).

The r03 neardup/span oracles windowed CHARACTERS while the Spark tiers
shingle UTF-8 BYTES — they matched only because the driver fixture is
ASCII. The oracles now window octets (substr over hex(encode(...))); this
test proves the class of divergence is gone by running BOTH engines over a
fixture dense in multi-byte text (accented Latin, CJK, 4-byte emoji) and
asserting identical results for the two byte-sensitive driver queries.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SENTENCES = [
    "le café préféré de señor Muñoz est à côté de l'hôtel",
    "東京タワーの近くで寿司と抹茶を楽しんだ午後のこと",
    "die Größe der Übung überraschte die fröhlichen Schüler",
    "η γρήγορη καφέ αλεπού πηδάει πάνω από τον τεμπέλη σκύλο",
    "резюме кандидата содержало опечатки и странные символы",
    "🎉 unicode emoji soup 🚀 with four-byte codepoints 🌍 inside",
    "naïve façade jalapeño crème brûlée smörgåsbord",
    "한국어 문장도 바이트 단위 창에 정확히 들어가야 한다",
]


def _doc_text(i: int) -> str:
    """Deterministic multi-sentence doc, mostly non-ASCII, long enough that
    _sp span partners share >= 150 BYTES (CJK sentences are ~3 bytes/char,
    so two sentences already clear the span threshold)."""
    parts = [SENTENCES[(i + j) % len(SENTENCES)] + f" №{i}·{j}" for j in range(6)]
    return ". ".join(parts)


@pytest.fixture(scope="module")
def nonascii_sf_dir(tmp_path_factory):
    """A documents.parquet shaped like the driver's, with non-ASCII text and
    doc_ids hitting the %7/%13/%17 planted-duplicate derivations."""
    d = tmp_path_factory.mktemp("nonascii_sf")
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(40)),
            "text": [_doc_text(i) for i in range(40)],
            "lang": ["mix"] * 40,
            "source": [f"src{i % 3 + 1}" for i in range(40)],
        }
    )
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(d / "documents.parquet")
    return str(d)


def _oracle_rows(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.sql(sql).fetchall()


def _canon(rows, round_floats=True):
    out = []
    for r in rows:
        out.append(
            tuple(round(v, 5) if isinstance(v, float) and round_floats else v for v in r)
        )
    return sorted(out)


def test_neardup_minhash_nonascii_parity(spark, nonascii_sf_dir):
    import __spark_entry__ as entry

    spark_rows = [
        tuple(r) for r in entry.q_neardup_docs_minhash(spark, nonascii_sf_dir).collect()
    ]
    oracle_rows = _oracle_rows(entry.oracle_sql()["neardup_minhash"], nonascii_sf_dir)
    assert len(spark_rows) > 0, "fixture must produce near-dup pairs"
    assert _canon(spark_rows) == _canon(oracle_rows)


def test_span_pairs_nonascii_parity(spark, nonascii_sf_dir):
    import __spark_entry__ as entry

    spark_rows = [tuple(r) for r in entry.q_span_pairs(spark, nonascii_sf_dir).collect()]
    oracle_rows = _oracle_rows(entry.oracle_sql()["span_pairs"], nonascii_sf_dir)
    assert len(spark_rows) > 0, "fixture must produce span pairs"
    assert _canon(spark_rows) == _canon(oracle_rows)
