"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same sf dir, then compares
row count + schema (column names) + an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified).

Usage: PYTHONPATH=/root/repo python tools/check_contract.py [sf_dir] [names...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6g}"
        if isinstance(v, bool):
            return str(v).lower()
        return str(v)

    rows = sorted("|".join(cell(v) for v in row) for row in pdf.itertuples(index=False))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from dedup.session import get_spark

    spark = get_spark(app_name="contract-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        t_spark = time.monotonic() - t0
        if name not in oracles:
            print(f"rows-only  {name}: rows={len(spark_pdf)} ({t_spark:.1f}s)")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {e}")
            failures.append(name)
            continue
        ok_rows = len(spark_pdf) == len(duck_pdf)
        ok_schema = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
        ok_hash = ok_rows and ok_schema and value_hash(spark_pdf) == value_hash(duck_pdf)
        status = "OK  " if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(
            f"{status}  {name}: rows {len(spark_pdf)}/{len(duck_pdf)} "
            f"schema={'ok' if ok_schema else sorted(spark_pdf.columns)} "
            f"hash={'ok' if ok_hash else 'MISMATCH'} ({t_spark:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_schema and ok_rows:
                cols = sorted(spark_pdf.columns)
                s = spark_pdf[cols].sort_values(cols).reset_index(drop=True)
                d = duck_pdf[cols].sort_values(cols).reset_index(drop=True)
                for i in range(min(len(s), len(d))):
                    if value_hash(s.iloc[[i]]) != value_hash(d.iloc[[i]]):
                        print(f"      first diff row {i}:\n  spark: {s.iloc[i].to_dict()}\n  duck:  {d.iloc[i].to_dict()}")
                        break
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
