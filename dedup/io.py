"""Table I/O adapter: Iceberg when a catalog is configured, parquet dirs
otherwise — one read/write/delete API either way (SURVEY.md §7 phase 0).

Production posture (north rule): transcripts/signatures/clusters/lineage
live in Iceberg; duplicate deletion is a row-level ``DELETE FROM`` (merge-on-
read). This sandbox has no Iceberg runtime jar, so the adapter transparently
falls back to parquet + anti-join overwrite; the pipeline logic upstream is
identical, which is the point of the adapter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured and the classes exist."""
    try:
        confs = spark.conf.getAll if callable(getattr(spark.conf, "getAll", None)) else {}
    except Exception:  # noqa: BLE001
        confs = {}
    has_catalog = any(
        k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
        for k, v in dict(confs or {}).items()
    )
    if not has_catalog:
        return False
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


class TableIO:
    """Minimal table API over Iceberg or a parquet base dir."""

    def __init__(self, spark: SparkSession, base: str, catalog: str | None = None):
        self.spark = spark
        self.base = base.rstrip("/")
        self.catalog = catalog if catalog and iceberg_available(spark) else None

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{name}" if self.catalog else f"{self.base}/{name}"

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        if self.catalog:
            w.format("iceberg").saveAsTable(self._ident(name))
        else:
            w.parquet(self._ident(name))

    def read(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.read.format("iceberg").load(self._ident(name))
        return self.spark.read.parquet(self._ident(name))

    def delete_rows(self, name: str, key: str, keys_df: DataFrame) -> None:
        """Row-level delete: Iceberg ``DELETE FROM`` when available, else
        read → anti-join → overwrite (the reference analog of its
        fs::remove_file loop, /root/reference/src/interactive.rs:125-135)."""
        if self.catalog:
            keys_df.createOrReplaceTempView("_delete_keys")
            self.spark.sql(
                f"DELETE FROM {self._ident(name)} t "
                f"WHERE t.{key} IN (SELECT {key} FROM _delete_keys)"
            )
        else:
            remaining = self.read(name).join(
                F.broadcast(keys_df.select(key)), key, "left_anti"
            )
            # parquet cannot overwrite in place from itself — stage then swap
            tmp = f"{name}__staged"
            remaining.write.mode("overwrite").parquet(self._ident(tmp))
            self.spark.read.parquet(self._ident(tmp)).write.mode("overwrite").parquet(
                self._ident(name)
            )
