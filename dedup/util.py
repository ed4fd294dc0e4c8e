"""Persistent-RDD scratch management.

Every ``localCheckpoint`` pins blocks in the block manager for the life of
the session; a pipeline run creates a dozen of them (tier intermediates, CC
rounds). Left in place they crowd the storage pool and visibly degrade the
NEXT job's UDF stages (observed: +10 s on the signature stage after one
run). These helpers snapshot the persistent-RDD id set and free everything
a run created except the results the caller wants to keep."""

from __future__ import annotations

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()  # noqa: SLF001
    it = jmap.iterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def unpersist_ids(spark: SparkSession, ids: set[int], blocking: bool = False) -> int:
    """Unpersist every currently-persistent RDD whose id is in ``ids``."""
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()  # noqa: SLF001
    it = jmap.iterator()
    freed = 0
    while it.hasNext():
        e = it.next()
        if e._1() in ids:
            e._2().unpersist(blocking)
            freed += 1
    return freed


def free_all_scratch(spark: SparkSession) -> int:
    """Unpersist every persistent RDD (bench/test hygiene between phases)."""
    return unpersist_ids(spark, persistent_rdd_ids(spark))


def spread_for_udf(df, materialized: bool = True):
    """Ensure a pandas-UDF input has ≥ cluster-parallelism partitions —
    WITHOUT a blanket repartition. UDF cost scales with ROWS, and upstream
    AQE coalesces by BYTES, so a squeezed input serializes the UDF; but an
    unconditional ``repartition`` shuffles the full text payload even when
    the input is already wide enough (measured: the 6.4M-turn simhash
    input is 48 scan splits at maxPartitionBytes=16MB — the repartition
    moved 1.3 GB of text for nothing).

    ``materialized=True`` (checkpointed/parquet-backed input): read the
    actual partition count and repartition only if too narrow.
    ``materialized=False`` (un-executed plan, possibly AQE): partition
    count cannot be read without forcing execution — fall back to the
    unconditional repartition.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if not materialized:
        return df.repartition(par)
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — exotic plans: keep the safe behavior
        return df.repartition(par)
    return df if n >= par else df.repartition(par)
