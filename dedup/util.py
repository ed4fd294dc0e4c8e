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
