"""dedup — a PySpark-native near-duplicate detection + clustering engine.

A from-scratch reimagining of the two-stage block→fingerprint→group pipeline
of sreedevk/deduplicator (reference: /root/reference/src/server.rs:76-109) as
a corpus-scale Spark pipeline over multi-turn conversation transcripts:

    turns ──assemble──▶ conversations ──block──▶ candidate blocks
          ──fingerprint (exact md5 / prefix / MinHash / SimHash / spans)──▶
          candidate pairs ──verify──▶ edges ──connected components──▶ clusters
          ──keep policy──▶ representatives / losers ──▶ report / delete-rewrite

Everything is DataFrame-first: built-in pyspark.sql.functions on the hot path,
vectorized pandas/Arrow UDFs only where Spark lacks the primitive (MinHash,
SimHash, suffix spans). No RDDs, no per-row Python UDFs.
"""

from dedup.config import DedupConfig
from dedup.session import get_spark

__all__ = ["DedupConfig", "get_spark"]
__version__ = "0.1.0"
