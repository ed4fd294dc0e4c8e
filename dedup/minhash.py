"""MinHash signatures over char-shingled documents (operators N2+N3).

The generalization of the reference's "cheap approximate fingerprint" idea —
its 16-KiB prefix hash (reference: /root/reference/src/fileinfo.rs:42-48)
admits false positives but never false negatives for exact duplicates; a
MinHash signature has the same one-sided property (identical docs ⇒ identical
signatures at ANY seed/config) while also catching near-duplicates, which is
what the north rule requires.

All compute is a single Arrow-batched pandas UDF (no per-row Python):
- shingling = numpy sliding-window polynomial rolling hash over UTF-8 bytes
  of the normalized doc, finalized with a 64-bit mixer (N2);
- signature position i = min over shingles x of mix64(x XOR salt_i), where
  mix64 is the splitmix64 finalizer — a high-quality pseudo-permutation of
  the uint64 space computable with pure wraparound arithmetic (vectorizes
  perfectly; no modular reduction whose wrap count would bias the min toward
  structurally small inputs). Salts come from a SEEDED generator (N3) —
  unlike the reference's per-run random seed (src/server.rs:38-39), the seed
  is pinned so runs are reproducible and the recall gate is checkable.

Memory is bounded by chunking the shingle axis (num_perm × 4096 × 8B ≈ 4 MB
working set per doc regardless of doc length).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dedup.config import DedupConfig

_ROLL_BASE = np.uint64(1099511628211)  # FNV-ish odd base for the rolling hash
_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)


def _mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — bijective avalanche mix of uint64 (wraparound)."""
    z = z ^ (z >> np.uint64(30))
    z = z * _SM1
    z = z ^ (z >> np.uint64(27))
    z = z * _SM2
    return z ^ (z >> np.uint64(31))


@lru_cache(maxsize=8)
def _perm_salts(num_perm: int, seed: int) -> np.ndarray:
    """Fixed per-permutation salts, cached per executor process."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 64, size=num_perm, dtype=np.uint64)


@lru_cache(maxsize=8)
def _roll_weights(k: int) -> np.ndarray:
    # BASE^(k-1), ..., BASE^1, BASE^0 with uint64 wraparound (intentional)
    w = np.ones(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k - 2, -1, -1):
            w[i] = w[i + 1] * _ROLL_BASE
    return w


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct uint64 hashes of all k-byte shingles of ``text`` (UTF-8).

    Texts shorter than k yield a single whole-text shingle so every doc has a
    non-empty set (mirrors the reference hashing small files fully,
    src/fileinfo.rs:45-47).
    """
    raw = text.encode("utf-8", "surrogatepass")
    arr = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        if arr.size <= k:
            h = (arr * _roll_weights(int(arr.size))).sum(dtype=np.uint64)[None]
        else:
            win = np.lib.stride_tricks.sliding_window_view(arr, k)
            h = win @ _roll_weights(k)  # uint64 wraparound per window
        # finalize: polynomial-mod-2^64 hashes have structured low bits
        return np.unique(_mix64(h))


def batch_window_hashes(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mixed uint64 k-byte-window hashes for a WHOLE batch of texts in one
    vectorized pass: all bytes are concatenated, one sliding-window matmul
    computes every window hash, and windows crossing document boundaries are
    dropped with a ragged-range index. Texts shorter than k contribute one
    whole-text hash (same convention as shingle_hashes).

    Returns (H, starts, counts): doc i's window hashes (multiset, NOT
    deduped — MinHash's min and SimHash's votes are defined on multisets)
    are H[starts[i] : starts[i]+counts[i]].
    """
    bufs = [t.encode("utf-8", "surrogatepass") for t in texts]
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    n_docs = len(bufs)
    counts = np.where(lens >= k, lens - k + 1, 1)
    starts = np.zeros(n_docs, dtype=np.int64)
    if n_docs:
        np.cumsum(counts[:-1], out=starts[1:])
    H = np.empty(int(counts.sum()), dtype=np.uint64)

    with np.errstate(over="ignore"):
        long_mask = lens >= k
        if long_mask.any():
            arr = (
                np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.uint64)
                if lens.sum()
                else np.zeros(0, np.uint64)
            )
            offs = np.zeros(n_docs, dtype=np.int64)
            np.cumsum(lens[:-1], out=offs[1:])
            win = np.lib.stride_tricks.sliding_window_view(arr, k)
            h_all = win @ _roll_weights(k)

            lcounts = counts[long_mask]
            total_long = int(lcounts.sum())
            csum = np.zeros(lcounts.size, dtype=np.int64)
            np.cumsum(lcounts[:-1], out=csum[1:])
            base = np.arange(total_long, dtype=np.int64)
            src = base + np.repeat(offs[long_mask] - csum, lcounts)
            dst = base + np.repeat(starts[long_mask] - csum, lcounts)
            H[dst] = _mix64(h_all[src])

        # short docs: per-doc whole-text hash (rare path)
        for i in np.nonzero(~long_mask)[0]:
            b = bufs[i]
            a = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
            if a.size == 0:
                a = np.zeros(1, dtype=np.uint64)
            h = (a * _roll_weights(int(a.size))).sum(dtype=np.uint64)
            H[starts[i]] = _mix64(np.array([h], dtype=np.uint64))[0]
    return H, starts, counts


def batch_minhash(texts: list[str], k: int, num_perm: int, seed: int) -> np.ndarray:
    """(n_docs × num_perm) int32 signatures for a batch, fully vectorized:
    per salt chunk, mix the whole batch's window hashes once and segment-min
    with np.minimum.reduceat. Identical output to minhash_signature(
    shingle_hashes(text)) — min over a multiset equals min over its set."""
    H, starts, _counts = batch_window_hashes(texts, k)
    n_docs = starts.size
    salts = _perm_salts(num_perm, seed)
    if n_docs == 0:
        return np.empty((0, num_perm), dtype=np.int32)
    # Cache-blocked: all permutations are applied to one L2-sized window
    # chunk while it is hot, then per-doc minima are merged across chunks.
    # A perm-at-a-time 1D sweep re-streams H from DRAM ~10× per permutation
    # (~memory-bandwidth bound — adding cores does nothing); blocking turns
    # it compute-bound and scales with executor threads.
    CHUNK = 2048  # windows per block: (num_perm × CHUNK × 8B) temps ≈ 2 MB
    mins = np.full((num_perm, n_docs), np.iinfo(np.uint64).max, dtype=np.uint64)
    v = np.empty((num_perm, CHUNK), dtype=np.uint64)
    t = np.empty((num_perm, CHUNK), dtype=np.uint64)
    salts_col = salts[:, None]
    with np.errstate(over="ignore"):
        for lo in range(0, H.size, CHUNK):
            hi = min(lo + CHUNK, H.size)
            n = hi - lo
            vv, tt = v[:, :n], t[:, :n]
            np.bitwise_xor(H[lo:hi][None, :], salts_col, out=vv)
            np.right_shift(vv, np.uint64(30), out=tt); vv ^= tt; vv *= _SM1
            np.right_shift(vv, np.uint64(27), out=tt); vv ^= tt; vv *= _SM2
            np.right_shift(vv, np.uint64(31), out=tt); vv ^= tt
            # docs overlapping this chunk: starts in [lo, hi) plus the one
            # straddling doc that began before lo
            d0 = int(np.searchsorted(starts, lo, side="right")) - 1
            d1 = int(np.searchsorted(starts, hi, side="left"))
            local = np.maximum(starts[d0:d1] - lo, 0)
            np.minimum(
                mins[:, d0:d1],
                np.minimum.reduceat(vv, local, axis=1),
                out=mins[:, d0:d1],
            )
    return (mins.T & np.uint64(0xFFFFFFFF)).astype(np.int64).astype(np.int32)


def minhash_signature(shingles_u64: np.ndarray, num_perm: int, seed: int) -> np.ndarray:
    """num_perm-wide MinHash signature (int32) of a shingle set.

    Position i = low 32 bits of min over shingles x of mix64(x ^ salt_i).
    The 64→32 truncation only matters for cross-doc equality tests; a
    spurious positional match has probability 2^-32.
    """
    salts = _perm_salts(num_perm, seed)
    mins = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for lo in range(0, shingles_u64.size, 4096):
            chunk = shingles_u64[lo : lo + 4096]
            v = _mix64(chunk[None, :] ^ salts[:, None])
            np.minimum(mins, v.min(axis=1), out=mins)
    return (mins & np.uint64(0xFFFFFFFF)).astype(np.int64).astype(np.int32)


#: whitespace class for normalization. \x1e (TURN_SEP) is listed explicitly:
#: turn boundaries shingle like whitespace, and Java's \s — unlike Python's —
#: does not already include the separator-control chars \x1c-\x1f.
NORM_PATTERN = "[\\s\\x1c-\\x1f]+"


def _normalize_expr(col):
    """Spark-side normalization: lowercase + collapse whitespace runs.

    Keeps normalization in JVM codegen so the pandas UDF only does the numpy
    work; also what makes "whitespace/punct-insensitive near-dup" fixtures
    land above the Jaccard threshold.
    """
    return F.regexp_replace(F.lower(col), NORM_PATTERN, " ")


def make_minhash_udf(cfg: DedupConfig):
    k, num_perm, seed = cfg.shingle_k, cfg.num_perm, cfg.seed

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def minhash_udf(docs: pd.Series) -> pd.Series:
        sigs = batch_minhash(
            [d if d is not None else "" for d in docs], k, num_perm, seed
        )
        return pd.Series(list(sigs))

    return minhash_udf


def with_minhash(conversations: DataFrame, cfg: DedupConfig | None = None) -> DataFrame:
    """Attach a ``minhash: array<int>`` column computed from the normalized doc."""
    cfg = cfg or DedupConfig()
    udf = make_minhash_udf(cfg)
    return conversations.withColumn("minhash", udf(_normalize_expr(F.col("doc"))))


# ---------------------------------------------------------------------------
# pure-Python oracle used by tests (same math, no Spark)
# ---------------------------------------------------------------------------

def py_normalize(text: str) -> str:
    import re

    return re.sub(NORM_PATTERN, " ", text.lower())


def py_minhash(text: str, cfg: DedupConfig) -> np.ndarray:
    return minhash_signature(shingle_hashes(py_normalize(text), cfg.shingle_k), cfg.num_perm, cfg.seed)


def py_jaccard(a: str, b: str, cfg: DedupConfig) -> float:
    sa = set(shingle_hashes(py_normalize(a), cfg.shingle_k).tolist())
    sb = set(shingle_hashes(py_normalize(b), cfg.shingle_k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
