"""Property-based tests (hypothesis) for the pure-numpy kernels — the parts
whose correctness everything else leans on. No Spark session needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup.config import DedupConfig
from dedup.minhash import (
    batch_minhash,
    minhash_signature,
    py_jaccard,
    py_minhash,
    py_normalize,
    shingle_hashes,
)
from dedup.simhash import batch_simhash
from dedup.suffix import longest_common_substring_len

TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    min_size=0,
    max_size=400,
)
CFG = DedupConfig()


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=12))
def test_batch_minhash_equals_per_doc(texts):
    norm = [py_normalize(t) for t in texts]
    sigs = batch_minhash(norm, CFG.shingle_k, CFG.num_perm, CFG.seed)
    for i, t in enumerate(norm):
        ref = minhash_signature(shingle_hashes(t, CFG.shingle_k), CFG.num_perm, CFG.seed)
        assert np.array_equal(sigs[i], ref)


@settings(max_examples=60, deadline=None)
@given(TEXT)
def test_identical_text_identical_fingerprints(t):
    assert np.array_equal(py_minhash(t, CFG), py_minhash(t, CFG))
    r = batch_simhash([t, t])
    assert int(r[0]) == int(r[1])
    assert py_jaccard(t, t, CFG) == 1.0


@settings(max_examples=40, deadline=None)
@given(TEXT, TEXT)
def test_jaccard_symmetric_and_bounded(a, b):
    j = py_jaccard(a, b, CFG)
    assert 0.0 <= j <= 1.0
    assert j == py_jaccard(b, a, CFG)


def _lcs_brute(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


@settings(max_examples=40, deadline=None)
@given(
    st.text(alphabet="abc", min_size=0, max_size=40),
    st.text(alphabet="abc", min_size=0, max_size=40),
)
def test_lcs_matches_bruteforce(a, b):
    assert longest_common_substring_len(a, b) == _lcs_brute(a, b)


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="abcdef ", min_size=120, max_size=300), st.integers(0, 300))
def test_simhash_hamming_small_for_small_edits(base, pos):
    """Flipping one char of a long-ish text moves SimHash only a few bits —
    the property the near-exact-turn tier's Hamming threshold relies on.
    One edit perturbs ≤ k=4 of the ~n windows; with n ≥ 120 the expected
    vote swing per bit is tiny, so 24/64 bits is a loose ceiling."""
    chars = list(base)
    chars[pos % len(chars)] = "z"
    edited = "".join(chars)
    r = batch_simhash([base, edited])
    hamming = bin((int(r[0]) ^ int(r[1])) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert hamming <= 24
