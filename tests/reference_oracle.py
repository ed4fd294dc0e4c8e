"""Pure-Python reimplementation of the reference tool's grouping semantics,
used as the recall oracle (BASELINE.md gate: dup-pair recall ≥ 0.99 vs the
reference's duplicate groupings).

Faithfully mirrors the reference dataflow on conversations instead of files
(reference: /root/reference/src/processor.rs):

- block by exact size (src/processor.rs:117-120) → here (n_turns, total_chars);
- only multi-member blocks are fingerprinted (src/processor.rs:41-42);
- fast mode hashes the first 16,384 bytes, strict mode the whole content
  (src/processor.rs:61-64, src/fileinfo.rs:27-48);
- group by (block, fingerprint); only groups of ≥2 are duplicates
  (src/formatter.rs:46).

Deliberately independent of dedup/: plain dicts + hashlib, no Spark, no
shared hashing code — so agreement is evidence, not tautology.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict


def reference_duplicate_groups(
    docs: dict[str, tuple[int, str]], strict: bool, prefix_len: int = 16384
) -> list[set[str]]:
    """docs: conv_id -> (n_turns, assembled_doc). Returns duplicate groups."""
    # stage 1: sizewise blocking
    blocks: dict[tuple[int, int], list[str]] = defaultdict(list)
    for cid, (n_turns, doc) in docs.items():
        blocks[(n_turns, len(doc))].append(cid)

    # stage 2: hashwise grouping inside multi-member blocks only
    groups: dict[tuple, set[str]] = defaultdict(set)
    for bkey, members in blocks.items():
        if len(members) < 2:
            continue  # singleton blocks never reach the hash stage
        for cid in members:
            doc = docs[cid][1]
            content = doc if strict else doc[:prefix_len]
            h = hashlib.md5(content.encode("utf-8", "surrogatepass")).hexdigest()
            groups[(bkey, h)].add(cid)

    return [g for g in groups.values() if len(g) >= 2]


def groups_to_pairs(groups: list[set[str]]) -> set[tuple[str, str]]:
    pairs = set()
    for g in groups:
        ms = sorted(g)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs
