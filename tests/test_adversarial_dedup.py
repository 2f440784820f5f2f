"""Adversarial-input dedup mode (round-6 verdict item 8).

The sketch hash family ``fmix64(polyhash)`` (kernel/sighash.py) is
documented NON-adversarial-only: fmix64 is invertible and base-P
polyhash mod 2^64 admits constructible collisions for any fixed odd
base.  This file CONSTRUCTS such a collision — the classic
Thue-Morse anti-hash pair: X_{k+1} = X_k·Y_k, Y_{k+1} = Y_k·X_k over a
two-letter alphabet; the hash difference is (a-b)·∏(P^(2^i)-1) whose
2-adic valuation exceeds 64 by k≈10 — and verifies the documented
defense engages end-to-end:

- the fast ``carry_shingles=True`` path (hash-set Jaccard) MERGES the
  crafted non-duplicates — demonstrating the attack is real against
  the default path, exactly as the threat model states;
- the adversarial-mode ``carry_shingles=False`` path recomputes STRING
  shingle sets in its verify (exact set Jaccard, no hash in the loop)
  and must NOT merge them, while still finding genuine duplicates in
  the same corpus.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accelerated_intelligent_document_processing_on_aws_spark.kernel import sighash
from accelerated_intelligent_document_processing_on_aws_spark.operators import dedup


def _thue_morse_pair(k: int = 10) -> tuple[str, str]:
    x, y = "a", "b"
    for _ in range(k):
        x, y = x + y, y + x
    return x, y


def test_thue_morse_tokens_collide_in_hash_family():
    """The construction really collides: two different 1024-char tokens
    with equal fmix64(polyhash) token hashes, hence equal gram hashes
    for any equal-shape shingle."""
    t1, t2 = _thue_morse_pair(10)
    assert t1 != t2 and len(t1) == len(t2) == 1024
    h1, h2 = sighash.ref_token_hash(t1), sighash.ref_token_hash(t2)
    assert h1 == h2
    g1 = sighash.ref_gram_hash([h1, h1, h1])
    g2 = sighash.ref_gram_hash([h2, h2, h2])
    assert g1 == g2


def test_adversarial_mode_defeats_crafted_collision(spark):
    t1, t2 = _thue_morse_pair(10)
    docs = spark.createDataFrame(
        [
            # crafted pair: zero shared string shingles, identical hash
            # shingle sets (every token hash collides)
            (1, f"{t1} {t1} {t1} {t1}"),
            (2, f"{t2} {t2} {t2} {t2}"),
            # genuine near-duplicates the adversarial mode must keep
            (3, "the quick brown fox jumps over the lazy dog tonight"),
            (4, "the quick brown fox jumps over the lazy dog today"),
            # unrelated filler
            (5, "completely different content about spark partitioning"),
        ],
        "doc_id bigint, text string",
    )
    fast = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(docs, carry_shingles=True).collect()
    }
    # the attack works against the default (trusted-corpus) path: the
    # hash-set Jaccard of the crafted pair is 1.0
    assert (1, 2) in fast
    safe = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(docs, carry_shingles=False).collect()
    }
    # adversarial mode: string-set verify rejects the crafted pair...
    assert (1, 2) not in safe
    # ...and still finds the genuine near-duplicate pair
    assert (3, 4) in safe
