"""Equivalence gate: vectorized Arrow/numpy signature batch path vs the
per-document reference implementation of the same hash family
(`kernel/sighash.py`) — the same gating pattern as the HTML tokenizer's
find-dispatch scanner (tests/test_tokenizer_equiv.py).

No SparkSession needed: both sides are plain numpy/Arrow, so this gate
is cheap enough to run on every commit.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from accelerated_intelligent_document_processing_on_aws_spark.kernel import sighash

ADVERSARIAL = [
    None,
    "",
    "   ",
    "\t\n  \t",
    "one",
    "two tokens",
    "exactly three tokens",
    "now four whole tokens",
    "a a a a a a a a",  # heavy repetition (TF weights + distinct)
    "A a A a",  # case folding
    "word " * 500,  # long single-token repetition
    " ".join(f"tok{i}" for i in range(100)),
    "x y z",  # NBSP is unicode whitespace for both sides
    "héllo wörld ünïcode",
    "日本語 テキスト の トークン",
    "emoji 🚀 tokens 🎉 here",
    "tab\tseparated\ttokens",
    "trailing space ",
    " leading space",
    "mixed  \n multiple   \t whitespace",
    "a" * 3000,  # one very long token (power-table path)
    "\x00embedded null",  # NUL byte inside a token
]

# Alphabet for hypothesis: printable ASCII + whitespace + assorted
# unicode.  Two documented edges are excluded, where Python string
# semantics diverge from Arrow's utf8proc semantics (the fast path
# defines engine behavior; the Catalyst \s+ twin has analogous
# ASCII-only edges already):
# - \x1c-\x1f controls: Python str.split() treats them as whitespace,
#   Unicode White_Space does not;
# - Greek capital sigma: Python str.lower() applies the context-
#   sensitive final-sigma rule ('AΣ'.lower() == 'aς'), Arrow utf8_lower
#   maps Σ→σ unconditionally.
_ALPHABET = st.sampled_from(
    list(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " \t\n\r\x0b\x0c"
        ".,;:!?'\"()[]{}<>-_=+*/\\|@#$%^&~`"
    )
    + ["é", "ü", "ß", "日", "本", "語", "🚀", " ", "　", "²", "σ"]
)

N = 3
NUM_HASHES = 32
BANDS = 8
A, B = sighash.remix_params(NUM_HASHES, seed=1)


def _check_batch(texts):
    arr = pa.array(texts, type=pa.string())
    got_b, got_s = sighash.minhash_bands_batch(
        arr, N, A, B, BANDS, want_shingles=True
    )
    for i, t in enumerate(texts):
        want_b = sighash.ref_minhash_bands_doc(t, N, A, B, BANDS)
        want_s = sighash.ref_gram_hash_set(t, N)
        if want_b is None:
            assert got_b[i] is None, (i, t)
            assert got_s[i] is None
        else:
            assert list(got_b[i]) == want_b, (i, t)
            got_u = [int(x) & ((1 << 64) - 1) for x in got_s[i]]
            assert got_u == want_s, (i, t)
    got_fp = sighash.simhash_batch(arr)
    for i, t in enumerate(texts):
        assert got_fp[i] == sighash.ref_simhash_doc(t), (i, t)


def test_adversarial_corpus():
    _check_batch(ADVERSARIAL)


def test_token_hash_scalar_matches_batch():
    toks = ["", "a", "ab", "hello", "a" * 1000, "日本語", "🚀", "\x00\x00"]
    got = sighash.hash_strings(pa.array(toks, type=pa.string()))
    for i, t in enumerate(toks):
        want = (
            sighash.ref_fmix64(0) if t == "" else sighash.ref_token_hash(t)
        )
        assert int(got[i]) == want, t


def test_chunked_hashing_matches_unchunked(monkeypatch):
    """Sub-batch chunk boundaries must not change any hash."""
    texts = [" ".join(f"w{i}{j}" for j in range(50)) for i in range(80)]
    arr = pa.array(texts, type=pa.string())
    full = sighash.simhash_batch(arr)
    monkeypatch.setattr(sighash, "_CHUNK_BYTES", 64)
    monkeypatch.setattr(sighash, "_CHUNK_TOKENS", 7)
    tiny = sighash.simhash_batch(arr)
    assert full == tiny
    got_b, _ = sighash.minhash_bands_batch(arr, N, A, B, BANDS)
    monkeypatch.undo()
    want_b, _ = sighash.minhash_bands_batch(arr, N, A, B, BANDS)
    assert all(list(x) == list(y) for x, y in zip(got_b, want_b))


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHABET, max_size=120), max_size=12))
def test_hypothesis_batches(texts):
    _check_batch(texts)


def test_sliced_arrow_input():
    """UDF batches can arrive as slices of a larger array — offsets in
    both the list and child arrays must be honored."""
    texts = [f"doc {i} with some shared tokens and tail{i}" for i in range(40)]
    arr = pa.array(texts, type=pa.string())
    sl = arr.slice(13, 20)
    got = sighash.simhash_batch(sl)
    want = [sighash.ref_simhash_doc(t) for t in texts[13:33]]
    assert got == want


def test_gram_distinctness_matches_string_shingles():
    """distinct-by-gram-hash must equal distinct-by-shingle-string on a
    corpus with repeated shingles."""
    text = "a b c a b c a b c d"
    grams = sighash.ref_gram_hash_set(text, 3)
    toks = text.split()
    strings = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    assert len(grams) == len(strings)
