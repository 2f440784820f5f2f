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
    "fs\x1cseparated\x1ffields",  # \x1c-\x1f: Python-split whitespace
    "nb\xa0sp and\u2028line\u2029seps \u205f\u3000wide",
    "ogham\u1680space",
    "nel\x85char",
    "trailing cr\r",  # the pyarrow-16.1 split-bug shape
    "AΣ ΟΔΟΣ σε",  # final-sigma position: engine lower = utf8proc simple
    "İstanbul KAPI kapı",  # dotted İ / Turkish i
]

# Alphabet for hypothesis: printable ASCII + whitespace (including the
# \x1c-\x1f file separators — the byte-level splitter matches Python
# str.split() exactly, unlike Arrow's Unicode-White_Space split) +
# assorted unicode INCLUDING the caseful edge codepoints (Σ, İ):
# lowercase semantics are engine-defined (utf8proc simple mapping,
# sighash.ref_lower), so the reference evaluates the same mapping and
# the gate covers them.
_ALPHABET = st.sampled_from(
    list(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " \t\n\r\x0b\x0c\x1c\x1d\x1e\x1f\x85\xa0"
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
    monkeypatch.setattr(sighash, "_CHUNK_ROW_BYTES", 256)
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


def test_arrow_split_bug_sequence():
    """Regression pin for the pyarrow 16.1 utf8_split_whitespace bug
    that forced the byte-level splitter: after certain prior
    allocations, Arrow's split missed a trailing ``\r`` on the
    utf8_lower output buffer (alignment-dependent).  Replay the
    minimized contaminating batch, then assert our tokenizer still
    matches the Python reference on the victim batch."""
    import json
    import os

    contaminator = [
        "k$DO\u00e9l~#6r3\\/.0[e4;f$'!>7+!BS ;[%F-zoc\\nr6Q9\t#Nw\u30008"
        "HLxs\u00e9p=\u00fcqeV~8YARe\u00e9}\x0b|n^1j\"\u8a9e_:40\u3000"
        "\u00e9n~1i>:ad(C+)?<s3&C",
        "=/\u65e5%m{",
        "\u00fc\u65e5gNl\u00b2\u00fc `Ok<2\t`c7C\x0b?G,tJJgW{_\x0cB551`"
        "ZLWq`?)B8/i-|\u00df?%KcnL(73-^t\u03c3#<r\"1>(Q\u00fc/",
        "&trrwYBcp1{K%uek3i K?\x0c\U0001f6807\r*,L:\u00e9_1/w\r\u65e5\x0b"
        "_vjl\u00b2?'P_?xM_\x0c) :(#|Y\U0001f680p8-{5(y\\TN$[aW\x0bkE5`"
        "Ogq*pY8\" UGSaB#\U0001f680VRk",
        "rg\r?j)D\u672cfzb|\u00dfkgPc,\u03c3.@\nna\rQ)aSm`jv(II\u672cn70"
        "\tV1+Q (01l7$EU\u65e5<\\4MK)=lS$Z\"3\u3000XD.b:NZ)|\u00dfg-=2}"
        "a^\u672c5;\r&AoX9\u65e5#\u672cn=\u8a9e:{\u00b2\nw)$\"xpkG>Z"
        "\u8a9eZ",
    ]
    victim = [
        "o", "#", "4YCwPD@x\nWji", "e^&", "KA(", "B:", "E:Ci",
        "j2)P0ZZu<r>8Kf ", "I(T\x0bL/')8", "b%\n\teD", "?=G\\\u00e9",
        "T\u00e9\x0cPw \xa0",
        "'k7tZ[stkD^k,Yf!7\u03c3f]L\u00b2\u00df&$%`c\u00fc\u00b2\u00e9%Z"
        "j[\u00e9K\u00df|pSk/m\u672c{gL@)lWBi\r",
    ]
    for _ in range(3):
        _check_batch(contaminator)
        _check_batch(victim)


def test_ref_lower_frozen_expectations():
    """ref_lower routes through pc.utf8_lower — the engine kernel
    itself — so the gate alone cannot see a deterministic utf8_lower
    defect.  Freeze the expected utf8proc simple-mapping outputs for
    the caseful adversarial codepoints as literals; if a pyarrow
    upgrade (or a latent bug) changes them, this goes red instead of
    both pipeline sides silently agreeing on wrong tokens."""
    expected = {
        "HELLO World 123": "hello world 123",
        "AΣ": "aσ",        # simple mapping: NO final-sigma context rule
        "ΟΔΟΣ": "οδοσ",
        "İstanbul": "istanbul",  # dotted İ → plain i (no combining dot)
        "Iı İi": "iı ii",
        "STRASSE ß": "strasse ß",  # ß is already lowercase; no SS fold
        "ÀÉÎÕÜ": "àéîõü",
        "ЖУРНАЛ": "журнал",
        "日本語🚀": "日本語🚀",
    }
    for src, want in expected.items():
        assert sighash.ref_lower(src) == want, (src, sighash.ref_lower(src))


def test_phantom_null_offsets_masked():
    """The Arrow spec allows non-empty offset ranges under null validity
    bits (only monotonicity is required).  An IPC/foreign producer can
    therefore hand the kernel a null slot whose offsets span live bytes
    — `_string_parts` must mask those slots, not trust builder
    convention, or null rows emit phantom tokens where the reference
    returns NULL (ADVICE r5)."""
    data = b"hello world PHANTOM TOKENS here tail pad"
    # row0 = "hello world" (valid), row1 = null spanning live bytes,
    # row2 = "tail" (valid)
    offsets = np.array([0, 11, 32, 36], np.int32)
    validity = np.packbits(
        np.array([1, 0, 1], np.uint8), bitorder="little"
    )
    arr = pa.Array.from_buffers(
        pa.string(),
        3,
        [
            pa.py_buffer(validity.tobytes()),
            pa.py_buffer(offsets.tobytes()),
            pa.py_buffer(data),
        ],
        null_count=1,
    )
    canonical = pa.array(["hello world", None, "tail"], type=pa.string())

    _, counts = sighash.tokenize_hash_batch(arr)
    assert counts.tolist() == [2, 0, 1]
    th_p, c_p = sighash.tokenize_hash_batch(arr)
    th_c, c_c = sighash.tokenize_hash_batch(canonical)
    assert c_p.tolist() == c_c.tolist()
    assert th_p.tolist() == th_c.tolist()

    hp = sighash.hash_strings(arr)
    hc = sighash.hash_strings(canonical)
    assert hp.tolist() == hc.tolist()

    got_b, got_s = sighash.minhash_bands_batch(arr, N, A, B, BANDS, want_shingles=True)
    assert got_b[1] is None and got_s[1] is None
    want_b, want_s = sighash.minhash_bands_batch(
        canonical, N, A, B, BANDS, want_shingles=True
    )
    assert [None if x is None else list(x) for x in got_b] == [
        None if x is None else list(x) for x in want_b
    ]
    assert sighash.simhash_batch(arr) == sighash.simhash_batch(canonical)
