"""Arrow-native vectorized signature hashing for the dedup sketches.

Round-4 profiling showed the MinHash/SimHash signature pandas UDFs
(`operators/dedup.py`) bound by per-document Python work: tokenize
(`str.split`), per-shingle string join, and one `blake2b` call per
distinct shingle — the numpy remix/min that follows was already
vectorized.  This module removes the per-document Python loop entirely:

- tokenization runs in Arrow C++ (`utf8_lower` + `utf8_split_whitespace`)
  over the whole batch;
- token hashing is a batched polynomial hash over the flat UTF-8 byte
  buffer (power-table + ``np.add.reduceat`` segment sums, murmur3
  fmix64 finalizer) — zero per-string Python;
- word-n-gram (shingle) hashes derive from the token hashes by a
  Horner fold over ``n`` shifted views — shingle STRINGS are never
  materialized (a token tuple determines the joined string, so
  distinct-by-gram-hash == distinct-by-shingle-string w.h.p.);
- per-document distinct/sort, the K-minhash ``min``, the FNV band fold,
  and the SimHash ±TF bit votes are all segment operations
  (``lexsort`` + boundary masks + ``reduceat``) over the flat batch.

The hash family therefore changes from blake2b-64 to
``fmix64(polyhash)`` — both are engine-internal (the production sketch
queries are rows-only; cross-engine sketch semantics are separately
hash-checked by the md5 variants in ``plans/corpus_queries.py``).  The
per-document REFERENCE implementation of the same family lives below
(``ref_*``) and the equivalence gate (``tests/test_sighash_equiv.py``)
asserts the vectorized batch path reproduces it exactly, the same
pattern as the HTML tokenizer's find-dispatch gate.  Lowercase
semantics are ENGINE-defined (utf8proc simple mapping via
``pc.utf8_lower``; see :func:`ref_lower`) — the reference evaluates the
same mapping per document, so the gate covers final-sigma/dotted-İ
codepoints; split/hash/sketch stages are independently reimplemented
in pure Python.

Reference parity target: the reference pipeline's per-document hashing
(idp_common/classification/service.py page-hash dispatch) is a
correctness analog only; no code shared.

Scale note: everything here is per-Arrow-batch (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``).  ``tokenize_hash_
batch`` additionally sub-batches by ROW GROUPS of at most
``_CHUNK_ROW_BYTES`` flat text bytes (temporaries are a constant
multiple of the sub-batch byte volume, so multi-MB documents cannot
multiply into tens of GB), and ``hash_strings`` sub-batches its
per-byte temporaries at ``_CHUNK_BYTES``.  Honest floor: one single
string/document is never split, so the true peak is
O(max(chunk bound, largest single document)).
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MAX_LONG = 9223372036854775807
_M64 = (1 << 64) - 1

P = np.uint64(1099511628211)  # FNV prime (odd): polyhash base
_FMIX1 = np.uint64(0xFF51AFD7ED558CCD)
_FMIX2 = np.uint64(0xC4CEB9FE1A85EC53)
FNV_OFF = np.uint64(14695981039346656037)
FNV_PRIME = np.uint64(1099511628211)

_CHUNK_BYTES = 1 << 22  # max flat string bytes hashed per sub-batch
_CHUNK_ROW_BYTES = 1 << 26  # max flat text bytes tokenized per row group

# packbits→uint64 views and the raw offset/data buffers handed to
# pa.Array.from_buffers assume native little-endian layout; fail loudly
# on an exotic big-endian executor instead of producing corrupt arrays
assert sys.byteorder == "little", "sighash kernel requires little-endian"


# ---------------------------------------------------------------------------
# hash family — vectorized + scalar reference
# ---------------------------------------------------------------------------

def fmix64(h: np.ndarray) -> np.ndarray:
    """Murmur3 64-bit finalizer, vectorized over uint64 (wraps mod 2^64)."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(33)
    h *= _FMIX1
    h ^= h >> np.uint64(33)
    h *= _FMIX2
    h ^= h >> np.uint64(33)
    return h


def ref_fmix64(h: int) -> int:
    h &= _M64
    h ^= h >> 33
    h = (h * int(_FMIX1)) & _M64
    h ^= h >> 33
    h = (h * int(_FMIX2)) & _M64
    h ^= h >> 33
    return h


def ref_token_hash(tok: str) -> int:
    """Horner polyhash over UTF-8 bytes (b+1 so trailing NULs count),
    fmix64-finalized.  The scalar definition the batch path must match."""
    h = 0
    for b in tok.encode("utf-8"):
        h = (h * int(P) + b + 1) & _M64
    return ref_fmix64(h)


def ref_gram_hash(token_hashes: list[int]) -> int:
    """Horner fold of consecutive token hashes, fmix64-finalized."""
    h = 0
    for t in token_hashes:
        h = (h * int(P) + t) & _M64
    return ref_fmix64(h)


def remix_params(num_hashes: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """The universal-remix (a_i h + b_i) coefficients — generation kept
    IDENTICAL to the round-1 UDFs so seeds stay comparable."""
    rng = np.random.RandomState(seed)
    A = (
        rng.randint(1, _MAX_LONG, size=num_hashes).astype(np.uint64) << np.uint64(1)
    ) | np.uint64(1)
    B = rng.randint(0, _MAX_LONG, size=num_hashes).astype(np.uint64)
    return A, B


# ---------------------------------------------------------------------------
# batched string hashing
# ---------------------------------------------------------------------------

def _string_parts(sa: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat uint8 data, starts, ends) of a string/large_string array.

    Null slots are explicitly masked to empty ranges (``end = start``):
    the Arrow spec allows ARBITRARY offset values under null validity
    bits, so an array from IPC / a foreign producer may carry non-empty
    offset ranges for null rows.  Trusting builder convention there
    would emit phantom tokens for null rows where the reference path
    returns NULL (regression-pinned in tests/test_sighash_equiv.py).
    """
    buf_off, buf_dat = sa.buffers()[1], sa.buffers()[2]
    off_t = np.int64 if pa.types.is_large_string(sa.type) else np.int32
    offs = np.frombuffer(buf_off, dtype=off_t)
    starts = offs[sa.offset : sa.offset + len(sa)].astype(np.int64)
    ends = offs[sa.offset + 1 : sa.offset + 1 + len(sa)].astype(np.int64)
    if sa.null_count:
        valid = np.asarray(sa.is_valid())
        ends = np.where(valid, ends, starts)
    data = (
        np.frombuffer(buf_dat, dtype=np.uint8)
        if buf_dat is not None
        else np.empty(0, np.uint8)
    )
    return data, starts, ends


def hash_strings(sa: pa.Array) -> np.ndarray:
    """uint64 hash per string (``ref_token_hash`` semantics), vectorized:
    per-byte contributions ``(b+1) * P^(len-1-pos)`` summed per string
    with ``np.add.reduceat``, then fmix64.  Sub-batched so temporaries
    stay under ~32x ``_CHUNK_BYTES``."""
    data, starts, ends = _string_parts(sa)
    n = starts.size
    raw = np.zeros(n, np.uint64)
    lens = ends - starts
    sel = np.flatnonzero(lens > 0)
    if sel.size:
        ls = lens[sel]
        maxlen = int(ls.max())
        pows = np.empty(maxlen, np.uint64)
        pows[0] = np.uint64(1)
        if maxlen > 1:
            np.multiply.accumulate(np.full(maxlen - 1, P, np.uint64), out=pows[1:])
        csum = np.cumsum(ls)
        lo = 0
        while lo < sel.size:
            hi = int(np.searchsorted(csum, (csum[lo - 1] if lo else 0) + _CHUNK_BYTES))
            hi = max(hi, lo + 1)
            ss, ll = sel[lo:hi], ls[lo:hi]
            total = int(ll.sum())
            seg = np.concatenate(([0], np.cumsum(ll)[:-1]))
            # one repeat + one shared arange instead of three repeats
            # (round 8: np.repeat over flat-byte-sized arrays was ~40%
            # of kernel time; byte_pos[k] = k + (start_i - seg_i),
            # exps[k] = (seg_i + len_i - 1) - k for k in segment i)
            flat = np.arange(total, dtype=np.int64)
            byte_pos = flat + np.repeat(starts[ss] - seg, ll)
            exps = np.repeat(seg + ll - 1, ll) - flat
            contrib = (data[byte_pos].astype(np.uint64) + np.uint64(1)) * pows[exps]
            raw[ss] = np.add.reduceat(contrib, seg)
            lo = hi
    return fmix64(raw)


# Unicode whitespace at the UTF-8 byte level — EXACTLY Python
# str.isspace()/str.split() semantics.  ASCII singles (incl. the
# \x1c-\x1f file separators Python splits on), then the multi-byte
# sequences.  Lead bytes 0xC2/0xE1/0xE2/0xE3 can never be continuation
# bytes, so the shifted-comparison matches cannot fire inside another
# character.
_WS1 = np.zeros(256, bool)
for _b in (9, 10, 11, 12, 13, 28, 29, 30, 31, 32):
    _WS1[_b] = True


def _whitespace_mask(data: np.ndarray) -> np.ndarray:
    """Boolean mask over a UTF-8 byte buffer: True for every byte of a
    whitespace character (Python str.split set)."""
    ws = _WS1[data]
    if data.size >= 2:
        b0, b1 = data[:-1], data[1:]
        m2 = (b0 == 0xC2) & ((b1 == 0x85) | (b1 == 0xA0))  # U+0085, U+00A0
        ws[:-1] |= m2
        ws[1:] |= m2
    if data.size >= 3:
        b0, b1, b2 = data[:-2], data[1:-1], data[2:]
        m3 = (b0 == 0xE1) & (b1 == 0x9A) & (b2 == 0x80)  # U+1680
        m3 |= (
            (b0 == 0xE2)
            & (b1 == 0x80)
            & (((b2 >= 0x80) & (b2 <= 0x8A)) | (b2 == 0xA8) | (b2 == 0xA9) | (b2 == 0xAF))
        )  # U+2000-200A, U+2028, U+2029, U+202F
        m3 |= (b0 == 0xE2) & (b1 == 0x81) & (b2 == 0x9F)  # U+205F
        m3 |= (b0 == 0xE3) & (b1 == 0x80) & (b2 == 0x80)  # U+3000
        ws[:-2] |= m3
        ws[1:-1] |= m3
        ws[2:] |= m3
    return ws


def tokenize_hash_batch(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Row-group sub-batching wrapper around :func:`_tokenize_hash_core`:
    slices the batch so each group holds at most ``_CHUNK_ROW_BYTES``
    flat text bytes (one row is never split), keeping the core's
    temporaries — several int64 arrays proportional to the group's byte
    volume — bounded regardless of document size."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    nrows = len(texts)
    if nrows == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    _, rstarts, rends = _string_parts(texts)
    rbytes = rends - rstarts
    total = int(rbytes.sum())
    if total <= _CHUNK_ROW_BYTES:
        return _tokenize_hash_core(texts)
    cuts = [0]
    acc = 0
    for i in range(nrows):
        if acc + rbytes[i] > _CHUNK_ROW_BYTES and cuts[-1] != i:
            cuts.append(i)
            acc = 0
        acc += int(rbytes[i])
    cuts.append(nrows)
    ths, cnts = [], []
    for a, b in zip(cuts[:-1], cuts[1:]):
        th, c = _tokenize_hash_core(texts.slice(a, b - a))
        ths.append(th)
        cnts.append(c)
    return np.concatenate(ths), np.concatenate(cnts)


def _tokenize_hash_core(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Batch → (flat uint64 token hashes in row order, int64 per-row
    token counts).  Tokens: unicode lower (Arrow C++), whitespace split
    with PYTHON str.split() semantics.  Null rows get count 0.

    The split is a vectorized numpy pass over the lowered UTF-8 byte
    buffer — NOT Arrow's ``utf8_split_whitespace``: pyarrow 16.1's
    split kernel returns wrong boundaries on some inputs depending on
    the (allocator-state-dependent) alignment of the utf8_lower output
    buffer — observed as a trailing ``\\r`` NOT being split, same input
    + same call, different heap history (regression-pinned in
    tests/test_sighash_equiv.py::test_arrow_split_bug_sequence).  The
    byte-level splitter is deterministic, and as a bonus matches Python
    semantics exactly (Arrow's Unicode White_Space excluded
    \\x1c-\\x1f).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.utf8_lower(texts)
    if isinstance(low, pa.ChunkedArray):
        low = low.combine_chunks()
    nrows = len(low)
    if nrows == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    data, starts, ends = _string_parts(low)
    if starts.size == 0 or ends[-1] == starts[0]:
        return np.empty(0, np.uint64), np.zeros(nrows, np.int64)
    lo, hi = int(starts[0]), int(ends[-1])
    seg = data[lo:hi]
    # rows are [starts[i], ends[i]) byte ranges; bytes outside any row
    # (possible for sliced inputs) are forced to "whitespace" so no
    # token can span a row boundary or garbage gap.  Fast path (round
    # 8): a full combine_chunks batch has ADJACENT rows (each row ends
    # where the next starts) — every byte in [lo, hi) is inside some
    # row and the O(bytes) coverage cumsum is skipped.
    if starts.size == 1 or bool(np.array_equal(starts[1:], ends[:-1])):
        nonws = ~_whitespace_mask(seg)
    else:
        delta = np.zeros(hi - lo + 1, np.int64)
        np.add.at(delta, starts - lo, 1)
        np.add.at(delta, ends - lo, -1)
        inside = np.cumsum(delta[:-1]) > 0
        nonws = inside & ~_whitespace_mask(seg)
    # explicit row-start barriers: adjacent rows share a byte boundary
    # (end[i] == start[i+1]), so without these a token would run across
    # two rows whose bytes abut with no whitespace between them
    row_start = np.zeros(hi - lo, bool)
    nz = starts[starts < ends] - lo
    row_start[nz] = True
    prev = np.empty_like(nonws)
    prev[0] = False
    prev[1:] = nonws[:-1]
    tok_start = np.flatnonzero(nonws & (~prev | row_start))
    nxt = np.empty_like(nonws)
    nxt[-1] = False
    nxt[:-1] = nonws[1:]
    nxt_row_start = np.zeros(hi - lo, bool)
    nxt_row_start[:-1] = row_start[1:]
    tok_end = np.flatnonzero(nonws & (~nxt | nxt_row_start)) + 1
    ntok = tok_start.size
    if ntok == 0:
        return np.empty(0, np.uint64), np.zeros(nrows, np.int64)
    rid = np.searchsorted(ends, tok_start + lo, side="right")
    counts = np.bincount(rid, minlength=nrows).astype(np.int64)
    # compact the token bytes into a fresh Arrow StringArray so the
    # Zipf-vocabulary dedup can run in Arrow C++ (dictionary_encode):
    # millions of token INSTANCES, a few thousand DISTINCT strings —
    # hash only the vocabulary, gather per instance (the batch-wide
    # analog of the old per-batch memo dict)
    tlens = tok_end - tok_start
    total = int(tlens.sum())
    off64 = np.zeros(ntok + 1, np.int64)
    np.cumsum(tlens, out=off64[1:])
    # single repeat: source byte k of the flat token buffer sits at
    # seg[k + (tok_start_i - off_i)] for k in token i's range
    buf = seg[
        np.arange(total, dtype=np.int64)
        + np.repeat(tok_start - off64[:-1], tlens)
    ]
    if total < (1 << 31):
        sa = pa.Array.from_buffers(
            pa.utf8(),
            ntok,
            [
                None,
                pa.py_buffer(off64.astype(np.int32).tobytes()),
                pa.py_buffer(buf.tobytes()),
            ],
        )
    else:  # pathological >2GB token bytes in one batch: 64-bit offsets
        sa = pa.Array.from_buffers(
            pa.large_utf8(),
            ntok,
            [None, pa.py_buffer(off64.tobytes()), pa.py_buffer(buf.tobytes())],
        )
    denc = sa.dictionary_encode()
    codes = np.asarray(denc.indices, dtype=np.int64)
    uh = hash_strings(denc.dictionary)
    th = uh[codes]
    return th, counts


# ---------------------------------------------------------------------------
# grams / distinct / signatures
# ---------------------------------------------------------------------------

def gram_hashes_batch(
    th: np.ndarray, counts: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Word-n-gram hashes per row (flat, row order).  Rows with
    ``0 < count < n`` yield ONE whole-row gram (matching
    ``shingles()``/``_py_shingle_set`` semantics); empty rows yield 0."""
    nrows = counts.size
    starts_d = np.concatenate(([0], np.cumsum(counts)[:-1]))
    out_counts = np.where(
        counts >= n, counts - n + 1, np.where(counts > 0, 1, 0)
    ).astype(np.int64)
    out_starts = np.concatenate(([0], np.cumsum(out_counts)[:-1]))
    out = np.empty(int(out_counts.sum()), np.uint64)
    total = th.size
    if total:
        # one threshold repeat instead of three row-sized repeats
        # (round 8): token k of row i starts a gram iff
        # k <= starts_d[i] + counts[i] - n — rows with counts < n give
        # a threshold below their own start, so the (counts >= n)
        # condition folds in for free.  Row ids of the (sorted)
        # surviving indices come back via one searchsorted.
        csum = starts_d + counts  # = row end offsets in token space
        thresh = np.repeat(csum - n, counts)
        idx = np.flatnonzero(np.arange(total, dtype=np.int64) <= thresh)
        if idx.size:
            acc = np.zeros(idx.size, np.uint64)
            for k in range(n):
                acc = acc * P + th[idx + k]
            rid = np.searchsorted(csum, idx, side="right")
            out[out_starts[rid] + (idx - starts_d[rid])] = fmix64(acc)
    for c in range(1, n):
        rows = np.flatnonzero(counts == c)
        if rows.size:
            mat = th[starts_d[rows][:, None] + np.arange(c)]
            acc = np.zeros(rows.size, np.uint64)
            for k in range(c):
                acc = acc * P + mat[:, k]
            out[out_starts[rows]] = fmix64(acc)
    return out, out_counts


def dedup_sorted_per_row(
    vals: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row distinct+ascending-sort of a flat segmented uint64 array
    — :func:`_weighted_distinct_per_row` minus the multiplicity vector
    (one shared segmented-distinct core, not two near-copies)."""
    v2, _, c2 = _weighted_distinct_per_row(vals, counts)
    return v2, c2


def _weighted_distinct_per_row(
    vals: np.ndarray, counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(distinct vals, per-distinct multiplicity, per-row distinct
    counts) — the SimHash TF weights."""
    nrows = counts.size
    rid = np.repeat(np.arange(nrows, dtype=np.int64), counts)
    order = np.lexsort((vals, rid))
    v, r = vals[order], rid[order]
    first = np.ones(v.size, bool)
    if v.size:
        first[1:] = (v[1:] != v[:-1]) | (r[1:] != r[:-1])
    gid = np.cumsum(first) - 1
    w = np.bincount(gid).astype(np.int64) if v.size else np.empty(0, np.int64)
    v2, r2 = v[first], r[first]
    return v2, w, np.bincount(r2, minlength=nrows).astype(np.int64)


def minhash_sig_bands(
    grams: np.ndarray,
    gcounts: np.ndarray,
    A: np.ndarray,
    B: np.ndarray,
    bands: int,
) -> tuple[np.ndarray, np.ndarray]:
    """(band hashes (m, bands) int64, row index of each m) for rows with
    >= 1 gram.  sig_k = min over row grams of (g*A_k + B_k); band hash =
    FNV-1a fold of the band's rows — constants identical to the round-1
    UDFs."""
    num_hashes = A.size
    rows_per_band = num_hashes // bands
    sel = np.flatnonzero(gcounts > 0)
    if not sel.size:
        return np.empty((0, bands), np.int64), sel
    gs = np.concatenate(([0], np.cumsum(gcounts)[:-1]))[sel]
    sig = np.empty((sel.size, num_hashes), np.uint64)
    for k in range(num_hashes):
        sig[:, k] = np.minimum.reduceat(grams * A[k] + B[k], gs)
    s3 = sig.reshape(sel.size, bands, rows_per_band)
    bh = np.full((sel.size, bands), FNV_OFF, np.uint64)
    for r in range(rows_per_band):
        bh = (bh ^ s3[:, :, r]) * FNV_PRIME
    return bh.view(np.int64), sel


def minhash_bands_batch(
    texts: pa.Array,
    shingle_n: int,
    A: np.ndarray,
    B: np.ndarray,
    bands: int,
    want_shingles: bool = False,
) -> tuple[list, list]:
    """Full batch pipeline: texts → (bands per row | None,
    sorted-distinct gram hashes per row as int64 | None)."""
    th, counts = tokenize_hash_batch(texts)
    grams, gcounts = gram_hashes_batch(th, counts, shingle_n)
    v2, c2 = dedup_sorted_per_row(grams, gcounts)
    bh, sel = minhash_sig_bands(v2, c2, A, B, bands)
    nrows = counts.size
    out_b: list = [None] * nrows
    for i, row in enumerate(sel):
        out_b[row] = bh[i]
    out_s: list = [None] * nrows
    if want_shingles:
        starts2 = np.concatenate(([0], np.cumsum(c2)[:-1]))
        sh64 = v2.view(np.int64)
        for row in sel:
            out_s[row] = sh64[starts2[row] : starts2[row] + c2[row]]
    return out_b, out_s


def simhash_batch(texts: pa.Array) -> list:
    """texts → 64-bit SimHash per row (python int, None for token-less
    rows).  TF-weighted ±1 votes per bit; bit set when vote sum > 0 —
    identical semantics to the round-1 UDF, new base hash family.

    Votes are 64 weighted ``np.bincount`` passes over the flat distinct
    (row, token-hash) entries — measured ~4× faster than materializing
    the (entries × 64) unpacked-bit matrix with ``add.reduceat``, and
    O(entries) peak memory instead of O(entries × 64)."""
    th, counts = tokenize_hash_batch(texts)
    v2, w, c2 = _weighted_distinct_per_row(th, counts)
    nrows = counts.size
    out: list = [None] * nrows
    sel = np.flatnonzero(c2 > 0)
    if not sel.size:
        return out
    rid2 = np.repeat(np.arange(nrows, dtype=np.int64), c2)
    wf = w.astype(np.float64)
    # exact: per-row weight totals stay far below 2^53
    wtot = np.bincount(rid2, weights=wf, minlength=nrows)
    fp_bits = np.zeros((nrows, 64), bool)
    for j in range(64):
        bj = ((v2 >> np.uint64(j)) & np.uint64(1)).astype(np.float64)
        ones = np.bincount(rid2, weights=wf * bj, minlength=nrows)
        fp_bits[:, j] = (2.0 * ones - wtot) > 0
    packed = np.packbits(fp_bits, axis=1, bitorder="little").view(np.uint64)[:, 0]
    for row in sel:
        p = int(packed[row])
        out[row] = p - (1 << 64) if p >= (1 << 63) else p
    return out


# ---------------------------------------------------------------------------
# per-document reference pipeline (the equivalence-gate oracle)
# ---------------------------------------------------------------------------

def ref_lower(text: str) -> str:
    """The engine's lowercase semantics: utf8proc SIMPLE case mapping
    (what ``pc.utf8_lower`` applies per codepoint).  This differs from
    Python ``str.lower()`` on context-sensitive/full mappings — Greek
    final sigma ('AΣ' → 'aσ', Python gives 'aς') and Turkish 'İ'
    (→ 'i', Python gives 'i' + combining dot).  The reference pipeline
    deliberately adopts the ENGINE's definition (evaluated per document
    through the same trusted single-codepoint C++ mapping, verified
    correct during the split-kernel bug investigation) so the
    equivalence gate covers these codepoints instead of excluding
    them; everything downstream of lowercase — split, hashing, sketch
    algebra — remains independently reimplemented in pure Python."""
    return pc.utf8_lower(pa.array([text], type=pa.string()))[0].as_py()


def ref_tokens(text: str | None) -> list[str]:
    return ref_lower(text).split() if text else []


def ref_gram_hash_set(text: str | None, n: int) -> list[int]:
    """Sorted distinct gram hashes (uint64 ints) of one document."""
    ths = [ref_token_hash(t) for t in ref_tokens(text)]
    if not ths:
        return []
    if len(ths) < n:
        grams = {ref_gram_hash(ths)}
    else:
        grams = {ref_gram_hash(ths[i : i + n]) for i in range(len(ths) - n + 1)}
    return sorted(grams)


def ref_minhash_bands_doc(
    text: str | None, n: int, A: np.ndarray, B: np.ndarray, bands: int
) -> list[int] | None:
    grams = ref_gram_hash_set(text, n)
    if not grams:
        return None
    num_hashes = A.size
    rows_per_band = num_hashes // bands
    sig = [
        min((g * int(A[k]) + int(B[k])) & _M64 for g in grams)
        for k in range(num_hashes)
    ]
    out = []
    for b in range(bands):
        h = int(FNV_OFF)
        for r in range(rows_per_band):
            h = ((h ^ sig[b * rows_per_band + r]) * int(FNV_PRIME)) & _M64
        out.append(h - (1 << 64) if h >= (1 << 63) else h)
    return out


def ref_simhash_doc(text: str | None) -> int | None:
    from collections import Counter

    counts = Counter(ref_tokens(text))
    if not counts:
        return None
    votes = [0] * 64
    for tok, w in counts.items():
        h = ref_token_hash(tok)
        for j in range(64):
            votes[j] += w if (h >> j) & 1 else -w
    fp = sum(1 << j for j in range(64) if votes[j] > 0)
    return fp - (1 << 64) if fp >= (1 << 63) else fp
