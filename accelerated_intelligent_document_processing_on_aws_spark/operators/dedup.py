"""Deduplication operators for large-scale corpus curation.

Everything here is pure Catalyst expression work (whole-stage codegen,
zero Python) so it scales to 10^9-document corpora:

- exact dedup: hash-groupBy on content (or md5 digest).
- MinHash + LSH: shingle → K minhash signature (one ``aggregate`` /
  ``zip_with least`` pass, no explode of the hash space) → band →
  bucket self-join → candidate pairs → exact Jaccard verify.
- SimHash: 64-bit sign-aggregated token-hash fingerprint + banded
  hamming candidate join.
- n-gram Jaccard: set overlap of distinct token shingles per pair.
- embedding near-dup: cosine over candidate pairs (blocked or brute).

The band/bucket joins shuffle only (band_idx, band_hash, doc_id) —
never the document text — so shuffle volume is O(docs × bands × 16B)
regardless of corpus byte size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_sim

_MAX_LONG = 9223372036854775807


def tokens(col: Column | str, lowercase: bool = True) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c) if lowercase else c
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (distinct)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(tok) - n, F.lit(0)))
    grams = F.when(F.size(tok) < n, F.array(F.array_join(tok, " "))).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(tok, i + 1, n), " "))
    )
    return F.array_distinct(grams)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact-content duplicate groups: (content_hash, n_docs, keep_id).

    ``keep_id`` = min id is the canonical representative; groups with
    ``n_docs > 1`` are duplicates.  Shuffles (hash, id) only."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per distinct content."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(sh: Column, num_hashes: int = 32) -> Column:
    """K-wide minhash signature in ONE pass over the shingle array.

    h_i(s) = xxhash64(s, seed=i); signature[i] = min over shingles.
    Implemented as ``aggregate(shingles, [MAX]*K, zip_with least)`` —
    stays in codegen, no shuffle, no UDF."""
    init = F.array(*[F.lit(_MAX_LONG).cast("long") for _ in range(num_hashes)])
    return F.aggregate(
        sh,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.array(*[F.xxhash64(s, F.lit(i)) for i in range(num_hashes)]),
            lambda a, b: F.least(a, b),
        ),
    )


def minhash_bands(sig: Column, bands: int, rows: int) -> Column:
    """Split a signature into ``bands`` hashes of ``rows`` values each:
    array<struct<band_idx:int, band_hash:long>>."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band_idx"),
            F.xxhash64(
                F.array_join(
                    F.transform(F.slice(sig, b * rows + 1, rows), lambda v: v.cast("string")),
                    ",",
                )
            ).alias("band_hash"),
        ),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH with exact-Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard ≥ threshold.  Flow: signature (narrow) → explode bands →
    self-join on (band_idx, band_hash) → distinct candidate pairs →
    verify on the true shingle sets of just the candidates.

    ``max_bucket_size`` drops band buckets above the cap before pair
    generation — a bucket that big means the band is non-discriminative
    for this corpus (the "stop-shingle" effect), and its O(bucket²) pair
    blowup would dominate the job at scale; near-dup pairs in a dropped
    bucket still collide in the other, more selective bands."""
    rows = num_hashes // bands
    sh = docs.select(
        F.col(id_col).alias("id"),
        shingles(tokens(text_col), shingle_n).alias("sh"),
    ).where(F.size("sh") > 0)
    sh.cache()
    sig = sh.select("id", minhash_signature(F.col("sh"), num_hashes).alias("sig"))
    banded = sig.select(
        "id", F.explode(minhash_bands(F.col("sig"), bands, rows)).alias("b")
    ).select("id", "b.band_idx", "b.band_hash")
    if max_bucket_size is not None:
        small = (
            banded.groupBy("band_idx", "band_hash")
            .count()
            .where(F.col("count") <= max_bucket_size)
            .drop("count")
        )
        banded = banded.join(small, ["band_idx", "band_hash"])
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    verified = (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(tok: Column) -> Column:
    """64-bit SimHash of a token array, fully in Catalyst.

    Per token: xxhash64 → per bit ±1 vote; fingerprint bit i set when
    the summed vote is positive."""
    bit_votes = F.aggregate(
        tok,
        F.array(*[F.lit(0).cast("long") for _ in range(64)]),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) == 1, 1
                    )
                    .otherwise(-1)
                    .cast("long")
                    for i in range(64)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    packed = None
    for i in range(64):
        val = (1 << i) if i < 63 else -(1 << 63)  # bit 63 = sign bit of long
        bit = F.when(F.element_at(bit_votes, i + 1) > 0, F.lit(val).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        packed = bit if packed is None else packed.bitwiseOR(bit)
    return packed


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash banding: two docs within hamming k of
    each other share at least one of k+1 16-bit chunks exactly (pigeonhole),
    so join on chunk equality then verify the true hamming distance."""
    fp = docs.select(
        F.col(id_col).alias("id"), simhash64(tokens(text_col)).alias("fp")
    )
    chunks = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("chunk_idx"),
                        F.shiftright(F.col("fp"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "fp", "c.chunk_idx", "c.chunk")
    cand = (
        chunks.alias("l")
        .join(
            chunks.alias("r"),
            (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.fp").alias("fp_a"),
            F.col("r.fp").alias("fp_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard & embedding near-dup
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact token-n-gram Jaccard for every pair within a blocking key
    (pairwise work is bounded per block — the scale-path is to block on
    an LSH band; this is the verify kernel)."""
    t = docs.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        shingles(tokens(text_col), n).alias("sh"),
    )
    j = (
        t.alias("l")
        .join(t.alias("r"), (F.col("l.blk") == F.col("r.blk")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(
                F.size(F.array_intersect("l.sh", "r.sh"))
                / F.size(F.array_union("l.sh", "r.sh")),
                6,
            ).alias("jaccard"),
        )
    )
    return j.where(F.col("jaccard") >= threshold)


def embedding_near_dup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ≥ threshold.

    With ``block_col`` (e.g. an LSH bucket or cluster label) the join is
    block-local; without it, brute-force — correct baseline for small
    dims, replaced by :mod:`.similarity` LSH at scale."""
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    t = emb.select(*cols)
    cond = F.col("l.id") < F.col("r.id")
    if block_col:
        cond = cond & (F.col("l.blk") == F.col("r.blk"))
    return (
        t.alias("l")
        .join(t.alias("r"), cond)
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(cosine_sim(F.col("l.v"), F.col("r.v")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
