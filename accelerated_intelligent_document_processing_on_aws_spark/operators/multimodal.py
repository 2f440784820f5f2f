"""Multimodal columns: opaque binary payloads + typed metadata.

The reference renders PDF pages to images and resizes/binarizes them
(``lib/idp_common_pkg/idp_common/ocr/service.py:1189-1297``,
``image/__init__.py``).  In a Spark corpus pipeline the analogous data
model is an opaque ``binary`` column plus a metadata struct
(modality, mime, width/height/duration), processed by Arrow-batched
``mapInPandas`` kernels.

The Spark-side plumbing here is REAL and tested: schemas, batch
iteration, partitioning, and deterministic fake feature extraction.
Image decode is REAL for uncompressed formats — PPM/PGM/BMP parse,
aspect-preserving downscale, Otsu binarization, all pure numpy in
``kernel/image.py`` (round-3; closes the round-2 "decode stub" gap).
Compressed formats (PNG/JPEG) and audio/video codecs are not in this
container and stay behind the injectable-decoder seam: swapping in
PIL/ffmpeg on a real cluster changes one function, not the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        # md5 doubles as the cross-engine content fingerprint: it is the
        # one digest DuckDB also computes, so the driver oracle can
        # verify the payload plumbing byte-for-byte
        T.StructField("md5", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents corpus: the
    UTF-8 text bytes stand in for an opaque payload (real corpora carry
    image/audio bytes here; the plumbing is identical), modality cycles
    by doc_id.  Gives the multimodal path an oracle-checkable input."""
    from ..sources.tables import spread_scan

    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    # spread_scan (round 8): downstream consumers run per-payload
    # Python kernels; see synth_pgm_media
    return spread_scan(docs).select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.concat(modality, F.lit("/raw")).alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def decode_image(payload: bytes) -> "object":
    """Default image decoder: pure-numpy PPM/PGM/BMP parse
    (``kernel/image.py``).  Compressed formats still raise
    ``NotImplementedError`` — inject a PIL-backed decoder into
    :func:`extract_features` / :func:`image_stats` for those."""
    from ..kernel.image import decode_image_bytes

    return decode_image_bytes(payload)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: bytes of sha1 digest scaled to
    [0,1).  Stable across runs/partitions — lets the distributed
    plumbing be tested end-to-end without codecs."""
    digest = hashlib.sha1(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(
    media: DataFrame,
    dim: int = 8,
    decoder: Callable[[bytes], object] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary media payloads.

    ``decoder`` (if given) is called per payload before featurization —
    this is where PIL resize / frame sampling plugs in.  Without it, the
    deterministic fake feature keeps the pipeline testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"]
            if decoder is not None:
                payloads = payloads.map(lambda p: decoder(p))  # pragma: no cover
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p or b"")),
                    "sha1": pdf["payload"].map(
                        lambda p: hashlib.sha1(p or b"").hexdigest()
                    ),
                    "md5": pdf["payload"].map(
                        lambda p: hashlib.md5(p or b"").hexdigest()
                    ),
                    "feature": pdf["payload"].map(lambda p: _fake_feature(p, dim)),
                }
            )

    cols = media.select("media_id", "modality", "payload")
    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


def synth_pgm_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic grayscale P5 payloads from an id column: image
    ``(16 + id%16) × (12 + id%8)``, pixel(r,c) = ``(id·31 + 7r + 13c)
    mod 256``.  Real bytes through the real decoder, with stats a SQL
    oracle can recompute analytically — the driver-checkable input for
    the image decode path."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from ..kernel.image import encode_pgm

    @pandas_udf(T.BinaryType())
    def _mk(id_s: pd.Series) -> pd.Series:
        out = []
        for i in id_s:
            i = int(i)
            w, h = 16 + i % 16, 12 + i % 8
            r = np.arange(h, dtype=np.int64)[:, None]
            c = np.arange(w, dtype=np.int64)[None, :]
            out.append(encode_pgm(((i * 31 + 7 * r + 13 * c) % 256).astype(np.uint8)))
        return pd.Series(out)

    from ..sources.tables import spread_scan

    # spread_scan (round 8): the payload generator + downstream decode
    # kernel inherit scan parallelism; single-row-group fixture files
    # scan as 1-2 partitions (no-op for multi-partition input)
    return spread_scan(ids).select(
        F.col(id_col).cast("long").alias("media_id"), _mk(F.col(id_col)).alias("payload")
    )


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_gray", T.DoubleType()),
        T.StructField("otsu_t", T.IntegerType()),
        T.StructField("ink_ratio", T.DoubleType()),
        T.StructField("resized_w", T.IntegerType()),
        T.StructField("resized_h", T.IntegerType()),
    ]
)


def image_stats(
    media: DataFrame,
    max_side: int = 512,
    decoder: Callable[[bytes], object] | None = None,
) -> DataFrame:
    """Decode → grayscale → Otsu binarize → aspect-preserving downscale,
    reporting per-image stats — the Spark form of the reference's image
    preprocessing step (``image/__init__.py:14-174``: resize never
    upscales; binarization separates ink from paper).

    The default decoder handles uncompressed PPM/PGM/BMP in pure numpy;
    pass ``decoder`` for compressed formats.  Runs as ``mapInPandas`` so
    each Arrow batch decodes in one Python round-trip; undecodable
    payloads raise (corrupt input must fail the task loudly, matching
    the engine's no-silent-drop policy)."""
    from ..kernel import image as img

    use = decoder or img.decode_image_bytes

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = np.asarray(use(payload))
                gray = img.to_grayscale(arr)
                h, w = gray.shape
                t = img.otsu_threshold(gray)
                ink = float((gray <= t).mean())
                small = img.resize_max_side(gray, max_side)
                rows.append(
                    (
                        mid,
                        w,
                        h,
                        float(gray.mean()),
                        t,
                        ink,
                        small.shape[1],
                        small.shape[0],
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_STATS_SCHEMA
    )


def synth_wav_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 16-bit PCM WAV payloads from an id column:
    ``256 + id%128`` samples at 8 kHz, sample(i) = ``(id·7 + 13i) mod
    2003 − 1001``.  Real RIFF bytes through the real decoder, features a
    SQL oracle recomputes analytically."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from ..kernel.audio import encode_wav_pcm16

    @pandas_udf(T.BinaryType())
    def _mk(id_s: pd.Series) -> pd.Series:
        out = []
        for i in id_s:
            i = int(i)
            n = 256 + i % 128
            idx = np.arange(n, dtype=np.int64)
            samples = ((i * 7 + 13 * idx) % 2003 - 1001).astype("<i2")
            out.append(encode_wav_pcm16(samples, 8000))
        return pd.Series(out)

    from ..sources.tables import spread_scan

    # spread_scan (round 8): the payload generator + downstream decode
    # kernel inherit scan parallelism; single-row-group fixture files
    # scan as 1-2 partitions (no-op for multi-partition input)
    return spread_scan(ids).select(
        F.col(id_col).cast("long").alias("media_id"), _mk(F.col(id_col)).alias("payload")
    )


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def audio_stats(
    media: DataFrame, decoder: Callable[[bytes], tuple] | None = None
) -> DataFrame:
    """Decode WAV payloads and report per-clip features (duration, RMS,
    peak, zero crossings) — the audio leg of the multimodal path, real
    for RIFF/PCM via ``kernel/audio.py``; pass ``decoder`` returning
    ``(samples, sample_rate)`` for compressed formats."""
    from ..kernel import audio as aud

    use = decoder or aud.decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, sr = use(payload)
                f = aud.audio_features(samples, sr)
                rows.append(
                    (
                        mid,
                        f["n_samples"],
                        f["duration_ms"],
                        f["rms"],
                        f["peak"],
                        f["zero_crossings"],
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_STATS_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=AUDIO_STATS_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms)
    via ``sequence``+``explode`` — the decode of each frame happens in
    the feature kernel; the PLAN (which frames, how many rows) is pure
    Catalyst and fully testable."""
    return (
        media.where(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for tests."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randint(64, 512)))
        rows.append(
            (
                i,
                modality,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                payload,
                640 if modality == "image" else None,
                480 if modality == "image" else None,
                rng.randint(1000, 10000) if modality != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
