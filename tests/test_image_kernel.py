"""Pure-numpy image codec: decode, resize (never upscale), Otsu."""

import numpy as np
import pytest

from accelerated_intelligent_document_processing_on_aws_spark.kernel import image as img


class TestCodec:
    def test_pgm_round_trip(self):
        a = (np.arange(12 * 16) % 256).astype(np.uint8).reshape(12, 16)
        got = img.decode_ppm(img.encode_pgm(a))
        assert got.shape == (12, 16)
        assert np.array_equal(got, a)

    def test_ppm_round_trip(self):
        a = (np.arange(6 * 4 * 3) % 256).astype(np.uint8).reshape(6, 4, 3)
        got = img.decode_ppm(img.encode_ppm(a))
        assert got.shape == (6, 4, 3)
        assert np.array_equal(got, a)

    def test_pnm_header_comments_and_whitespace(self):
        a = np.full((2, 3), 7, np.uint8)
        payload = b"P5\n# a comment\n 3  2\n255\n" + a.tobytes()
        assert np.array_equal(img.decode_ppm(payload), a)

    def test_bmp_bottom_up_padded(self):
        # 3x2 24-bit BMP, stride padded 9→12; rows stored bottom-up BGR
        w, h = 3, 2
        rgb = np.array(
            [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
             [[10, 20, 30], [40, 50, 60], [70, 80, 90]]], np.uint8
        )
        stride = (w * 3 + 3) & ~3
        body = b""
        for r in range(h - 1, -1, -1):  # bottom-up
            row = rgb[r][:, ::-1].tobytes()  # BGR
            body += row + b"\x00" * (stride - len(row))
        header = (
            b"BM" + (54 + len(body)).to_bytes(4, "little") + b"\x00" * 4
            + (54).to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little") + h.to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
            + b"\x00" * 16
        )
        got = img.decode_bmp(header + body)
        assert np.array_equal(got, rgb)

    def test_sniff_and_dispatch(self):
        a = np.zeros((2, 2), np.uint8)
        assert img.sniff_image_format(img.encode_pgm(a)) == "pgm"
        assert img.sniff_image_format(b"\x89PNG") is None
        with pytest.raises(NotImplementedError):
            img.decode_image_bytes(b"\x89PNG\r\n")


class TestPreprocess:
    def test_resize_never_upscales(self):
        a = np.zeros((10, 20), np.uint8)
        assert img.resize_max_side(a, 100) is a  # unchanged, same object
        small = img.resize_max_side(a, 10)
        assert small.shape == (5, 10)  # aspect preserved

    def test_resize_values_nearest(self):
        a = np.arange(16, dtype=np.uint8).reshape(4, 4)
        got = img.resize_max_side(a, 2)
        assert got.shape == (2, 2)
        assert np.array_equal(got, a[[0, 2]][:, [0, 2]])

    def test_grayscale_luma(self):
        rgb = np.array([[[255, 255, 255], [0, 0, 0], [255, 0, 0]]], np.uint8)
        g = img.to_grayscale(rgb)
        assert g[0, 0] == (77 * 255 + 150 * 255 + 29 * 255) >> 8
        assert g[0, 1] == 0
        assert g[0, 2] == (77 * 255) >> 8

    def test_otsu_bimodal(self):
        gray = np.array([10] * 50 + [200] * 50, np.uint8).reshape(10, 10)
        t = img.otsu_threshold(gray)
        assert 10 <= t < 200
        b = img.binarize(gray)
        assert set(np.unique(b)) == {0, 255}
        assert (b == 0).sum() == 50  # the dark mode is ink


class TestSparkImageStats:
    def test_image_stats_on_synth_pgm(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators import (
            multimodal,
        )

        ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
        media = multimodal.synth_pgm_media(ids)
        rows = {r["media_id"]: r for r in multimodal.image_stats(media, max_side=8).collect()}
        assert len(rows) == 40
        for i in (0, 7, 33):
            w, h = 16 + i % 16, 12 + i % 8
            r_ = np.arange(h)[:, None]
            c_ = np.arange(w)[None, :]
            arr = ((i * 31 + 7 * r_ + 13 * c_) % 256).astype(np.uint8)
            got = rows[i]
            assert (got["width"], got["height"]) == (w, h)
            assert got["mean_gray"] == pytest.approx(arr.mean(), abs=1e-9)
            assert max(got["resized_w"], got["resized_h"]) <= 8
            assert got["otsu_t"] == img.otsu_threshold(arr)


class TestPng:
    def test_round_trip_gray_and_rgb(self):
        g = (np.arange(40 * 30) % 256).astype(np.uint8).reshape(30, 40)
        assert np.array_equal(img.decode_png(img.encode_png(g)), g)
        rgb = (np.arange(12 * 9 * 3) % 256).astype(np.uint8).reshape(9, 12, 3)
        assert np.array_equal(img.decode_png(img.encode_png(rgb)), rgb)
        assert img.sniff_image_format(img.encode_png(g)) == "png"
        assert img.decode_image_bytes(img.encode_png(g)).shape == (30, 40)

    def test_all_five_filters_and_rgba(self):
        """Hand-encode every PNG scanline filter (0..4) + an RGBA image
        and verify the decoder reconstructs the exact pixels."""
        import struct
        import zlib

        rng = np.random.RandomState(0)
        truth = rng.randint(0, 256, size=(6, 5, 3)).astype(np.uint8)

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        def filt_encode(arr, ftype):
            h, w, ch = arr.shape
            stride = w * ch
            flat = arr.reshape(h, stride).astype(np.int32)
            rows = []
            for y in range(h):
                prev = flat[y - 1] if y else np.zeros(stride, np.int32)
                cur = flat[y]
                f = np.zeros(stride, np.int32)
                for x in range(stride):
                    left = cur[x - ch] if x >= ch else 0
                    ul = prev[x - ch] if x >= ch else 0
                    if ftype == 0:
                        f[x] = cur[x]
                    elif ftype == 1:
                        f[x] = (cur[x] - left) % 256
                    elif ftype == 2:
                        f[x] = (cur[x] - prev[x]) % 256
                    elif ftype == 3:
                        f[x] = (cur[x] - ((int(left) + int(prev[x])) >> 1)) % 256
                    else:
                        f[x] = (cur[x] - paeth(int(left), int(prev[x]), int(ul))) % 256
                rows.append(bytes([ftype]) + bytes(f.astype(np.uint8)))
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                img._PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"".join(rows)))
                + chunk(b"IEND", b"")
            )

        for ftype in range(5):
            assert np.array_equal(img.decode_png(filt_encode(truth, ftype)), truth), ftype

        import zlib as _z
        rgba = np.dstack([truth, np.full(truth.shape[:2], 99, np.uint8)])
        h, w, _ = rgba.shape
        raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
        p = (
            img._PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", _z.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(img.decode_png(p), truth)  # alpha dropped

    def test_unsupported_depth_raises(self):
        import pytest as _pt
        import struct, zlib

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        p = img._PNG_SIG + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
        with _pt.raises(ValueError, match="bit depth"):
            img.decode_png(p)


class TestWav:
    def test_round_trip_and_features(self):
        from accelerated_intelligent_document_processing_on_aws_spark.kernel import audio as aud

        t = np.arange(8000, dtype=np.float64)
        sine = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
        payload = aud.encode_wav_pcm16(sine, 8000)
        assert aud.sniff_audio_format(payload) == "wav"
        samples, sr = aud.decode_wav(payload)
        assert sr == 8000 and samples.shape == (8000, 1)
        assert np.allclose(samples[:, 0], sine / 32768.0)
        f = aud.audio_features(samples, sr)
        assert f["duration_ms"] == 1000
        # 440 Hz sine: 880 zero crossings/sec (+-1 boundary)
        assert abs(f["zero_crossings"] - 880) <= 1
        assert f["rms"] == pytest.approx(20000 / 32768 / np.sqrt(2), rel=1e-3)

    def test_stereo_and_8bit(self):
        from accelerated_intelligent_document_processing_on_aws_spark.kernel import audio as aud

        stereo = np.stack([np.arange(100, dtype=np.int16),
                           -np.arange(100, dtype=np.int16)], axis=1)
        s, sr = aud.decode_wav(aud.encode_wav_pcm16(stereo, 16000))
        assert s.shape == (100, 2)
        # 8-bit unsigned payload built by hand
        body = bytes(range(130, 180))
        fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
               + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
               + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
        chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        chunks += b"data" + len(body).to_bytes(4, "little") + body
        payload = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
        s8, sr8 = aud.decode_wav(payload)
        assert sr8 == 8000 and s8.shape == (50, 1)
        assert s8[0, 0] == pytest.approx((130 - 128) / 128.0)

    def test_audio_stats_spark(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators import (
            multimodal,
        )

        ids = spark.range(0, 16).withColumnRenamed("id", "doc_id")
        rows = {
            r["media_id"]: r
            for r in multimodal.audio_stats(multimodal.synth_wav_media(ids)).collect()
        }
        assert len(rows) == 16
        for i in (0, 7, 15):
            n = 256 + i % 128
            v = ((i * 7 + 13 * np.arange(n, dtype=np.int64)) % 2003 - 1001) / 32768.0
            got = rows[i]
            assert got["n_samples"] == n
            assert got["rms"] == pytest.approx(float(np.sqrt(np.mean(v * v))), abs=1e-9)


class TestSparkPngPath:
    def test_image_stats_on_png_payloads(self, spark):
        """Compressed-format path through the Spark kernel: PNG payloads
        decode inside mapInPandas with no injected decoder."""
        from pyspark.sql import types as T

        from accelerated_intelligent_document_processing_on_aws_spark.operators import (
            multimodal,
        )

        rows = []
        for i in range(6):
            h, w = 8 + i, 10 + i
            arr = ((np.arange(h * w) * (i + 3)) % 256).astype(np.uint8).reshape(h, w)
            rows.append((i, bytearray(img.encode_png(arr)), arr.mean()))
        media = spark.createDataFrame(
            [(r[0], bytes(r[1])) for r in rows],
            T.StructType([
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]),
        )
        got = {r["media_id"]: r for r in multimodal.image_stats(media).collect()}
        for i, _, mean in rows:
            assert got[i]["width"] == 10 + i and got[i]["height"] == 8 + i
            assert abs(got[i]["mean_gray"] - mean) < 1e-9
