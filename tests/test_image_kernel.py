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
