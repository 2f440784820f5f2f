"""Pure-numpy image codec + preprocessing for the multimodal path.

The reference resizes and adaptively binarizes page images before OCR
(``lib/idp_common_pkg/idp_common/image/__init__.py:14-174``: aspect-
preserving resize that never upscales, plus binarization preprocessing).
This container has no codec libraries, so the engine implements the
uncompressed formats a header parse can handle — PPM/PGM (P5/P6) and
24-bit BMP — in numpy, and keeps compressed formats behind the
injectable-decoder seam in ``operators/multimodal.py``.

Everything here is deterministic and vectorized: decode is a header
parse + ``np.frombuffer`` reshape, resize is integer index-mapped
nearest-neighbor (reproducible across platforms, unlike float-kernel
resamplers), binarization is global Otsu (the deterministic classic;
the reference's adaptive method is a per-block refinement of the same
histogram idea).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "sniff_image_format",
    "decode_image_bytes",
    "decode_ppm",
    "decode_bmp",
    "encode_pgm",
    "encode_ppm",
    "resize_max_side",
    "to_grayscale",
    "otsu_threshold",
    "binarize",
]


def sniff_image_format(payload: bytes | None) -> str | None:
    """'ppm' | 'pgm' | 'bmp' | None from magic bytes."""
    if not payload or len(payload) < 2:
        return None
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    return None


def _parse_pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """(magic, width, height, maxval, data_offset) for P5/P6.

    PNM headers are whitespace-separated tokens with ``#`` comments;
    pixel data starts one whitespace byte after maxval."""
    magic = payload[:2]
    pos = 2
    vals: list[int] = []
    n = len(payload)
    while len(vals) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    return magic, w, h, maxval, pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 → (h, w, 3) uint8; P5 → (h, w) uint8."""
    magic, w, h, _maxval, off = _parse_pnm_header(payload)
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    if channels == 3:
        return data.reshape(h, w, 3)
    return data.reshape(h, w)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BITMAPINFOHEADER BMP → (h, w, 3) uint8 RGB.

    BMP rows are bottom-up and padded to 4-byte multiples; pixels are
    stored BGR."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    header_size = int.from_bytes(payload[14:18], "little")
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR → RGB


def decode_image_bytes(payload: bytes) -> np.ndarray:
    """Decode any supported uncompressed format by magic bytes."""
    fmt = sniff_image_format(payload)
    if fmt in ("ppm", "pgm"):
        return decode_ppm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    raise NotImplementedError(
        "unsupported image payload (supported uncompressed: PPM/PGM/BMP; "
        "compressed formats need an injected codec)"
    )


def encode_pgm(arr: np.ndarray) -> bytes:
    """(h, w) uint8 → P5 bytes (test/round-trip helper)."""
    if arr.ndim != 2:
        raise ValueError("encode_pgm expects a 2-D grayscale array")
    h, w = arr.shape
    return b"P5 %d %d 255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → P6 bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_ppm expects a (h, w, 3) RGB array")
    h, w, _ = arr.shape
    return b"P6 %d %d 255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def to_grayscale(arr: np.ndarray) -> np.ndarray:
    """RGB → luma (integer BT.601 approximation: (77R+150G+29B)>>8,
    exact and platform-stable; grayscale passes through)."""
    if arr.ndim == 2:
        return arr
    a = arr.astype(np.uint32)
    return ((77 * a[..., 0] + 150 * a[..., 1] + 29 * a[..., 2]) >> 8).astype(np.uint8)


def resize_max_side(arr: np.ndarray, max_side: int) -> np.ndarray:
    """Aspect-preserving nearest-neighbor downscale so the longer side
    is ``<= max_side``; NEVER upscales (the reference's resize contract,
    ``image/__init__.py:14-60``)."""
    h, w = arr.shape[:2]
    longest = max(h, w)
    if longest <= max_side:
        return arr
    scale = max_side / longest
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    ri = (np.arange(nh) * h // nh).astype(np.intp)
    ci = (np.arange(nw) * w // nw).astype(np.intp)
    return arr[ri][:, ci]


def otsu_threshold(gray: np.ndarray) -> int:
    """Global Otsu threshold over the 256-bin histogram (maximizes
    between-class variance).  Deterministic tie-break: lowest t."""
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0
    omega = np.cumsum(hist)
    mu = np.cumsum(hist * np.arange(256))
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = (mu_t * omega - mu) ** 2 / (omega * (total - omega))
    sigma_b = np.nan_to_num(sigma_b, nan=0.0, posinf=0.0)
    return int(np.argmax(sigma_b))


def binarize(gray: np.ndarray) -> np.ndarray:
    """Otsu-binarized uint8 image: ink (<= threshold) → 0, paper → 255."""
    t = otsu_threshold(gray)
    return np.where(gray <= t, 0, 255).astype(np.uint8)
