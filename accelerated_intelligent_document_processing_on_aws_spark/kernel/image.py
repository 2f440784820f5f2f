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
    "decode_png",
    "encode_pgm",
    "encode_ppm",
    "encode_png",
    "resize_max_side",
    "to_grayscale",
    "otsu_threshold",
    "binarize",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_image_format(payload: bytes | None) -> str | None:
    """'ppm' | 'pgm' | 'bmp' | 'png' | None from magic bytes."""
    if not payload or len(payload) < 2:
        return None
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return "png"
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


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG (the common subset) → uint8 array, stdlib ``zlib`` + numpy.

    Supports bit depth 8, color types 0 (gray → (h,w)), 2 (RGB →
    (h,w,3)) and 6 (RGBA → alpha dropped, (h,w,3)), non-interlaced —
    i.e. what ``encode_png`` and most document renderers emit.  All five
    scanline filters are implemented: None/Up are fully vectorized;
    Sub is a per-channel ``np.add.accumulate`` (mod-256 via uint8
    overflow); Average and Paeth fall back to a per-pixel loop (rare in
    practice — encoders prefer 0/2 for synthetic content)."""
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    w = h = None
    channels = 0
    idat = bytearray()
    n = len(payload)
    while pos + 8 <= n:
        length = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, color, _comp, _filt, interlace = data[8:13]
            if depth != 8:
                raise ValueError(f"PNG bit depth {depth} not supported (only 8)")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            channels = {0: 1, 2: 3, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"PNG color type {color} not supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    rows = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        f = filters[y]
        line = rows[y, 1:].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 2:  # Up
            out[y] = line + prev  # uint8 wraps mod 256
        elif f == 1:  # Sub: per-channel prefix sum mod 256
            acc = np.add.accumulate(line.reshape(w, bpp), axis=0, dtype=np.uint8)
            out[y] = acc.reshape(stride)
        elif f == 3:  # Average
            rec = out[y]
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = out[y]
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
    arr = out.reshape(h, w, channels) if channels > 1 else out.reshape(h, w)
    if channels == 4:
        arr = arr[..., :3].copy()  # drop alpha
    return arr


def decode_image_bytes(payload: bytes) -> np.ndarray:
    """Decode any supported format by magic bytes (PPM/PGM/BMP
    uncompressed; PNG via stdlib zlib)."""
    fmt = sniff_image_format(payload)
    if fmt in ("ppm", "pgm"):
        return decode_ppm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "png":
        return decode_png(payload)
    raise NotImplementedError(
        "unsupported image payload (supported: PPM/PGM/BMP/PNG; other "
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


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 gray (h,w) or RGB (h,w,3) → PNG bytes (filter 0, one IDAT).
    Stdlib zlib only — the test/round-trip twin of :func:`decode_png`."""
    import struct
    import zlib

    if arr.ndim == 2:
        color, channels = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, channels = 2, 3
    else:
        raise ValueError("encode_png expects (h,w) gray or (h,w,3) RGB")
    h, w = arr.shape[:2]
    a = arr.astype(np.uint8).reshape(h, w * channels)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


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
