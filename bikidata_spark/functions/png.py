"""PNG codec on stdlib ``zlib`` + numpy — no image library.

PNG is DEFLATE-compressed filtered scanlines (RFC 2083); the stdlib
already ships the only hard part (zlib), so decode is chunk walk →
inflate → per-row unfilter → (H, W, 3). Together with the baseline
JPEG codec (functions/jpeg.py) this closes the two dominant real-world
image formats for the media pipeline without any codec dependency.
No reference-repo counterpart (the reference has no media path).

Scope: 8-bit greyscale (0), truecolor (2), indexed (3), grey+alpha
(4), RGBA (6) — alpha is composited over black, the common feature-
extraction convention; interlaced (Adam7) and 16-bit raise
``NotImplementedError`` with a clear message. The encoder twin writes
8-bit truecolor with filter 0 for fixtures and round-trip tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to an (H, W, 3) uint8 RGB array."""
    if payload is None or payload[:8] != _SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    trns = None
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, bitdepth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"bad PNG compression/filter method {comp}/{filt}")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG is not supported")
    if bitdepth != 8:
        raise NotImplementedError(f"only 8-bit PNG supported (got {bitdepth})")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"bad PNG color type {color}")

    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    rows = np.frombuffer(raw[: h * (stride + 1)], np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    img = np.zeros((h, stride), np.uint8)
    bpp = channels  # bytes per pixel at bitdepth 8
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        cur = rows[y, 1:].copy()
        ft = ftypes[y]
        if ft == 0:
            pass
        elif ft == 1:  # Sub — sequential in x, loop pixel-groups
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif ft == 2:  # Up
            cur = (cur.astype(np.int32) + prev).astype(np.uint8)
        elif ft == 3:  # Average
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft} on row {y}")
        img[y] = cur
        prev = img[y]

    px = img.reshape(h, w, channels)
    if color == 0:  # greyscale
        return np.repeat(px, 3, axis=2)
    if color == 2:  # truecolor
        return px.copy()
    if color == 3:  # indexed
        if plte is None:
            raise ValueError("indexed PNG missing PLTE")
        return plte[px[:, :, 0]]
    # alpha variants: composite over black (feature-extraction default)
    if color == 4:
        grey = px[:, :, 0].astype(np.uint16) * px[:, :, 1].astype(np.uint16) // 255
        return np.repeat(grey.astype(np.uint8)[:, :, None], 3, axis=2)
    rgb = px[:, :, :3].astype(np.uint16) * px[:, :, 3:4].astype(np.uint16) // 255
    return rgb.astype(np.uint8)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """(H, W, 3) or (H, W) uint8 → 8-bit PNG bytes (truecolor or
    greyscale, filter 0 rows — fixtures and round-trips, not an
    optimizing encoder)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[0], img.shape[1]
    color = 0 if gray else 2
    body = img.reshape(h, -1)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))
    out = bytearray(_SIG)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
    out += _chunk(b"IDAT", zlib.compress(raw, level))
    out += _chunk(b"IEND", b"")
    return bytes(out)
