"""PNG codec on stdlib ``zlib`` + numpy — no image library.

PNG is DEFLATE-compressed filtered scanlines (RFC 2083); the stdlib
already ships the only hard part (zlib), so decode is chunk walk →
inflate → per-row unfilter → (H, W, 3). Together with the baseline
JPEG codec (functions/jpeg.py) this closes the two dominant real-world
image formats for the media pipeline without any codec dependency.
No reference-repo counterpart (the reference has no media path).

Scope (r6: complete for DEFLATE streams): greyscale (0), truecolor
(2), indexed (3), grey+alpha (4), RGBA (6) at every legal bit depth —
1/2/4/8 and 16 (16-bit samples scale to 8 via the high byte) — plus
Adam7 interlacing (each pass unfilters as its own sub-image and
scatters into place). Alpha is composited over black, the common
feature-extraction convention. The encoder twin writes 8-bit
truecolor with filter 0 for fixtures and round-trip tests.
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
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"bad PNG color type {color}")
    legal_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}
    if bitdepth not in legal_depths[color]:
        raise ValueError(f"bad PNG bit depth {bitdepth} for color type {color}")

    raw = zlib.decompress(bytes(idat))
    passes = _ADAM7 if interlace == 1 else [(0, 0, 1, 1)]
    px = np.zeros((h, w, channels), np.uint8)
    pos = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * channels * bitdepth + 7) // 8
        need = ph * (stride + 1)
        if len(raw) < pos + need:
            raise ValueError("truncated PNG pixel data")
        sub = np.frombuffer(raw[pos : pos + need], np.uint8).reshape(ph, stride + 1)
        pos += need
        unfiltered = _unfilter(sub, stride, max(1, channels * bitdepth // 8))
        px[y0::dy, x0::dx] = _to_samples(unfiltered, pw, ph, channels, bitdepth, color)
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


# Adam7 pass grid: (x offset, y offset, x step, y step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter(rows: np.ndarray, stride: int, bpp: int) -> np.ndarray:
    """Undo per-row PNG filters over raw BYTES (filters always operate
    on bytes regardless of bit depth — bpp = ceil(bits-per-pixel/8),
    floored to 1 for sub-byte depths per the spec)."""
    h = rows.shape[0]
    img = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        cur = rows[y, 1:].copy()
        ft = rows[y, 0]
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
    return img


def _to_samples(
    img: np.ndarray, w: int, h: int, channels: int, depth: int, color: int
) -> np.ndarray:
    """Unfiltered byte rows → (h, w, channels) uint8 samples: 16-bit
    scales via the high byte; sub-byte depths unpack MSB-first and
    greyscale values scale by the exact 255/(2^d - 1) factor (indexed
    values are palette indexes and stay raw)."""
    if depth == 8:
        return img[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        u16 = np.ascontiguousarray(img[:, : w * channels * 2]).view(">u2")
        return (u16 >> 8).astype(np.uint8).reshape(h, w, channels)
    # 1/2/4-bit: only greyscale or indexed (channels == 1)
    bits = np.unpackbits(img, axis=1)[:, : w * depth]
    weights = 1 << np.arange(depth - 1, -1, -1)
    vals = bits.reshape(h, w, depth) @ weights
    if color == 0:  # exact scale: 255 divisible by 1, 3, 15
        vals = vals * (255 // ((1 << depth) - 1))
    return vals.astype(np.uint8).reshape(h, w, 1)


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
