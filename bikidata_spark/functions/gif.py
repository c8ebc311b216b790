"""Pure stdlib+numpy GIF codec (first frame).

Closes the GIF seam in the media pipeline the same way functions/jpeg.py
and functions/png.py close theirs: no codec library in the container, so
the decoder is written against the GIF87a/89a specification directly —
header + logical screen descriptor, global/local color tables, the LZW
variable-code-width decompressor (clear/EOI codes, deferred clear, 12-bit
cap), and Adam-style 4-pass interlacing. Animated GIFs decode to their
FIRST image descriptor (the pipeline's feature kernels treat a GIF as a
still; frame sampling belongs to the video path). Transparency is
ignored — the transparent index renders as its palette color, which is
deterministic and good enough for similarity features.

``encode_gif`` is the round-trip twin (like ``encode_ppm``/PNG's
encoder): it quantizes an (H, W, 3) array to a 256-color palette by
byte-packing duplicates (images with <= 256 distinct colors round-trip
exactly) and emits literal LZW codes with a CLEAR before every dictionary
overflow — valid, uncompressed-style output any decoder accepts.
"""

from __future__ import annotations

import numpy as np


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF LZW: variable code width starting at min_code_size+1, CLEAR
    resets the dictionary, widths grow when the next code would not fit,
    capped at 12 bits (no growth past 4096 entries)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # bit reader: GIF packs codes LSB-first
    bitpos = 0
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return eoi  # truncated stream: treat as end
        byte = bitpos >> 3
        val = int.from_bytes(data[byte : byte + 3], "little")
        val = (val >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return val

    def reset():
        # dict maps code -> byte sequence; codes < clear are literals
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    next_code = eoi + 1
    while n_out < n_pixels:
        code = read(width)
        if code == clear:
            table, width = reset()
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("truncated GIF pixel data")
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> (H, W, 3) uint8 RGB: the logical screen with the
    FIRST frame composited at its (left, top) offset over the
    background color (frames smaller than the canvas keep canvas
    geometry). Truncated/corrupt payloads raise ValueError (the
    decode_image contract, same as the PNG/JPEG codecs)."""
    try:
        return _decode_gif(payload)
    except IndexError:
        raise ValueError("truncated GIF payload") from None


def _decode_gif(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF payload")
    pos = 6
    # logical screen descriptor
    screen_w = int.from_bytes(payload[pos : pos + 2], "little")
    screen_h = int.from_bytes(payload[pos + 2 : pos + 4], "little")
    packed = payload[pos + 4]
    gct_flag = packed >> 7
    gct_size = 2 << (packed & 0x07)
    bg_index = payload[pos + 5]
    pos += 7
    gct = None
    if gct_flag:
        raw = payload[pos : pos + 3 * gct_size]
        if len(raw) < 3 * gct_size:
            raise ValueError("truncated GIF color table")
        gct = np.frombuffer(raw, dtype=np.uint8).reshape(gct_size, 3)
        pos += 3 * gct_size
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            left = int.from_bytes(payload[pos : pos + 2], "little")
            top = int.from_bytes(payload[pos + 2 : pos + 4], "little")
            w = int.from_bytes(payload[pos + 4 : pos + 6], "little")
            h = int.from_bytes(payload[pos + 6 : pos + 8], "little")
            ipacked = payload[pos + 8]
            pos += 9
            interlaced = bool(ipacked & 0x40)
            table = gct
            if ipacked >> 7:  # local color table
                lct_size = 2 << (ipacked & 0x07)
                raw = payload[pos : pos + 3 * lct_size]
                if len(raw) < 3 * lct_size:
                    raise ValueError("truncated GIF color table")
                table = np.frombuffer(raw, dtype=np.uint8).reshape(lct_size, 3)
                pos += 3 * lct_size
            if table is None:
                raise ValueError("GIF image has no color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos] != 0:
                n = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + n])
                pos += 1 + n
            idx = _lzw_decode(b"".join(chunks), min_code, w * h).reshape(h, w)
            if interlaced:
                deinter = np.empty_like(idx)
                row = 0
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                    n = len(range(start, h, step))
                    deinter[start::step] = idx[row : row + n]
                    row += n
                idx = deinter
            frame = table[np.minimum(idx, len(table) - 1)]
            if (screen_w, screen_h) == (w, h) and (left, top) == (0, 0):
                return frame
            # frame smaller than the logical screen: composite onto the
            # background-colored canvas at its declared offset so the
            # output keeps canvas geometry
            bg = table[min(bg_index, len(table) - 1)]
            canvas = np.broadcast_to(bg, (screen_h, screen_w, 3)).copy()
            y1, x1 = min(top + h, screen_h), min(left + w, screen_w)
            canvas[top:y1, left:x1] = frame[: y1 - top, : x1 - left]
            return canvas
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def encode_gif(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 with <= 256 distinct colors -> GIF89a bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"encode_gif expects (H, W, 3), got {img.shape}")
    h, w, _ = img.shape
    if w > 0xFFFF or h > 0xFFFF or w == 0 or h == 0:
        raise ValueError(f"GIF dimensions out of range: {w}x{h}")
    flat = img.reshape(-1, 3)
    # palette = unique colors; index map via structured view
    packed = flat[:, 0].astype(np.uint32) << 16 | flat[:, 1].astype(np.uint32) << 8 | flat[:, 2]
    colors, idx = np.unique(packed, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif supports <= 256 distinct colors")
    # palette size must be a power of two >= 2
    bits = max(1, int(len(colors) - 1).bit_length())
    size = 1 << bits
    pal = np.zeros((size, 3), dtype=np.uint8)
    pal[: len(colors), 0] = colors >> 16
    pal[: len(colors), 1] = (colors >> 8) & 0xFF
    pal[: len(colors), 2] = colors & 0xFF

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | ((bits - 1) & 0x07), 0, 0])  # GCT flag + size
    out += pal.tobytes()
    out += b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"

    min_code = max(2, bits)
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out += bytes([min_code])
    # literal codes with a CLEAR re-emitted before the decoder's
    # dictionary would force a width increase — classic
    # uncompressed-GIF emission. Every code then shares ONE fixed width
    # (min_code+1), so the whole bitstream packs in a single vectorized
    # LSB-first np.packbits instead of a per-pixel Python loop.
    width = min_code + 1
    budget = (1 << width) - eoi - 2  # literals emittable before width grows
    runs = [idx[i : i + budget] for i in range(0, len(idx), budget)] or [idx[:0]]
    seq = np.concatenate(
        [np.concatenate(([clear], run)) for run in runs] + [[eoi]]
    ).astype(np.uint16)
    bit_matrix = ((seq[:, None] >> np.arange(width, dtype=np.uint16)) & 1).astype(
        np.uint8
    )
    body = np.packbits(bit_matrix.ravel(), bitorder="little").tobytes()
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
