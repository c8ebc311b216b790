"""Baseline-sequential JPEG (JFIF) codec in pure numpy — no codec
library.

The LLM-pipeline multimodal brief needs real image decode for the
dominant on-disk format; this container has no PIL/libjpeg, but
baseline JPEG is deterministic integer math: segment parse → canonical
Huffman decode → dequantize → 8×8 IDCT → chroma upsample → YCbCr→RGB
(ITU T.81 §A.3/F.2; no reference-repo counterpart — the reference has
no media path at all).

Scope (honestly bounded): sequential scans (SOF0 baseline AND SOF1
extended, 8- or 12-bit precision — r6), progressive (SOF2: spectral
selection + successive approximation, EOB runs, AC refinement — T.81
Annex G, r6), grayscale / 4:4:4 / 4:2:2 / 4:2:0, restart intervals.
Arithmetic-coded, hierarchical, and lossless streams raise
``NotImplementedError`` with a clear message.

The encoder halves exist so fixtures and round-trip tests need no
external tool; they emit baseline or progressive 4:4:4 / grayscale
with flat-ish quant tables and the minimal canonical Huffman tables
described below — both quantize identically, so a progressive stream
decodes pixel-identical to its baseline twin (pinned by test).
Every decoded pixel is pure numpy — the per-block Python loop is the
entropy decode only, and media kernels run it inside Arrow-batched
``mapInPandas`` workers, never on the driver.
"""

from __future__ import annotations

import numpy as np

# order-i zigzag coefficient lives at this natural (row-major) position
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# M[u, x] = c(u)/2 · cos((2x+1)uπ/16); IDCT is Mᵀ·F·M, DCT is M·f·Mᵀ
_M = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _huff_table(counts: list[int], values: list[int]) -> dict:
    """Canonical Huffman (T.81 Annex C): {(length, code) -> value}."""
    lut, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lut[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return lut


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    de-stuffing; stops (raises) on a bare marker so corrupt streams
    fail loudly instead of reading garbage."""

    __slots__ = ("buf", "pos", "acc", "nbits")

    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos, self.acc, self.nbits = buf, pos, 0, 0

    def bit(self) -> int:
        if self.nbits == 0:
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.buf[self.pos]
                if nxt != 0x00:
                    raise ValueError(
                        f"marker 0xFF{nxt:02X} inside entropy data (truncated scan?)"
                    )
                self.pos += 1
            self.acc, self.nbits = b, 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.nbits = 0


def _decode_huff(bits: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid huffman code in scan")


def _extend(v: int, s: int) -> int:
    # T.81 F.2.2.1: low values of an s-bit magnitude are negative
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _decode_block(bits, dctab, actab, qt, pred, level=128.0):
    s = _decode_huff(bits, dctab)
    dc = pred + (_extend(bits.receive(s), s) if s else 0)
    coef = np.zeros(64)
    coef[0] = dc
    k = 1
    while k < 64:
        rs = _decode_huff(bits, actab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[k] = _extend(bits.receive(s), s)
        k += 1
    blk = np.zeros(64)
    blk[ZIGZAG] = coef * qt  # dequantize in zigzag order, place natural
    spatial = _M.T @ blk.reshape(8, 8) @ _M + level
    return spatial, dc


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline-sequential OR progressive JFIF payload to an
    (H, W, 3) uint8 RGB array (grayscale replicates to 3 channels)."""
    if payload is None or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    hdc: dict[int, dict] = {}
    hac: dict[int, dict] = {}
    frame = None
    progressive = False
    coefs = None  # progressive: {comp id: (by, bx, 64) int zigzag coefs}
    ri = 0
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI: progressive result, or no-scan error
            if progressive and coefs is not None:
                return _prog_reconstruct(frame, coefs, qts)
            break
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    qts[tq] = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.float64)
                    p += 64
                else:
                    qts[tq] = np.frombuffer(seg[p : p + 128], ">u2").astype(np.float64)
                    p += 128
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision = seg[0]
            if precision not in (8, 12):
                raise NotImplementedError(f"JPEG precision {precision} (only 8/12-bit)")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = [
                {
                    "id": seg[6 + 3 * i],
                    "h": seg[7 + 3 * i] >> 4,
                    "v": seg[7 + 3 * i] & 0x0F,
                    "tq": seg[8 + 3 * i],
                }
                for i in range(nc)
            ]
            frame = (h, w, comps, precision)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF 0x{marker:02X}: sequential (SOF0/SOF1, 8/12-bit) "
                "and progressive (SOF2) are implemented "
                "(arithmetic-coded/hierarchical/lossless are not)"
            )
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                counts = list(seg[p : p + 16])
                p += 16
                cnt = sum(counts)
                values = list(seg[p : p + cnt])
                p += cnt
                (hdc if tc == 0 else hac)[th] = _huff_table(counts, values)
        elif marker == 0xDD:  # DRI
            ri = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomp = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0x0F) for i in range(ns)]
            if not progressive:
                # single interleaved baseline scan — decode and return
                return _decode_scan(payload, pos + seglen, frame, qts, hdc, hac, scomp, ri)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            if coefs is None:
                coefs = _prog_init(frame)
            pos = _prog_scan(
                payload, pos + seglen, frame, coefs, hdc, hac, scomp, ss, se, a >> 4, a & 0x0F, ri
            )
            continue
        pos += seglen
    raise ValueError("no SOS scan found")


def _decode_scan(buf, pos, frame, qts, hdc, hac, scomp, ri):
    H, W, comps, prec = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    byid = {c["id"]: c for c in comps}
    order = [byid[cs] for cs, _, _ in scomp]
    tabs = {cs: (hdc[td], hac[ta]) for cs, td, ta in scomp}
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    }
    preds = {c["id"]: 0 for c in comps}
    bits = _BitReader(buf, pos)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and nmcu and nmcu % ri == 0:
                bits.align()
                if not (buf[bits.pos] == 0xFF and 0xD0 <= buf[bits.pos + 1] <= 0xD7):
                    raise ValueError(f"expected RST marker before MCU {nmcu}")
                bits.pos += 2
                preds = {k: 0 for k in preds}
            for c in order:
                dctab, actab = tabs[c["id"]]
                qt = qts[c["tq"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk, preds[c["id"]] = _decode_block(
                            bits, dctab, actab, qt, preds[c["id"]],
                            float(1 << (prec - 1)),
                        )
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = blk
            nmcu += 1
    return _assemble(planes, comps, H, W, hmax, vmax, prec)


def _assemble(planes, comps, H, W, hmax, vmax, prec):
    """Shared tail: clamp at the frame precision, scale to 8 bits
    (high nibble for 12-bit), upsample chroma, YCbCr→RGB."""
    mx = float((1 << prec) - 1)
    half = float(1 << (prec - 1))
    shift = prec - 8

    def to8(a):
        a = np.clip(np.round(a), 0, mx)
        return (a.astype(np.int32) >> shift).astype(np.uint8) if shift else a.astype(np.uint8)

    if len(comps) == 1:
        y = to8(planes[comps[0]["id"]][:H, :W])
        return np.repeat(y[:, :, None], 3, axis=2)
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:H, :W])
    y, cb, cr = full[0], full[1] - half, full[2] - half
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )
    return to8(rgb)


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — T.81 Annex G, successive approximation +
# spectral selection. Coefficients accumulate across scans in zigzag
# order; reconstruction dequantizes + IDCTs once at EOI.
# ---------------------------------------------------------------------------


def _prog_init(frame):
    """Per-component zigzag coefficient store, padded to the MCU grid
    (interleaved DC scans cover padding blocks; AC scans touch only the
    component's own ceil-grid prefix)."""
    H, W, comps = frame[0], frame[1], frame[2]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    }


def _comp_grid(frame, c):
    """Non-padded block grid of one component (T.81 A.1.1) — the block
    count a NON-interleaved scan covers."""
    H, W, comps = frame[0], frame[1], frame[2]
    hmax = max(x["h"] for x in comps)
    vmax = max(x["v"] for x in comps)
    cw = -(-W * c["h"] // hmax)
    ch = -(-H * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _dc_unit(bits, coef, by, bx, table, preds, cs, ah, al):
    if ah == 0:  # first pass: huffman-coded shifted diff
        s = _decode_huff(bits, table)
        diff = _extend(bits.receive(s), s) if s else 0
        preds[cs] += diff
        coef[by, bx, 0] = preds[cs] << al
    else:  # refinement: one raw bit (two's-complement OR is exact)
        if bits.bit():
            coef[by, bx, 0] |= 1 << al


def _ac_first(bits, blk, table, ss, se, al, state):
    """AC first pass over one block's spectral band (T.81 G.2.1)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(bits, table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1 + (bits.receive(r) if r else 0)
            break
        k += r
        if k > se:
            raise ValueError("AC run past end of spectral band")
        blk[k] = _extend(bits.receive(s), s) << al
        k += 1


def _ac_refine(bits, blk, table, ss, se, al, state):
    """AC refinement pass (T.81 G.2.2 / libjpeg decode_mcu_AC_refine):
    correction bits for already-nonzero coefficients, ±1<<al for newly
    significant ones, EOB runs carrying correction bits."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    ended = state["eobrun"] > 0
    if not ended:
        while k <= se:
            rs = _decode_huff(bits, table)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:  # EOBn — includes this block
                    state["eobrun"] = (1 << r) + (bits.receive(r) if r else 0)
                    ended = True
                    break
                # r == 15: ZRL — a run of 16 zero-HISTORY coefficients
            else:
                if s != 1:
                    raise ValueError("AC refinement symbol with s > 1")
                val = p1 if bits.bit() else m1
            while k <= se:
                if blk[k] != 0:
                    # always consume the correction bit first
                    if bits.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        if val:
                            blk[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if ended:
        # inside an EOB run this block still carries correction bits
        # for its remaining nonzero coefficients
        while k <= se:
            if blk[k] != 0:
                if bits.bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _prog_scan(buf, pos, frame, coefs, hdc, hac, scomp, ss, se, ah, al, ri):
    """Decode one progressive scan into ``coefs``; returns the offset
    of the next marker after the entropy-coded data."""
    H, W, comps = frame[0], frame[1], frame[2]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    byid = {c["id"]: c for c in comps}
    bits = _BitReader(buf, pos)
    state = {"eobrun": 0}
    preds = {cs: 0 for cs, _, _ in scomp}

    def restart(unit):
        if ri and unit and unit % ri == 0:
            bits.align()
            if not (buf[bits.pos] == 0xFF and 0xD0 <= buf[bits.pos + 1] <= 0xD7):
                raise ValueError(f"expected RST marker before unit {unit}")
            bits.pos += 2
            state["eobrun"] = 0
            for key in preds:
                preds[key] = 0

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if len(scomp) > 1:  # interleaved: full MCU grid incl. padding
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    restart(unit)
                    for cs, td, _ta in scomp:
                        c = byid[cs]
                        for v in range(c["v"]):
                            for hh in range(c["h"]):
                                _dc_unit(
                                    bits, coefs[cs], my * c["v"] + v,
                                    mx * c["h"] + hh, hdc.get(td), preds, cs, ah, al,
                                )
                    unit += 1
        else:  # single component: its own non-padded grid
            cs, td, _ta = scomp[0]
            bby, bbx = _comp_grid(frame, byid[cs])
            for b in range(bby * bbx):
                restart(b)
                _dc_unit(bits, coefs[cs], b // bbx, b % bbx, hdc.get(td), preds, cs, ah, al)
    else:  # AC scan: always single-component, non-interleaved
        if len(scomp) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cs, _td, ta = scomp[0]
        bby, bbx = _comp_grid(frame, byid[cs])
        table = hac.get(ta)
        for b in range(bby * bbx):
            restart(b)
            blk = coefs[cs][b // bbx, b % bbx]
            if ah == 0:
                _ac_first(bits, blk, table, ss, se, al, state)
            else:
                _ac_refine(bits, blk, table, ss, se, al, state)
    # entropy data ends at the next true marker (skip stuffed FF00)
    p = bits.pos
    n = len(buf)
    while p + 1 < n and not (buf[p] == 0xFF and buf[p + 1] != 0x00):
        p += 1
    return p


def _prog_reconstruct(frame, coefs, qts):
    """Dequantize + IDCT the accumulated coefficient store and apply
    the shared upsample/color tail."""
    H, W, comps, prec = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = {}
    for c in comps:
        zz = coefs[c["id"]].astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz * qts[c["tq"]]
        bby, bbx = zz.shape[0], zz.shape[1]
        blocks = nat.reshape(bby, bbx, 8, 8)
        spatial = np.einsum("ux,abuv,vy->abxy", _M, blocks, _M) + float(1 << (prec - 1))
        planes[c["id"]] = spatial.transpose(0, 2, 1, 3).reshape(bby * 8, bbx * 8)
    return _assemble(planes, comps, H, W, hmax, vmax, prec)


# ---------------------------------------------------------------------------
# encoder — fixture/round-trip twin (baseline, 4:4:4 or grayscale)
# ---------------------------------------------------------------------------

# minimal canonical tables: 12 DC categories all at length 4
# (2⁴ ≥ 12), 162 AC run/size symbols all at length 8 (2⁸ ≥ 162; the
# all-ones code stays unused as T.81 requires)
_ENC_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALUES = list(range(12))
_ENC_AC_COUNTS = [0] * 7 + [162] + [0] * 8
_ENC_AC_VALUES = [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 11)] + [0xF0]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nbits = 0, 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per T.81


def _enc_tables():
    dc = {v: k for k, v in _huff_table(_ENC_DC_COUNTS, _ENC_DC_VALUES).items()}
    ac = {v: k for k, v in _huff_table(_ENC_AC_COUNTS, _ENC_AC_VALUES).items()}
    return dc, ac


def _encode_block(w, dc_lut, ac_lut, qt, plane, pred, level=128.0):
    coef = _M @ (plane - level) @ _M.T
    q = np.round(coef.reshape(64)[ZIGZAG] / qt).astype(np.int64)
    diff = int(q[0]) - pred
    s = int(abs(diff)).bit_length()
    length, code = dc_lut[s]
    w.write(code, length)
    if s:
        w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last = np.nonzero(q[1:])[0]
    last = int(last[-1]) + 1 if len(last) else 0
    for k in range(1, last + 1):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_lut[0xF0]
            w.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        length, code = ac_lut[(run << 4) | s]
        w.write(code, length)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        length, code = ac_lut[0x00]
        w.write(code, length)
    return int(q[0])


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(
    img: np.ndarray,
    qt: np.ndarray | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) or (H, W) uint8 → baseline JFIF bytes (grayscale,
    4:4:4, or 4:2:0 color), using the flat quant table ``qt`` (zigzag
    order, default all-4s ≈ visually lossless for synthetic
    fixtures)."""
    if qt is None:
        qt = np.full(64, 4.0)
    qt = np.asarray(qt, dtype=np.float64)
    gray = img.ndim == 2
    sub = subsampling == "420" and not gray
    h, w = img.shape[0], img.shape[1]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    mcu = 16 if sub else 8
    ph = -(-h // mcu) * mcu
    pw = -(-w // mcu) * mcu
    planes = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes]
    if sub:
        # chroma: 2×2 box-average then one 8×8 block per 16×16 MCU
        planes[1:] = [
            p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)) for p in planes[1:]
        ]

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + np.clip(qt, 1, 255).astype(np.uint8).tobytes())
    nc = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for cid in range(1, nc + 1):
        hv = 0x22 if (sub and cid == 1) else 0x11
        sof += bytes([cid, hv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00] + _ENC_DC_COUNTS[:16]) + bytes(_ENC_DC_VALUES))
    out += _seg(0xC4, bytes([0x10] + _ENC_AC_COUNTS[:16]) + bytes(_ENC_AC_VALUES))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([nc]) + b"".join(bytes([cid, 0x00]) for cid in range(1, nc + 1))
    out += _seg(0xDA, sos + bytes([0, 63, 0]))

    dc_lut, ac_lut = _enc_tables()
    bw = _BitWriter()
    preds = [0] * nc
    state = {"nmcu": 0, "rst": 0}

    def mcu_boundary():
        if restart_interval and state["nmcu"] and state["nmcu"] % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + state["rst"] % 8])
            state["rst"] += 1
            preds[:] = [0] * nc
        state["nmcu"] += 1

    def enc(ci, p, y0, x0):
        preds[ci] = _encode_block(
            bw, dc_lut, ac_lut, qt, p[y0 : y0 + 8, x0 : x0 + 8], preds[ci]
        )

    if sub:
        for by in range(ph // 16):
            for bx in range(pw // 16):
                mcu_boundary()
                for dy in (0, 8):
                    for dx in (0, 8):
                        enc(0, planes[0], by * 16 + dy, bx * 16 + dx)
                enc(1, planes[1], by * 8, bx * 8)
                enc(2, planes[2], by * 8, bx * 8)
    else:
        for by in range(ph // 8):
            for bx in range(pw // 8):
                mcu_boundary()
                for ci, p in enumerate(planes):
                    enc(ci, p, by * 8, bx * 8)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder — fixture/round-trip twin (4:4:4 or grayscale).
# Emits the classic scan script: shifted DC first + DC refinement, then
# per-component spectral bands (1-5, 6-63) at Al=1 followed by their
# refinement passes — exercising every decoder path (spectral
# selection, successive approximation, EOB runs, ZRL, corrections).
# ---------------------------------------------------------------------------


def _pt(v: int, al: int) -> int:
    """AC point transform: divide by 2^al truncating toward zero."""
    return -((-v) >> al) if v < 0 else v >> al


def _enc_dc_first(w, dc_lut, q, order, al):
    """Interleaved shifted-DC scan over the (4:4:4/gray) block grid."""
    preds = {cs: 0 for cs in order}
    bby, bbx = q[order[0]].shape[0], q[order[0]].shape[1]
    for b in range(bby * bbx):
        for cs in order:
            v = int(q[cs][b // bbx, b % bbx, 0]) >> al  # arithmetic shift
            diff = v - preds[cs]
            preds[cs] = v
            s = int(abs(diff)).bit_length()
            length, code = dc_lut[s]
            w.write(code, length)
            if s:
                w.write(diff if diff > 0 else diff + (1 << s) - 1, s)


def _enc_dc_refine(w, q, order, al):
    bby, bbx = q[order[0]].shape[0], q[order[0]].shape[1]
    for b in range(bby * bbx):
        for cs in order:
            w.write((int(q[cs][b // bbx, b % bbx, 0]) >> al) & 1, 1)


def _enc_ac_first(w, ac_lut, blk, ss, se, al):
    vals = [_pt(int(blk[k]), al) for k in range(ss, se + 1)]
    nz = [i for i, v in enumerate(vals) if v]
    last = nz[-1] if nz else -1
    r = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            length, code = ac_lut[0xF0]
            w.write(code, length)
            r -= 16
        s = abs(v).bit_length()
        length, code = ac_lut[(r << 4) | s]
        w.write(code, length)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
        r = 0
    if last < se - ss:  # trailing zeros (or an all-zero band): EOB0
        length, code = ac_lut[0x00]
        w.write(code, length)


def _enc_ac_refine(w, ac_lut, blk, ss, se, al):
    """Dual of _ac_refine (libjpeg encode_mcu_AC_refine): per-position
    ZRL folding, buffered correction bits, per-block EOB flush."""
    absv = [_pt(abs(int(blk[k])), al) for k in range(ss, se + 1)]
    eob = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    r = 0
    br: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            length, code = ac_lut[0xF0]
            w.write(code, length)
            r -= 16
            for bit in br:
                w.write(bit, 1)
            br = []
        if t > 1:  # already visible at the coarser precision
            br.append(t & 1)
            continue
        # newly significant (|value| at this precision == 1)
        length, code = ac_lut[(r << 4) | 1]
        w.write(code, length)
        w.write(1 if int(blk[ss + i]) > 0 else 0, 1)
        for bit in br:
            w.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        length, code = ac_lut[0x00]  # EOB0 with this block's corrections
        w.write(code, length)
        for bit in br:
            w.write(bit, 1)


def encode_jpeg_progressive(img: np.ndarray, qt: np.ndarray | None = None) -> bytes:
    """(H, W, 3) or (H, W) uint8 → progressive (SOF2) JFIF bytes,
    4:4:4 or grayscale, quantized identically to :func:`encode_jpeg` —
    so a progressive stream decodes pixel-identical to the baseline
    stream of the same image (pinned by test)."""
    if qt is None:
        qt = np.full(64, 4.0)
    qt = np.asarray(qt, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[0], img.shape[1]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    ph = -(-h // 8) * 8
    pw = -(-w // 8) * 8
    planes = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes]
    nc = len(planes)
    order = list(range(1, nc + 1))

    # quantize every block once (identical math to _encode_block)
    q = {}
    for cid, p in zip(order, planes):
        shifted = p - 128.0
        blocks = shifted.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        fr = np.einsum("ux,abxy,vy->abuv", _M, blocks, _M)
        q[cid] = (
            np.round(fr.reshape(ph // 8, pw // 8, 64)[:, :, ZIGZAG] / qt)
            .astype(np.int64)
        )

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + np.clip(qt, 1, 255).astype(np.uint8).tobytes())
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for cid in order:
        sof += bytes([cid, 0x11, 0])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, bytes([0x00] + _ENC_DC_COUNTS[:16]) + bytes(_ENC_DC_VALUES))
    out += _seg(0xC4, bytes([0x10] + _ENC_AC_COUNTS[:16]) + bytes(_ENC_AC_VALUES))
    dc_lut, ac_lut = _enc_tables()

    def scan(comp_ids, ss, se, ah, al, body):
        nonlocal out
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            hdr += bytes([cid, 0x00])
        out += _seg(0xDA, hdr + bytes([ss, se, (ah << 4) | al]))
        w_ = _BitWriter()
        body(w_)
        w_.flush()
        out += w_.out

    scan(order, 0, 0, 0, 1, lambda w_: _enc_dc_first(w_, dc_lut, q, order, 1))
    scan(order, 0, 0, 1, 0, lambda w_: _enc_dc_refine(w_, q, order, 0))
    bands = [(1, 5), (6, 63)]
    for cid in order:
        for ss, se in bands:
            scan(
                [cid], ss, se, 0, 1,
                lambda w_, cid=cid, ss=ss, se=se: [
                    _enc_ac_first(w_, ac_lut, q[cid][b // q[cid].shape[1], b % q[cid].shape[1]], ss, se, 1)
                    for b in range(q[cid].shape[0] * q[cid].shape[1])
                ],
            )
    for cid in order:
        for ss, se in bands:
            scan(
                [cid], ss, se, 1, 0,
                lambda w_, cid=cid, ss=ss, se=se: [
                    _enc_ac_refine(w_, ac_lut, q[cid][b // q[cid].shape[1], b % q[cid].shape[1]], ss, se, 0)
                    for b in range(q[cid].shape[0] * q[cid].shape[1])
                ],
            )
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# 12-bit extended-sequential encoder — fixture twin for SOF1 decode.
# Same structure as encode_jpeg (4:4:4 / grayscale, filter tables sized
# for 12-bit categories: DC 0-15 at length 5, AC run/size s<=14 at
# length 9).
# ---------------------------------------------------------------------------

_ENC12_DC_COUNTS = [0, 0, 0, 0, 16] + [0] * 11
_ENC12_DC_VALUES = list(range(16))
_ENC12_AC_COUNTS = [0] * 8 + [226] + [0] * 7
_ENC12_AC_VALUES = (
    [0x00] + [(r << 4) | s for r in range(16) for s in range(1, 15)] + [0xF0]
)


def encode_jpeg_12(img: np.ndarray, qt: np.ndarray | None = None) -> bytes:
    """(H, W, 3) or (H, W) uint16 with 0..4095 samples → 12-bit
    extended-sequential (SOF1) JFIF bytes, 4:4:4 or grayscale."""
    if qt is None:
        qt = np.full(64, 4.0)
    qt = np.asarray(qt, dtype=np.float64)
    img = np.asarray(img)
    if img.max() > 4095:
        raise ValueError("12-bit encoder needs samples in 0..4095")
    gray = img.ndim == 2
    h, w = img.shape[0], img.shape[1]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 2048.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 2048.0,
        ]
    ph = -(-h // 8) * 8
    pw = -(-w // 8) * 8
    planes = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes]
    nc = len(planes)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + np.clip(qt, 1, 255).astype(np.uint8).tobytes())
    sof = bytes([12]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for cid in range(1, nc + 1):
        sof += bytes([cid, 0x11, 0])
    out += _seg(0xC1, sof)
    out += _seg(0xC4, bytes([0x00] + _ENC12_DC_COUNTS) + bytes(_ENC12_DC_VALUES))
    out += _seg(0xC4, bytes([0x10] + _ENC12_AC_COUNTS) + bytes(_ENC12_AC_VALUES))
    sos = bytes([nc]) + b"".join(bytes([cid, 0x00]) for cid in range(1, nc + 1))
    out += _seg(0xDA, sos + bytes([0, 63, 0]))

    dc_lut = {v: k for k, v in _huff_table(_ENC12_DC_COUNTS, _ENC12_DC_VALUES).items()}
    ac_lut = {v: k for k, v in _huff_table(_ENC12_AC_COUNTS, _ENC12_AC_VALUES).items()}
    bw = _BitWriter()
    preds = [0] * nc
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci, p in enumerate(planes):
                preds[ci] = _encode_block(
                    bw, dc_lut, ac_lut, qt,
                    p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                    preds[ci], level=2048.0,
                )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
