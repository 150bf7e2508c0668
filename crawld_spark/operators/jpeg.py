"""Baseline JPEG (ITU-T T.81 sequential DCT) codec in pure numpy + stdlib.

The last common web-image container the multimodal lane stubbed (BMP / PPM /
PGM / GIF / PNG / WAV are already real — operators/multimodal.py). The
decoder is the general article: it parses the marker stream (SOI, APPn/COM
skipped, DQT, SOF0, DHT, DRI, SOS, EOI), builds canonical Huffman tables
FROM THE FILE's DHT segments (so it reads any baseline JPEG, not just this
module's output), entropy-decodes MCUs with byte-unstuffing and RSTn
handling, dequantizes, applies a float64 orthonormal inverse DCT, and
reconstructs grayscale or YCbCr→RGB with per-component sampling factors
(4:4:4, 4:2:2, 4:2:0 — any h,v in {1,2}).

The encoder exists to make test payloads and roundtrip goldens without any
external imaging dependency. It is a valid baseline encoder (real scan
data, real DQT/DHT/SOF0/SOS) that uses fixed canonical Huffman tables —
12 four-bit DC category codes and 162 eight-bit AC run/size codes — rather
than Annex K's optimized lengths: the tables travel in DHT like any
other JPEG's, decoders (including this one) read them from the stream, and
the fixed shape keeps the encoder ~40 lines. Lossy-ness is the format's:
with flat quant tables (``quant=1``) the only loss is forward-DCT
coefficient rounding, bounding reconstruction error to a few counts — the
property the roundtrip tests pin.

Spark never sees this file directly: multimodal.decode_meta routes
``\\xff\\xd8\\xff`` payloads here inside the same mapInPandas Arrow hop,
executor-side, bytes never on the driver. Per-image cost is Python-loop
Huffman decoding — fine for metadata/feature extraction at crawl scale
(each payload decodes once, embarrassingly parallel); a production system
would swap in libjpeg-turbo behind the identical UDF signature.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------- shared tables ----------------

ZIGZAG = np.array(
    [
         0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU T.81 Annex K.1 example quantization tables (the de-facto "quality 50")
QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n.reshape(8, 1)
    t = np.cos((2 * n + 1) * k * np.pi / 16) * 0.5
    t[0, :] *= 1 / np.sqrt(2)
    return t  # orthonormal: X = T @ x @ T.T


_T = _dct_matrix()

# encoder's fixed canonical tables: DC = categories 0..11 at 4 bits,
# AC = the 162 baseline run/size symbols at 8 bits (EOB, ZRL, 16 runs ×
# 10 sizes). Canonical code = its index at that length.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _canonical_codes(bits: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (BITS, HUFFVAL) → {symbol: (code, length)} per T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[syms[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8
_ENC_DC = _canonical_codes(_ENC_DC_BITS, _DC_SYMS)
_ENC_AC = _canonical_codes(_ENC_AC_BITS, _AC_SYMS)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


# ---------------- bit I/O ----------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s per spec convention

    def restart_marker(self, m: int) -> None:
        """Byte-align and emit RSTm — marker bytes are raw, never stuffed."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (m % 8)])


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops at markers; RSTn is
    consumed by ``restart()``."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.p >= len(self.d):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.n += 8
                continue
            b = self.d[self.p]
            if b == 0xFF:
                nxt = self.d[self.p + 1] if self.p + 1 < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.p += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: stop filling, restart() eats it
                else:
                    break  # real marker (EOI etc.): stop filling
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                continue
            self.p += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
            if self.n == 0:
                raise ValueError("jpeg: entropy stream exhausted")
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.acc = 0
        self.n = 0
        if (
            self.p + 1 < len(self.d)
            and self.d[self.p] == 0xFF
            and 0xD0 <= self.d[self.p + 1] <= 0xD7
        ):
            self.p += 2
        else:
            raise ValueError("jpeg: expected restart marker")


class _HuffDecoder:
    """Canonical table → (first_code, first_index) per length; decode walks
    one bit at a time (T.81 F.2.2.3 DECODE)."""

    def __init__(self, bits: list[int], syms: list[int]) -> None:
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        i = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.val_ptr[ln] = i
                self.min_code[ln] = code
                code += bits[ln - 1]
                i += bits[ln - 1]
                self.max_code[ln] = code - 1
            code <<= 1
        self.syms = syms

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read_bit()
            if self.max_code[ln] >= 0 and code <= self.max_code[ln]:
                return self.syms[self.val_ptr[ln] + code - self.min_code[ln]]
        raise ValueError("jpeg: invalid huffman code")


def _extend(v: int, ssss: int) -> int:
    """T.81 F.12: value bits → signed amplitude."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


# ---------------- encoder ----------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0].astype(np.float64), px[..., 1].astype(np.float64), px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _encode_plane_blocks(
    plane: np.ndarray, quant: np.ndarray
) -> tuple[np.ndarray, int, int]:
    """Pad to 8×8 multiples (edge-replicate), forward DCT + quantize.
    Returns (blocks[by, bx, 8, 8] int, blocks_y, blocks_x)."""
    h, w = plane.shape
    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane, ((0, bh - h), (0, bw - w)), mode="edge").astype(np.float64)
    p -= 128.0
    by, bx = bh // 8, bw // 8
    blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(by * bx, 8, 8)
    coef = np.einsum("ij,njk,lk->nil", _T, blocks, _T)
    coef = np.round(coef / quant[None, :, :]).astype(np.int64)
    return coef.reshape(by, bx, 8, 8), by, bx


def _emit_block(bw: _BitWriter, zz: np.ndarray, dc_pred: int) -> int:
    dc = int(zz[0])
    diff = dc - dc_pred
    cat = _category(diff)
    code, ln = _ENC_DC[cat]
    bw.write(code, ln)
    if cat:
        bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = 0
    for i in range(1, 64):
        if zz[i] != 0:
            last_nz = i
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = _ENC_AC[0xF0]
            bw.write(c, l)
            run -= 16
        cat = _category(v)
        c, l = _ENC_AC[(run << 4) | cat]
        bw.write(c, l)
        bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last_nz < 63:
        c, l = _ENC_AC[0x00]
        bw.write(c, l)
    return dc


def _dht_segment(tc: int, th: int, bits: list[int], syms: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    pixels: np.ndarray,
    quant: int | None = None,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JPEG bytes.
    ``quant=None`` uses the Annex K example tables; an int q uses flat
    tables of that step (q=1 ≈ near-lossless). ``subsample`` emits 4:2:0
    (2×2-mean chroma); RGB only. ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that many MCUs (resets DC predictors —
    the random-access/error-resilience feature real encoders use)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if quant is None:
        ql, qc = QUANT_LUM, QUANT_CHROM
    else:
        ql = qc = np.full((8, 8), int(quant), dtype=np.int64)

    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
        quants = [ql]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            ch, cw = -(-h // 2) * 2, -(-w // 2) * 2
            def down(p):
                pp = np.pad(p, ((0, ch - h), (0, cw - w)), mode="edge")
                return pp.reshape(ch // 2, 2, cw // 2, 2).mean(axis=(1, 3))
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        quants = [ql, qc, qc]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in ql.flat[ZIGZAG]
    )
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(
            int(x) for x in qc.flat[ZIGZAG]
        )
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = (samp[ci][0] << 4) | samp[ci][1]
        sof += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT: same fixed tables for both classes' slots 0 and 1
    out += _dht_segment(0, 0, _ENC_DC_BITS, _DC_SYMS)
    out += _dht_segment(1, 0, _ENC_AC_BITS, _AC_SYMS)
    if not gray:
        out += _dht_segment(0, 1, _ENC_DC_BITS, _DC_SYMS)
        out += _dht_segment(1, 1, _ENC_AC_BITS, _AC_SYMS)
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # blocks per component
    comp_blocks = []
    for p, q in zip(planes, quants):
        comp_blocks.append(_encode_plane_blocks(np.asarray(p), q))
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.restart_marker(rst)
                rst += 1
                preds = [0] * ncomp
            mcu_count += 1
            for ci in range(ncomp):
                blocks, by, bx = comp_blocks[ci]
                hi, vi = samp[ci]
                for v in range(vi):
                    for u in range(hi):
                        yb = min(my * vi + v, by - 1)
                        xb = min(mx * hi + u, bx - 1)
                        zz = blocks[yb, xb].reshape(64)[ZIGZAG]
                        preds[ci] = _emit_block(bw, zz, preds[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------- decoder ----------------


def decode_jpeg(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Baseline JPEG bytes → (width, height, channels, uint8 pixels
    (h, w, c)). Raises ValueError on non-baseline (progressive etc.) or
    malformed input — the multimodal router's stub-lane contract."""
    if len(b) < 4 or b[:3] != b"\xff\xd8\xff":
        raise ValueError("jpeg: bad magic")
    p = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0

    while p < len(b):
        if b[p] != 0xFF:
            raise ValueError("jpeg: marker expected")
        m = b[p + 1]
        p += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            raise ValueError("jpeg: EOI before SOS")
        (seglen,) = struct.unpack_from(">H", b, p)
        seg = b[p + 2 : p + seglen]
        p += seglen
        if m == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:  # 16-bit table
                    vals = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = vals
                qtables[tq] = t.reshape(8, 8)
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                syms = list(seg[i + 17 : i + 17 + n])
                huff[(tc, th)] = _HuffDecoder(bits, syms)
                i += 17 + n
        elif m == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: non-baseline SOF not supported")
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:  # SOS: entropy data follows
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            return _decode_scan(
                b, p, w, h, scan, qtables, huff, restart_interval
            )
        # else: APPn / COM / unknown — skipped
    raise ValueError("jpeg: no SOS marker")


def _decode_scan(b, pos, w, h, scan, qtables, huff, restart_interval):
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c, _, _ in scan:
        planes.append(
            np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        )
    br = _BitReader(b, pos)
    preds = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                preds = [0] * len(scan)
            for si, (c, td, ta) in enumerate(scan):
                dq = qtables[c["tq"]]
                dch = huff[(0, td)]
                ach = huff[(1, ta)]
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        ssss = dch.decode(br)
                        diff = _extend(br.read_bits(ssss), ssss)
                        preds[si] += diff
                        zz[0] = preds[si]
                        k = 1
                        while k < 64:
                            rs = ach.decode(br)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            s = rs & 0xF
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * dq.flat[ZIGZAG]
                        blk = _T.T @ coef.reshape(8, 8) @ _T + 128.0
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + u) * 8
                        planes[si][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1

    full = []
    for si, (c, _, _) in enumerate(scan):
        p = planes[si]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, px[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    px = np.clip(np.round(np.stack([r, g, bl], axis=-1)), 0, 255).astype(np.uint8)
    return w, h, 3, px
