"""Pure-Python baseline JPEG codec (numpy + stdlib only).

Implements the baseline sequential DCT process of ITU-T T.81 (the public
JPEG spec): 8-bit samples, Huffman entropy coding, JFIF container. The
container has no media libraries, so this is the real-format path for the
multimodal column operators (``operators/multimodal.py``) — the same role
``decode_png``/``decode_bmp`` play, one format further.

Scope (and honest limits):
- encode: 4:4:4 (no chroma subsampling), the spec's example quantization
  tables (Annex K.1/K.2) scaled by the familiar libjpeg quality curve, the
  spec's example Huffman tables (Annex K.3).
- decode: any baseline (SOF0) stream with 8-bit precision, 1 or 3
  components, arbitrary h/v sampling factors up to 2 (covers 4:4:4, 4:2:2,
  4:2:0), restart markers, multiple DQT/DHT segments. Progressive (SOF2),
  arithmetic coding, and 12-bit precision raise ``ValueError``.

Everything here derives from the public spec; per-block transforms are
vectorized numpy (DCT as an 8×8 matrix sandwich), the entropy coder is a
Python bit loop — acceptable for the feature-extraction path, which runs
inside Arrow-batched ``mapInPandas`` workers on opaque binary columns.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

# Annex K.1 / K.2 example quantization tables (natural order, row-major)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# zigzag scan order: _ZIGZAG[i] = flat (row-major) index of the i-th
# coefficient in scan order
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.3 example Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8-point DCT-II basis matrix: _C @ block @ _C.T is the forward 2-D DCT
_C = np.array([
    [np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8) * np.cos((2 * n + 1) * k * np.pi / 16)
     for n in range(8)]
    for k in range(8)
])


def _canonical_codes(bits: list[int], huffval: list[int]):
    """T.81 C.2: canonical (code, length) per symbol from BITS/HUFFVAL."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ------------------------------------------------------------------ encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    out = (qt * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """(SSSS category, value bits) for a DC diff / AC coefficient (F.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) → (N, 8, 8) blocks in
    raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def encode_jpeg(px: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) RGB uint8 → baseline JFIF bytes (4:4:4, Annex K tables)."""
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ycc = _rgb_to_ycbcr(px.reshape(h, w, 3))
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    qts = [_quality_scale(_QT_LUMA, quality), _quality_scale(_QT_CHROMA, quality)]

    comp_blocks = []
    for ci in range(3):
        plane = np.empty((ph, pw))
        plane[:h, :w] = ycc[..., ci]
        plane[h:, :w] = plane[h - 1: h, :w]  # edge-replicate padding
        plane[:, w:] = plane[:, w - 1: w]
        blocks = _blockify(plane - 128.0)
        coef = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
        q = qts[0 if ci == 0 else 1]
        quant = np.round(coef / q).astype(np.int32).reshape(-1, 64)[:, _ZIGZAG]
        comp_blocks.append(quant)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(qt.reshape(-1)[_ZIGZAG].astype(np.uint8))
    # SOF0: 8-bit, 3 components, all 1x1 sampling (4:4:4)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid in range(3):
        out += bytes([cid + 1, 0x11, 0 if cid == 0 else 1])
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in range(3):
        out += bytes([cid + 1, 0x00 if cid == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    bw = _BitWriter()
    dc_l, ac_l = _canonical_codes(*_DC_LUMA), _canonical_codes(*_AC_LUMA)
    dc_c, ac_c = _canonical_codes(*_DC_CHROMA), _canonical_codes(*_AC_CHROMA)
    # 4:4:4 with 1x1 factors ⇒ MCU = one block per component, interleaved
    n = comp_blocks[0].shape[0]
    preds = [0, 0, 0]
    for bi in range(n):
        for ci in range(3):
            blk = comp_blocks[ci][bi]
            dc_codes = dc_l if ci == 0 else dc_c
            ac_codes = ac_l if ci == 0 else ac_c
            diff = int(blk[0]) - preds[ci]
            preds[ci] = int(blk[0])
            ssss, bits = _magnitude(diff)
            code, ln = dc_codes[ssss]
            bw.write(code, ln)
            if ssss:
                bw.write(bits, ssss)
            run = 0
            nz = np.nonzero(blk[1:])[0]
            last = int(nz[-1]) + 1 if len(nz) else 0
            for i in range(1, last + 1):
                v = int(blk[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                ssss, bits = _magnitude(v)
                code, ln = ac_codes[(run << 4) | ssss]
                bw.write(code, ln)
                bw.write(bits, ssss)
                run = 0
            if last < 63:
                code, ln = ac_codes[0x00]
                bw.write(code, ln)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decoder

class _BitReader:
    """Entropy-segment bit reader with 0xFF00 de-stuffing; stops cleanly at
    markers (returns them via .marker)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller
                    self.marker = nxt
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
                else:  # real marker: stop feeding data
                    self.marker = nxt
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self):
        """Skip to just past the next RST marker and reset bit state."""
        # discard buffered bits, scan the raw stream
        self.acc = self.nbits = 0
        self.marker = None
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("truncated JPEG: missing restart marker")


def _decode_huffman(br: _BitReader, codes: dict) -> int:
    """codes: {(length, code): symbol}; reads bits until a code matches."""
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = codes.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, ssss: int) -> int:
    """F.2.2.1 EXTEND: map magnitude bits back to a signed value."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline JFIF/JPEG bytes → (width, height, (h, w, 3) RGB uint8).

    Grayscale streams replicate Y into all three channels.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    data = payload

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            if marker == 0xD9:
                break
            continue
        seglen = struct.unpack(">H", data[pos: pos + 2])[0]
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    raise ValueError("16-bit quant tables unsupported (baseline only)")
                tbl = np.frombuffer(seg[p: p + 64], dtype=np.uint8).astype(np.int32)
                qts[tq] = tbl[_UNZIGZAG].reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1: p + 17])
                nval = sum(bits)
                vals = list(seg[p + 17: p + 17 + nval])
                by_sym = _canonical_codes(bits, vals)
                huff[(cls, tid)] = {(ln, code): s for s, (code, ln) in by_sym.items()}
                p += 17 + nval
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            for i in range(nc):
                cid, sf, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG (SOF0) supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scomp = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                c = next(c for c in comps if c["id"] == cs)
                c["dc"] = huff[(0, tables >> 4)]
                c["ac"] = huff[(1, tables & 0xF)]
                scomp.append(c)
            pos += seglen
            return _decode_scan(data, pos, w, h, scomp, qts, restart_interval)
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, w, h, comps, qts, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        c["coef"] = np.zeros((bh * bw, 64), dtype=np.int32)
        c["bw"] = bw
        c["pred"] = 0

    br = _BitReader(data, pos)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.sync_restart()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["coef"][(my * c["v"] + by) * c["bw"] + mx * c["h"] + bx]
                        ssss = _decode_huffman(br, c["dc"])
                        diff = _extend(br.read_bits(ssss), ssss) if ssss else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _decode_huffman(br, c["ac"])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            blk[k] = _extend(br.read_bits(s), s)
                            k += 1
            mcu += 1

    planes = []
    for c in comps:
        q = qts[c["tq"]].reshape(-1)
        coef = (c["coef"][:, _UNZIGZAG] * q[None, :]).reshape(-1, 8, 8).astype(np.float64)
        px = np.einsum("ji,njk,kl->nil", _C, coef, _C)  # inverse DCT
        bh = coef.shape[0] // c["bw"]
        plane = (
            px.reshape(bh, c["bw"], 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, c["bw"] * 8)
        ) + 128.0
        # upsample to full resolution (nearest/pixel replication)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        rgb = np.stack([y, y, y], axis=-1)
    else:
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8)
