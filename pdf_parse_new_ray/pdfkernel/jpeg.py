"""Baseline sequential JPEG (DCTDecode) decoder — pure numpy.

Reference analogue: ``class JpegImage`` (lib/pdf.js/v4.5.136/build/
pdf.worker.js:12237) decoding /DCTDecode image streams.  This implements
the baseline sequential process of ITU-T T.81 (SOI/APPn/DQT/SOF0/DHT/
SOS/DRI markers, canonical Huffman, run-length AC, byte stuffing,
restart intervals, 2x repeat chroma upsampling, JFIF YCbCr->RGB).

Text extraction never touches images; this decoder exists so the
multimodal feature stage (stages/multimodal.py) can do REAL decode work
for the most common embedded-image codec instead of a stub.  Progressive
and arithmetic-coded JPEGs raise JPEGError (surfaced as decoded=False).
"""

from __future__ import annotations

import numpy as np


class JPEGError(Exception):
    pass


_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# orthonormal 8-point DCT-II basis (idct = C.T @ X @ C)
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.25) if _k else np.sqrt(0.125))


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-stuffing removal; stops at markers.  Keeps >=16 buffered bits so
    Huffman decode is a single 16-bit-window table lookup."""

    __slots__ = ("data", "pos", "buf", "nbits", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker = None

    def _fill(self) -> None:
        data, n = self.data, len(self.data)
        pos, buf, nbits = self.pos, self.buf, self.nbits
        while nbits <= 24:
            b = 0
            if pos < n:
                b = data[pos]
                if b == 0xFF:
                    nxt = data[pos + 1] if pos + 1 < n else 0xD9
                    if nxt == 0x00:
                        pos += 2  # stuffed 0xFF data byte
                    else:
                        # marker (RSTn handled by sync_restart; EOI/other
                        # ends the scan): stop consuming, pad with zeros
                        self.marker = nxt
                        b = 0
                else:
                    pos += 1
            buf = ((buf << 8) | b) & 0xFFFFFFFF
            nbits += 8
        self.pos, self.buf, self.nbits = pos, buf, nbits

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.buf >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n

    def read_bits(self, n: int) -> int:
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.buf >> self.nbits) & ((1 << n) - 1)

    def sync_restart(self) -> None:
        """Consume a pending RSTn marker and realign to a byte boundary."""
        # discard buffered bits, skip to the marker in the byte stream
        i = self.pos
        data = self.data
        while i + 1 < len(data):
            if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7:
                self.pos = i + 2
                self.buf = 0
                self.nbits = 0
                self.marker = None
                return
            i += 1
        raise JPEGError("restart marker expected")


def _build_huffman(bits: list[int], vals: list[int]):
    """Canonical Huffman → flat 16-bit-window LUT: lut[w] = (length << 8)
    | value for every 16-bit window whose prefix is the code; 0 = invalid."""
    lut = np.zeros(1 << 16, dtype=np.uint16)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            lut[lo:hi] = (length << 8) | vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut


def _huff_decode(br: _BitReader, lut: np.ndarray) -> int:
    e = int(lut[br.peek16()])
    if e == 0:
        raise JPEGError("invalid Huffman code")
    br.skip(e >> 8)
    return e & 0xFF


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode baseline JPEG → (height, width, n_components, uint8 array of
    shape (H, W) or (H, W, 3) in RGB)."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise JPEGError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2: pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    tbl = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    tbl = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                qt[tq] = tbl
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = seg[0]
            if prec != 8:
                raise JPEGError(f"unsupported precision {prec}")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JPEGError(f"unsupported JPEG process (marker 0xFF{marker:02X})")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JPEGError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = (tables >> 4, tables & 0xF)
            return _decode_scan(data, pos + seg_len, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        elif marker == 0xD9:  # EOI
            break
        pos += seg_len
    raise JPEGError("no scan data (missing SOS)")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    h_img, w_img = frame["h"], frame["w"]
    comps = frame["comps"]
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * h_max, 8 * v_max
    mcus_x = (w_img + mcu_w - 1) // mcu_w
    mcus_y = (h_img + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        pw, ph = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n_mcu and n_mcu % dri == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan[c["id"]]
                lut_dc, lut_ac = huff_dc[dc_t], huff_ac[ac_t]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(br, lut_dc)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, lut_ac)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JPEGError("AC index out of range")
                            coef[k] = _extend(br.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = coef * q
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
    # upsample to full resolution and crop
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != h_max or c["v"] != v_max:
            p = np.repeat(np.repeat(p, v_max // c["v"], axis=0),
                          h_max // c["h"], axis=1)
        out_planes.append(p[:h_img, :w_img])
    if len(comps) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return h_img, w_img, 1, gray
    if len(comps) == 3:
        y, cb, cr = out_planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        return h_img, w_img, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise JPEGError(f"unsupported component count {len(comps)}")
