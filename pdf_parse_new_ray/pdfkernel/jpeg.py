"""Baseline + progressive JPEG (DCTDecode) decoder — pure numpy.

Reference analogue: ``class JpegImage`` (lib/pdf.js/v4.5.136/build/
pdf.worker.js:12237) decoding /DCTDecode image streams, including its
``decodeScan`` progressive path (successive approximation + spectral
selection, pdf.worker.js:12237+).  This implements the baseline
sequential process of ITU-T T.81 (SOI/APPn/DQT/SOF0/DHT/SOS/DRI markers,
canonical Huffman, run-length AC, byte stuffing, restart intervals,
2x repeat chroma upsampling, JFIF YCbCr->RGB) and the progressive
process (SOF2): multi-scan coefficient accumulation with DC
first/refinement scans, AC spectral bands with EOB-run coding, and
AC successive-approximation refinement (T.81 Annex G).

Text extraction never touches images; this decoder exists so the
multimodal feature stage (stages/multimodal.py) can do REAL decode work
for the most common embedded-image codec instead of a stub.
Arithmetic-coded / hierarchical / lossless JPEGs raise JPEGError
(surfaced as decoded=False).
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
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
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                _alloc_coef_arrays(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
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
            if not frame.get("progressive"):
                scan = {}
                for c in range(ns):
                    cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                    scan[cs] = (tables >> 4, tables & 0xF)
                return _decode_scan(data, pos + seg_len, frame, scan, qt,
                                    huff_dc, huff_ac, restart_interval)
            # progressive: one of many scans — accumulate coefficients,
            # then continue parsing from the next marker
            scan_comps = []
            id_to_idx = {c["id"]: i for i, c in enumerate(frame["comps"])}
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                if cs not in id_to_idx:
                    raise JPEGError(f"scan references unknown component {cs}")
                scan_comps.append((id_to_idx[cs], tables >> 4, tables & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
            if ss > se or se > 63:
                raise JPEGError(f"bad spectral band {ss}..{se}")
            end = _decode_progressive_scan(
                data, pos + seg_len, frame, scan_comps, ss, se, ah, al,
                huff_dc, huff_ac, restart_interval)
            frame["n_scans"] = frame.get("n_scans", 0) + 1
            pos = _next_marker(data, end)
            continue
        elif marker == 0xD9:  # EOI
            break
        pos += seg_len
    if frame is not None and frame.get("progressive") and frame.get("n_scans"):
        return _finish_progressive(frame, qt)
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
    return _planes_to_image(frame, planes)


def _planes_to_image(frame, planes):
    """Upsample component planes to full resolution, crop, color-convert."""
    h_img, w_img = frame["h"], frame["w"]
    comps = frame["comps"]
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
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


# ---------------------------------------------------------------------------
# progressive process (SOF2) — T.81 Annex G
# ---------------------------------------------------------------------------

def _alloc_coef_arrays(frame) -> None:
    """Per-component zigzag-order coefficient stores, padded to the MCU
    grid (interleaved scans walk the padded grid; non-interleaved scans
    walk the component's own ceil(size/8) grid)."""
    comps = frame["comps"]
    h_img, w_img = frame["h"], frame["w"]
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    frame["mcus_x"] = (w_img + 8 * h_max - 1) // (8 * h_max)
    frame["mcus_y"] = (h_img + 8 * v_max - 1) // (8 * v_max)
    for c in comps:
        cw = (w_img * c["h"] + h_max - 1) // h_max
        ch = (h_img * c["v"] + v_max - 1) // v_max
        c["blocks_w"] = (cw + 7) // 8
        c["blocks_h"] = (ch + 7) // 8
        c["coef"] = np.zeros(
            (frame["mcus_y"] * c["v"], frame["mcus_x"] * c["h"], 64),
            dtype=np.int32)


def _next_marker(data: bytes, pos: int) -> int:
    """First real marker (not a stuffed 0xFF00, not RSTn) at/after pos."""
    i = max(0, pos)
    n = len(data)
    while i + 1 < n:
        if data[i] == 0xFF and data[i + 1] != 0x00 and not (0xD0 <= data[i + 1] <= 0xD7):
            return i
        i += 1
    return n


def _dc_first(br, lut_dc, block, pred, ci, al):
    t = _huff_decode(br, lut_dc)
    diff = _extend(br.read_bits(t), t) if t else 0
    pred[ci] += diff
    block[0] = pred[ci] << al


def _dc_refine(br, block, al):
    if br.read_bits(1):
        block[0] |= 1 << al


def _ac_first(br, lut_ac, block, ss, se, al, eobrun: int) -> int:
    """AC first scan for one block (coefficients in zigzag order);
    returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, lut_ac)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise JPEGError("AC index out of spectral band")
        block[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine(br, lut_ac, block, ss, se, al, eobrun: int) -> int:
    """AC successive-approximation refinement for one block (T.81
    G.1.2.3): newly-significant coefficients arrive as (run, 1) symbols
    with a sign bit; already-nonzero coefficients consume one correction
    bit each as the position pointer passes them."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, lut_ac)
            r, s = rs >> 4, rs & 0xF
            ins = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # r == 15: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise JPEGError("bad AC refinement symbol")
                ins = p1 if br.read_bits(1) else m1
            while k <= se:
                if block[k] != 0:
                    if br.read_bits(1) and (block[k] & p1) == 0:
                        block[k] += p1 if block[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if ins and k <= se:
                block[k] = ins
            k += 1
    if eobrun > 0:
        # EOB run covers the rest of this block: still refine every
        # already-nonzero coefficient in the band remainder
        while k <= se:
            if block[k] != 0:
                if br.read_bits(1) and (block[k] & p1) == 0:
                    block[k] += p1 if block[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(data, pos, frame, scan_comps, ss, se, ah, al,
                             huff_dc, huff_ac, dri) -> int:
    """Decode one progressive scan into the frame's coefficient arrays;
    returns the byte position where entropy-coded data ended."""
    comps = frame["comps"]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    eobrun = 0
    is_dc = ss == 0
    if is_dc and se != 0:
        raise JPEGError("DC scan must have Se=0")
    if not is_dc and len(scan_comps) != 1:
        raise JPEGError("AC scans must be non-interleaved")

    def restart():
        nonlocal eobrun
        br.sync_restart()
        for i in range(len(pred)):
            pred[i] = 0
        eobrun = 0

    if len(scan_comps) == 1:
        # non-interleaved: walk the component's own block grid
        ci, dc_t, ac_t = scan_comps[0]
        c = comps[ci]
        coef = c["coef"]
        n_units = 0
        for byi in range(c["blocks_h"]):
            for bxi in range(c["blocks_w"]):
                if dri and n_units and n_units % dri == 0:
                    restart()
                n_units += 1
                block = coef[byi, bxi]
                if is_dc:
                    if ah == 0:
                        _dc_first(br, huff_dc[dc_t], block, pred, ci, al)
                    else:
                        _dc_refine(br, block, al)
                elif ah == 0:
                    eobrun = _ac_first(br, huff_ac[ac_t], block, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine(br, huff_ac[ac_t], block, ss, se, al, eobrun)
    else:
        # interleaved (DC scans only): MCU order over the padded grid
        n_mcu = 0
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                if dri and n_mcu and n_mcu % dri == 0:
                    restart()
                n_mcu += 1
                for ci, dc_t, _ac_t in scan_comps:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block = c["coef"][my * c["v"] + by, mx * c["h"] + bx]
                            if ah == 0:
                                _dc_first(br, huff_dc[dc_t], block, pred, ci, al)
                            else:
                                _dc_refine(br, block, al)
    return br.pos


def _finish_progressive(frame, qt):
    """Dequantize + IDCT the accumulated coefficients (vectorized over all
    blocks of each component) and emit the image."""
    comps = frame["comps"]
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise JPEGError(f"missing quantization table {c['tq']}")
        coef = c["coef"]                                   # (bv, bh, 64) zigzag
        bv, bh = coef.shape[:2]
        deq = coef * qt[c["tq"]][None, None, :]
        nat = np.zeros_like(deq, dtype=np.float64)
        nat[..., _ZIGZAG] = deq
        blocks = nat.reshape(bv, bh, 8, 8)
        px = np.einsum("ki,yxkl,lj->yxij", _C, blocks, _C) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(bv * 8, bh * 8))
    return _planes_to_image(frame, planes)
