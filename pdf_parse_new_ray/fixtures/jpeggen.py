"""Baseline + progressive JPEG encoders for fixtures (test-side
counterpart of pdfkernel/jpeg.py).

Emits spec-valid baseline sequential JPEGs (T.81): JFIF APP0, DQT, SOF0,
DHT, optional DRI/RSTn, SOS — and progressive (SOF2) twins carrying the
SAME quantized coefficients across a DC/AC spectral-selection +
successive-approximation scan script, so progressive decode can be
asserted pixel-exact against baseline.  Huffman tables are deliberately simple —
all 12 DC categories at code length 4 and all 162 AC symbols at length 8
(valid canonical tables, just not size-optimal) — so the decoder's DHT
parsing and canonical-code construction are genuinely exercised without
copying the Annex-K tables.  Supports grayscale, 4:4:4 and 4:2:0 color,
and restart intervals.
"""

from __future__ import annotations

import numpy as np

from ..pdfkernel.jpeg import _C, _ZIGZAG

# quantization: flat-ish tables (DC finer) — any table works, the decoder
# reads whatever DQT declares
_QT_LUMA = np.full(64, 16, dtype=np.int32)
_QT_LUMA[0] = 8
_QT_CHROMA = np.full(64, 24, dtype=np.int32)
_QT_CHROMA[0] = 12

_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_VALS)  # all at code length 8


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.buf <<= (8 - self.nbits)
            self.buf |= (1 << (8 - self.nbits)) - 1  # pad with 1s per spec
            self.out.append(self.buf)
            if self.buf == 0xFF:
                self.out.append(0x00)
            self.buf = 0
            self.nbits = 0


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _encode_block(bw: _BitWriter, block: np.ndarray, q_zz: np.ndarray,
                  pred: int) -> int:
    # forward DCT → zigzag order → quantize (q_zz is zigzag-ordered,
    # matching the coefficient order and the DQT wire format)
    coef = np.round((_C @ (block - 128.0) @ _C.T).reshape(64)[_ZIGZAG] /
                    q_zz.astype(np.float64)).astype(np.int32)
    dc = int(coef[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = _DC_CODES[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODES[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = _AC_CODES[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = _AC_CODES[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_baseline_jpeg(img: np.ndarray, subsample_420: bool = False,
                         restart_interval: int = 0) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB → baseline JPEG bytes."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": img}]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        sf = 2 if subsample_420 else 1
        comps = [{"id": 1, "h": sf, "v": sf, "tq": 0, "plane": y}]
        for cid, p in ((2, cb), (3, cr)):
            if subsample_420:
                ph = (h + 1) // 2
                pw = (w + 1) // 2
                pad = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                p = pad.reshape(ph, 2, pw, 2).mean(axis=(1, 3))
            comps.append({"id": cid, "h": 1, "v": 1, "tq": 1, "plane": p})
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    mcus_x = (w + 8 * h_max - 1) // (8 * h_max)
    mcus_y = (h + 8 * v_max - 1) // (8 * v_max)
    for c in comps:
        pw, ph = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        p = c["plane"]
        c["plane"] = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                            mode="edge")

    # DQT wire format is zigzag order: entry k = q_natural[ZIGZAG[k]]
    qt_luma_zz = _QT_LUMA[_ZIGZAG]
    qt_chroma_zz = _QT_CHROMA[_ZIGZAG]
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(qt_luma_zz.tolist()))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qt_chroma_zz.tolist()))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    dht += bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * len(comps)
    n_mcu = 0
    n_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (n_rst % 8)])
                n_rst += 1
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, c in enumerate(comps):
                q_zz = qt_luma_zz if c["tq"] == 0 else qt_chroma_zz
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        block = c["plane"][y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = _encode_block(bw, block, q_zz, pred[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive (SOF2) encoder — spectral selection + successive approximation
# ---------------------------------------------------------------------------

# progressive AC table additionally needs the EOBn symbols (r<<4)|0 for
# r=1..14 (EOB-run lengths 2..32767); still one flat length-8 canonical set
_AC_VALS_PROG = ([0x00] + [(r << 4) for r in range(1, 15)] + [0xF0]
                 + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_AC_BITS_PROG = [0] * 16
_AC_BITS_PROG[7] = len(_AC_VALS_PROG)
_AC_CODES_PROG = _canonical_codes(_AC_BITS_PROG, _AC_VALS_PROG)


def _quantize_plane(plane: np.ndarray, q_zz: np.ndarray) -> np.ndarray:
    """(H, W) MCU-padded plane → (bv, bh, 64) zigzag-order quantized
    coefficients.  Uses the EXACT per-block expression of _encode_block —
    a vectorized einsum changes float summation order, which flips
    banker's rounding on borderline .5 coefficients and would make the
    progressive fixture diverge from its baseline twin by ±1 quantum."""
    bv, bh = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.empty((bv, bh, 64), dtype=np.int32)
    qf = q_zz.astype(np.float64)
    for by in range(bv):
        for bx in range(bh):
            block = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            out[by, bx] = np.round(
                (_C @ (block - 128.0) @ _C.T).reshape(64)[_ZIGZAG] / qf
            ).astype(np.int32)
    return out


def _flush_eobrun(bw: _BitWriter, eobrun: int) -> int:
    if eobrun > 0:
        r = eobrun.bit_length() - 1
        code, ln = _AC_CODES_PROG[r << 4]
        bw.write(code, ln)
        if r:
            bw.write(eobrun - (1 << r), r)
    return 0


def _ac_first_block(bw: _BitWriter, band: np.ndarray, al: int,
                    eobrun: int) -> int:
    """Encode one block's AC band in a first (Ah=0) scan; accumulates the
    EOB run across blocks (flushed lazily)."""
    mags = np.abs(band) >> al
    vals = np.where(band >= 0, mags, -mags)
    nz = np.nonzero(mags)[0]
    if len(nz) == 0:
        eobrun += 1
        return _flush_eobrun(bw, eobrun) if eobrun == 0x7FFF else eobrun
    eobrun = _flush_eobrun(bw, eobrun)
    run = 0
    for k in range(nz[-1] + 1):
        v = int(vals[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODES_PROG[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = _AC_CODES_PROG[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if nz[-1] < len(band) - 1:
        eobrun += 1
    return eobrun


def _ac_refine_block(bw: _BitWriter, band: np.ndarray, al: int) -> None:
    """Encode one block's AC band in a refinement (Ah=Al+1) scan.  Emits
    a per-block EOB (run length 1) so correction bits buffer only within
    the block (T.81 G.1.2.3; the decoder handles arbitrary runs)."""
    absv = np.abs(band) >> al
    newly = np.nonzero(absv == 1)[0]
    eob_k = newly[-1] if len(newly) else -1
    run = 0
    br_bits: list[int] = []
    for k in range(eob_k + 1):
        t = int(absv[k])
        if t == 0:
            run += 1
            continue
        # ZRLs flush on REACHING any nonzero coefficient (history or new):
        # the decoder's ZRL walk consumes correction bits positionally, so
        # bits buffered after a pending ZRL would misalign the stream
        while run > 15:
            code, ln = _AC_CODES_PROG[0xF0]
            bw.write(code, ln)
            run -= 16
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
        if t > 1:
            br_bits.append(t & 1)  # history coefficient: correction bit
            continue
        code, ln = _AC_CODES_PROG[(run << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if band[k] > 0 else 0, 1)
        for b in br_bits:
            bw.write(b, 1)
        br_bits = []
        run = 0
    # remainder of the band: EOB, then correction bits for the history
    # coefficients the decoder's tail walk will pass
    tail = [int(absv[k]) & 1 for k in range(eob_k + 1, len(band))
            if absv[k] > 1]
    if run or br_bits or tail or eob_k < len(band) - 1:
        code, ln = _AC_CODES_PROG[0x00]
        bw.write(code, ln)
        for b in br_bits + tail:
            bw.write(b, 1)


def encode_progressive_jpeg(img: np.ndarray, subsample_420: bool = False,
                            al_dc: int = 1, al_ac: int = 1,
                            spectral_split: bool = True) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB → progressive JPEG.

    Scan script (the common successive-approximation shape): interleaved
    DC first at Al=al_dc; per-component AC first scans at Al=al_ac (the
    luma band optionally split 1..5 / 6..63); DC refinement; per-component
    AC refinement — exercising every progressive decode path (DC/AC
    first + refine, EOB runs, spectral bands)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": img}]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        sf = 2 if subsample_420 else 1
        comps = [{"id": 1, "h": sf, "v": sf, "tq": 0, "plane": y}]
        for cid, p in ((2, cb), (3, cr)):
            if subsample_420:
                ph = (h + 1) // 2
                pw = (w + 1) // 2
                pad = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                p = pad.reshape(ph, 2, pw, 2).mean(axis=(1, 3))
            comps.append({"id": cid, "h": 1, "v": 1, "tq": 1, "plane": p})
    h_max = max(c["h"] for c in comps)
    v_max = max(c["v"] for c in comps)
    mcus_x = (w + 8 * h_max - 1) // (8 * h_max)
    mcus_y = (h + 8 * v_max - 1) // (8 * v_max)
    qt_zz = {0: _QT_LUMA[_ZIGZAG], 1: _QT_CHROMA[_ZIGZAG]}
    for c in comps:
        pw, ph = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        p = c["plane"]
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        c["coef"] = _quantize_plane(p, qt_zz[c["tq"]])
        cw = (w * c["h"] + h_max - 1) // h_max
        ch = (h * c["v"] + v_max - 1) // v_max
        c["blocks_w"] = (cw + 7) // 8
        c["blocks_h"] = (ch + 7) // 8

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(qt_zz[0].tolist()))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qt_zz[1].tolist()))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC2, sof)  # SOF2: progressive DCT
    dht = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    dht += bytes([0x10]) + bytes(_AC_BITS_PROG) + bytes(_AC_VALS_PROG)
    out += _seg(0xC4, dht)

    def sos_header(scan_comps, ss, se, ah, al) -> bytes:
        hdr = bytes([len(scan_comps)])
        for ci in scan_comps:
            hdr += bytes([comps[ci]["id"], 0x00])
        return _seg(0xDA, hdr + bytes([ss, se, (ah << 4) | al]))

    def dc_scan(ah, al) -> bytes:
        bw = _BitWriter()
        pred = [0] * len(comps)
        if len(comps) == 1:
            c = comps[0]
            for byi in range(c["blocks_h"]):       # single-comp scans are
                for bxi in range(c["blocks_w"]):   # non-interleaved (T.81)
                    _enc_dc(bw, int(c["coef"][byi, bxi, 0]), pred, 0, ah, al)
        else:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci, c in enumerate(comps):
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                _enc_dc(bw, int(c["coef"][my * c["v"] + by,
                                                          mx * c["h"] + bx, 0]),
                                        pred, ci, ah, al)
        bw.flush()
        return sos_header(list(range(len(comps))), 0, 0, ah, al) + bytes(bw.out)

    def ac_scan(ci, ss, se, ah, al) -> bytes:
        bw = _BitWriter()
        c = comps[ci]
        eobrun = 0
        for byi in range(c["blocks_h"]):
            for bxi in range(c["blocks_w"]):
                band = c["coef"][byi, bxi, ss:se + 1]
                if ah == 0:
                    eobrun = _ac_first_block(bw, band, al, eobrun)
                else:
                    _ac_refine_block(bw, band, al)
        _flush_eobrun(bw, eobrun)
        bw.flush()
        return sos_header([ci], ss, se, ah, al) + bytes(bw.out)

    out += dc_scan(0, al_dc)                      # DC first
    for ci in range(len(comps)):                  # AC first scans
        if ci == 0 and spectral_split:
            out += ac_scan(0, 1, 5, 0, al_ac)
            out += ac_scan(0, 6, 63, 0, al_ac)
        else:
            out += ac_scan(ci, 1, 63, 0, al_ac)
    for a in range(al_dc, 0, -1):                 # DC refinement(s)
        out += dc_scan(a, a - 1)
    for a in range(al_ac, 0, -1):                 # AC refinement(s)
        for ci in range(len(comps)):
            out += ac_scan(ci, 1, 63, a, a - 1)
    out += b"\xff\xd9"
    return bytes(out)


def _enc_dc(bw: _BitWriter, dc: int, pred: list, ci: int, ah: int, al: int) -> None:
    if ah == 0:
        v = dc >> al                       # arithmetic shift (G.1.2.1)
        diff = v - pred[ci]
        pred[ci] = v
        t = _category(diff)
        code, ln = _DC_CODES[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    else:
        bw.write((dc >> al) & 1, 1)        # refinement bit
