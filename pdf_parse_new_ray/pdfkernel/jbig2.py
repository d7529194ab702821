"""JBIG2 decoder (ITU-T T.88) — embedded-PDF flavor (`JBIG2Decode`).

From-scratch Python implementation of the bi-level image coding the
reference decodes through pdf.js's pure-JS jbig2 module
(/root/reference/lib/pdf.js/v4.5.136/build/pdf.worker.js:9216-10973,
src/core/jbig2.js).  Covered, matching the reference's observable
behavior byte-exactly (verified differentially in tests/test_jbig2.py
by running the live reference decoder under node):

  - MQ arithmetic decoder (T.88 Annex E; identical state machine to the
    JPEG2000 one, software-conventions register split)
  - arithmetic integer decoding IAx + IAID (Annex A)
  - generic region decoding, templates 0-3, AT pixels, TPGDON typical
    prediction, plus MMR=1 via the kernel's CCITT T.6 decoder
  - generic refinement decoding, templates 0-1 (no TPGRON)
  - symbol dictionary (arithmetic; refinement-aggregate included) and
    text regions (arithmetic; transposed, all reference corners, OR/XOR)
  - pattern dictionary + halftone regions (arithmetic and MMR planes)
  - segment headers (embedded organization), page assembly with
    OR/XOR composition and unknown-length generic regions

Not covered (raises JBIG2Error, callers absorb to decoded=False):
Huffman-coded symbol dicts / text regions (rare in PDF producers, which
overwhelmingly emit arithmetic coding), retained bitmap coding contexts.

Bitmaps are lists of bytearray rows with 1 = black, the page is packed
MSB-first 1 bpp exactly like the reference's SimpleSegmentVisitor buffer.
"""

from __future__ import annotations

import struct

import numpy as np


class JBIG2Error(Exception):
    pass


# DoS-safety deviation from the reference: fuzzed u32 dimension fields
# would otherwise allocate gigabytes / loop for hours in the per-pixel
# arithmetic decode.  Real scans are < 2^15 px per side; 2^20 is far
# beyond any legitimate bitmap while keeping mutations cheap to reject.
_MAX_DIM = 1 << 20


def _check_dims(width: int, height: int, what: str) -> None:
    if not (0 <= width <= _MAX_DIM and 0 <= height <= _MAX_DIM) \
            or width * height > (1 << 27):
        raise JBIG2Error(f"implausible {what} size {width}x{height}")


# ---------------------------------------------------------------------------
# MQ arithmetic decoder (T.88 Annex E / T.800 Annex C — public spec table)
# ---------------------------------------------------------------------------

# (Qe, NMPS, NLPS, SWITCH)
_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class MQDecoder:
    """MQ decoder with the register split into (chigh, clow) 16-bit
    halves (the software-conventions variant of Annex E, which is also
    what the reference runs — required for byte-exact parity at data-end
    edge cases)."""

    __slots__ = ("data", "bp", "end", "chigh", "clow", "a", "ct")

    def __init__(self, data, start: int, end: int):
        self.data = data
        self.bp = start
        self.end = end
        n = len(data)
        self.chigh = data[start] if start < n else 0
        self.clow = 0
        self._bytein()
        self.chigh = ((self.chigh << 7) & 0xFFFF) | ((self.clow >> 9) & 0x7F)
        self.clow = (self.clow << 7) & 0xFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data, bp, n = self.data, self.bp, len(self.data)
        if bp < n and data[bp] == 0xFF:
            if bp + 1 < n and data[bp + 1] > 0x8F:
                self.clow += 0xFF00
                self.ct = 8
            else:
                bp += 1
                self.clow += (data[bp] << 9) if bp < n else 0
                self.ct = 7
                self.bp = bp
        else:
            bp += 1
            self.clow += (data[bp] << 8) if bp < self.end and bp < n else 0xFF00
            self.ct = 8
            self.bp = bp
        if self.clow > 0xFFFF:
            self.chigh += self.clow >> 16
            self.clow &= 0xFFFF

    def read_bit(self, cx: bytearray, pos: int) -> int:
        state = cx[pos]
        icx = state >> 1
        mps = state & 1
        qe, nmps, nlps, switch = _QE[icx]
        a = self.a - qe
        if self.chigh < qe:
            # LPS range decode with conditional exchange
            if a < qe:
                a = qe
                d = mps
                icx = nmps
            else:
                a = qe
                d = 1 ^ mps
                if switch:
                    mps = d
                icx = nlps
        else:
            self.chigh -= qe
            if a & 0x8000:
                self.a = a
                return mps
            if a < qe:
                d = 1 ^ mps
                if switch:
                    mps = d
                icx = nlps
            else:
                d = mps
                icx = nmps
        # renormalize
        while True:
            if self.ct == 0:
                self._bytein()
            a <<= 1
            self.chigh = ((self.chigh << 1) & 0xFFFF) | ((self.clow >> 15) & 1)
            self.clow = (self.clow << 1) & 0xFFFF
            self.ct -= 1
            if a & 0x8000:
                break
        self.a = a
        cx[pos] = (icx << 1) | mps
        return d


class ContextCache(dict):
    """Per-procedure adaptive context stores (IADH, IADW, ..., GB, GR)."""

    def get_contexts(self, name: str) -> bytearray:
        ctx = self.get(name)
        if ctx is None:
            ctx = self[name] = bytearray(1 << 16)
        return ctx


# ---------------------------------------------------------------------------
# Annex A: arithmetic integer + symbol-ID decoding
# ---------------------------------------------------------------------------

def decode_integer(cache: ContextCache, name: str, mq: MQDecoder):
    """IAx integer decoding procedure (A.2).  Returns None for OOB."""
    cx = cache.get_contexts(name)
    prev = 1

    def bits(length: int) -> int:
        nonlocal prev
        v = 0
        for _ in range(length):
            bit = mq.read_bit(cx, prev)
            prev = (prev << 1) | bit if prev < 256 else \
                ((((prev << 1) | bit) & 511) | 256)
            v = (v << 1) | bit
        return v

    sign = bits(1)
    if bits(1):
        if bits(1):
            if bits(1):
                if bits(1):
                    if bits(1):
                        value = bits(32) + 4436
                    else:
                        value = bits(12) + 340
                else:
                    value = bits(8) + 84
            else:
                value = bits(6) + 20
        else:
            value = bits(4) + 4
    else:
        value = bits(2)
    if sign == 0:
        return value
    if value > 0:
        return -value
    return None  # OOB: negative zero


def decode_iaid(cache: ContextCache, mq: MQDecoder, code_length: int) -> int:
    """IAID symbol-ID decoding (A.3): a code_length-bit tree walk."""
    cx = cache.get_contexts("IAID")
    prev = 1
    for _ in range(code_length):
        prev = (prev << 1) | mq.read_bit(cx, prev)
    return prev - (1 << code_length)


def _log2(x: int) -> int:
    if x <= 0:
        return 0
    return (x - 1).bit_length()


# ---------------------------------------------------------------------------
# 6.2 Generic region decoding
# ---------------------------------------------------------------------------

# fixed template pixels per GB template (T.88 figures 4-7), AT slots appended
_CODING_TEMPLATES = (
    ((-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1), (1, -1),
     (2, -1), (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
    ((-1, -2), (0, -2), (1, -2), (2, -2), (-2, -1), (-1, -1), (0, -1),
     (1, -1), (2, -1), (-3, 0), (-2, 0), (-1, 0)),
    ((-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1), (1, -1),
     (-2, 0), (-1, 0)),
    ((-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (-4, 0), (-3, 0),
     (-2, 0), (-1, 0)),
)
# TPGDON pseudo-pixel context per template (T.88 6.2.5.7)
_TPGDON_CONTEXTS = (0x9B25, 0x0795, 0x00E5, 0x0195)

_REFINEMENT_TEMPLATES = (
    # (coding pixels, reference pixels) — template 0 gets AT1 appended to
    # coding and AT2 to reference
    (((0, -1), (1, -1), (-1, 0)),
     ((0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1))),
    (((-1, -1), (0, -1), (1, -1), (-1, 0)),
     ((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1))),
)
_TPGRON_CONTEXTS = (0x0020, 0x0008)


def decode_generic(mq_or_data, width: int, height: int, template: int,
                   prediction: bool, skip, at, cache: ContextCache,
                   mmr: bool = False, mmr_data: bytes = b""):
    """Decode one generic region → list of bytearray rows (1 = black).

    Context labels concatenate template pixels sorted by (y, x) — a
    bijective relabeling of the spec's figure layout, matching the
    reference's canonicalization so the adaptive statistics align for
    differential testing."""
    _check_dims(width, height, "generic region")
    if mmr:
        from .ccitt import decode_ccitt

        try:
            img = decode_ccitt(bytes(mmr_data), columns=width, rows=height,
                               k=-1)
        except Exception as e:
            raise JBIG2Error(f"MMR region: {e}") from e
        return [bytearray(row) for row in img.tolist()]

    mq = mq_or_data
    template_px = sorted(list(_CODING_TEMPLATES[template]) + list(at),
                         key=lambda p: (p[1], p[0]))
    tlen = len(template_px)
    # incremental context reuse: a pixel immediately right of its
    # predecessor on the same row shifts in with the label
    reuse_mask = 0
    changing = []
    min_x = max_x = min_y = 0
    for k, (x, y) in enumerate(template_px):
        min_x = min(min_x, x)
        max_x = max(max_x, x)
        min_y = min(min_y, y)
        if (k < tlen - 1 and template_px[k + 1][1] == y
                and template_px[k + 1][0] == x + 1):
            reuse_mask |= 1 << (tlen - 1 - k)
        else:
            changing.append((x, y, 1 << (tlen - 1 - k)))
    sbb_left = -min_x
    sbb_top = -min_y
    sbb_right = width - max_x
    pseudo = _TPGDON_CONTEXTS[template]
    cx = cache.get_contexts("GB")
    bitmap: list[bytearray] = []
    row = bytearray(width)
    ltp = 0
    read_bit = mq.read_bit
    for i in range(height):
        if prediction:
            ltp ^= read_bit(cx, pseudo)
            if ltp:
                bitmap.append(row)
                continue
        row = bytearray(row)
        bitmap.append(row)
        label = 0
        for j in range(width):
            if skip is not None and skip[i][j]:
                row[j] = 0
                continue
            if sbb_left <= j < sbb_right and i >= sbb_top:
                label = (label << 1) & reuse_mask
                for x, y, bit in changing:
                    if bitmap[i + y][j + x]:
                        label |= bit
            else:
                label = 0
                shift = tlen - 1
                for x, y in template_px:
                    j0 = j + x
                    if 0 <= j0 < width:
                        i0 = i + y
                        if i0 >= 0 and bitmap[i0][j0]:
                            label |= 1 << shift
                    shift -= 1
            pixel = read_bit(cx, label)
            row[j] = pixel
    return bitmap


def decode_refinement(mq: MQDecoder, width: int, height: int, template: int,
                      reference, offset_x: int, offset_y: int,
                      prediction: bool, at, cache: ContextCache):
    """6.3 generic refinement decoding (no typical prediction rows)."""
    _check_dims(width, height, "refinement region")
    coding = list(_REFINEMENT_TEMPLATES[template][0])
    ref_tpl = list(_REFINEMENT_TEMPLATES[template][1])
    if template == 0:
        coding.append(tuple(at[0]))
        ref_tpl.append(tuple(at[1]))
    ref_w = len(reference[0])
    ref_h = len(reference)
    pseudo = _TPGRON_CONTEXTS[template]
    cx = cache.get_contexts("GR")
    bitmap: list[bytearray] = []
    ltp = 0
    for i in range(height):
        if prediction:
            ltp ^= mq.read_bit(cx, pseudo)
            if ltp:
                raise JBIG2Error("refinement typical prediction rows "
                                 "are not supported")
        row = bytearray(width)
        bitmap.append(row)
        for j in range(width):
            label = 0
            for x, y in coding:
                i0 = i + y
                j0 = j + x
                if i0 < 0 or j0 < 0 or j0 >= width:
                    label <<= 1
                else:
                    label = (label << 1) | bitmap[i0][j0]
            for x, y in ref_tpl:
                i0 = i + y - offset_y
                j0 = j + x - offset_x
                if i0 < 0 or i0 >= ref_h or j0 < 0 or j0 >= ref_w:
                    label <<= 1
                else:
                    label = (label << 1) | reference[i0][j0]
            row[j] = mq.read_bit(cx, label)
    return bitmap


# ---------------------------------------------------------------------------
# Annex B: Huffman tables (standard B.1-B.15, custom table segments)
# ---------------------------------------------------------------------------

class BitReader:
    """MSB-first bit reader for Huffman-coded segment data (no byte
    stuffing; byte_align drops the partial byte)."""

    __slots__ = ("data", "pos", "end", "shift", "cur")

    def __init__(self, data, start: int, end: int):
        self.data = data
        self.pos = start
        self.end = end
        self.shift = -1
        self.cur = 0

    def read_bit(self) -> int:
        if self.shift < 0:
            if self.pos >= self.end:
                raise JBIG2Error("end of data while reading bit")
            self.cur = self.data[self.pos]
            self.pos += 1
            self.shift = 7
        bit = (self.cur >> self.shift) & 1
        self.shift -= 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.shift = -1


class HuffmanLine:
    """(range_low, prefix_length, range_length, prefix_code[, lower]) or
    (prefix_length, prefix_code) for the OOB line — the spec's Table
    B.x row shape."""

    __slots__ = ("range_low", "prefix_length", "range_length",
                 "prefix_code", "is_lower", "is_oob")

    def __init__(self, spec):
        if len(spec) == 2:
            self.is_oob = True
            self.range_low = 0
            self.prefix_length = spec[0]
            self.range_length = 0
            self.prefix_code = spec[1]
            self.is_lower = False
        else:
            self.is_oob = False
            self.range_low = spec[0]
            self.prefix_length = spec[1]
            self.range_length = spec[2]
            self.prefix_code = spec[3]
            self.is_lower = len(spec) > 4 and spec[4] == "lower"


class HuffmanTable:
    def __init__(self, lines: list, codes_assigned: bool):
        if not codes_assigned:
            self._assign_codes(lines)
        self.lines = lines
        self._by_code = {}
        self._max_len = 0
        for ln in lines:
            if ln.prefix_length > 0:
                key = (ln.prefix_length, ln.prefix_code)
                if key in self._by_code:
                    raise JBIG2Error("duplicate Huffman prefix code")
                self._by_code[key] = ln
                self._max_len = max(self._max_len, ln.prefix_length)

    @staticmethod
    def _assign_codes(lines: list) -> None:
        """Canonical code assignment (B.3) from prefix lengths."""
        max_len = max((ln.prefix_length for ln in lines), default=0)
        hist = [0] * (max_len + 1)
        for ln in lines:
            hist[ln.prefix_length] += 1
        hist[0] = 0
        first = 0
        for length in range(1, max_len + 1):
            first = (first + hist[length - 1]) << 1
            code = first
            for ln in lines:
                if ln.prefix_length == length:
                    ln.prefix_code = code
                    code += 1

    def decode(self, br: BitReader):
        length = 0
        code = 0
        while True:
            code = (code << 1) | br.read_bit()
            length += 1
            if length > self._max_len:
                raise JBIG2Error("invalid Huffman data")
            ln = self._by_code.get((length, code))
            if ln is None:
                continue
            if ln.is_oob:
                return None
            offset = br.read_bits(ln.range_length)
            return ln.range_low + (-offset if ln.is_lower else offset)


# standard tables B.1-B.15 (T.88 Annex B, public constants; codes given)
_STANDARD_TABLE_SPECS = {
    1: [(0, 1, 4, 0x0), (16, 2, 8, 0x2), (272, 3, 16, 0x6),
        (65808, 3, 32, 0x7)],
    2: [(0, 1, 0, 0x0), (1, 2, 0, 0x2), (2, 3, 0, 0x6), (3, 4, 3, 0xE),
        (11, 5, 6, 0x1E), (75, 6, 32, 0x3E), (6, 0x3F)],
    3: [(-256, 8, 8, 0xFE), (0, 1, 0, 0x0), (1, 2, 0, 0x2), (2, 3, 0, 0x6),
        (3, 4, 3, 0xE), (11, 5, 6, 0x1E), (-257, 8, 32, 0xFF, "lower"),
        (75, 7, 32, 0x7E), (6, 0x3E)],
    4: [(1, 1, 0, 0x0), (2, 2, 0, 0x2), (3, 3, 0, 0x6), (4, 4, 3, 0xE),
        (12, 5, 6, 0x1E), (76, 5, 32, 0x1F)],
    5: [(-255, 7, 8, 0x7E), (1, 1, 0, 0x0), (2, 2, 0, 0x2), (3, 3, 0, 0x6),
        (4, 4, 3, 0xE), (12, 5, 6, 0x1E), (-256, 7, 32, 0x7F, "lower"),
        (76, 6, 32, 0x3E)],
    6: [(-2048, 5, 10, 0x1C), (-1024, 4, 9, 0x8), (-512, 4, 8, 0x9),
        (-256, 4, 7, 0xA), (-128, 5, 6, 0x1D), (-64, 5, 5, 0x1E),
        (-32, 4, 5, 0xB), (0, 2, 7, 0x0), (128, 3, 7, 0x2),
        (256, 3, 8, 0x3), (512, 4, 9, 0xC), (1024, 4, 10, 0xD),
        (-2049, 6, 32, 0x3E, "lower"), (2048, 6, 32, 0x3F)],
    7: [(-1024, 4, 9, 0x8), (-512, 3, 8, 0x0), (-256, 4, 7, 0x9),
        (-128, 5, 6, 0x1A), (-64, 5, 5, 0x1B), (-32, 4, 5, 0xA),
        (0, 4, 5, 0xB), (32, 5, 5, 0x1C), (64, 5, 6, 0x1D),
        (128, 4, 7, 0xC), (256, 3, 8, 0x1), (512, 3, 9, 0x2),
        (1024, 3, 10, 0x3), (-1025, 5, 32, 0x1E, "lower"),
        (2048, 5, 32, 0x1F)],
    8: [(-15, 8, 3, 0xFC), (-7, 9, 1, 0x1FC), (-5, 8, 1, 0xFD),
        (-3, 9, 0, 0x1FD), (-2, 7, 0, 0x7C), (-1, 4, 0, 0xA),
        (0, 2, 1, 0x0), (2, 5, 0, 0x1A), (3, 6, 0, 0x3A), (4, 3, 4, 0x4),
        (20, 6, 1, 0x3B), (22, 4, 4, 0xB), (38, 4, 5, 0xC),
        (70, 5, 6, 0x1B), (134, 5, 7, 0x1C), (262, 6, 7, 0x3C),
        (390, 7, 8, 0x7D), (646, 6, 10, 0x3D),
        (-16, 9, 32, 0x1FE, "lower"), (1670, 9, 32, 0x1FF), (2, 0x1)],
    9: [(-31, 8, 4, 0xFC), (-15, 9, 2, 0x1FC), (-11, 8, 2, 0xFD),
        (-7, 9, 1, 0x1FD), (-5, 7, 1, 0x7C), (-3, 4, 1, 0xA),
        (-1, 3, 1, 0x2), (1, 3, 1, 0x3), (3, 5, 1, 0x1A), (5, 6, 1, 0x3A),
        (7, 3, 5, 0x4), (39, 6, 2, 0x3B), (43, 4, 5, 0xB),
        (75, 4, 6, 0xC), (139, 5, 7, 0x1B), (267, 5, 8, 0x1C),
        (523, 6, 8, 0x3C), (779, 7, 9, 0x7D), (1291, 6, 11, 0x3D),
        (-32, 9, 32, 0x1FE, "lower"), (3339, 9, 32, 0x1FF), (2, 0x0)],
    10: [(-21, 7, 4, 0x7A), (-5, 8, 0, 0xFC), (-4, 7, 0, 0x7B),
         (-3, 5, 0, 0x18), (-2, 2, 2, 0x0), (2, 5, 0, 0x19),
         (3, 6, 0, 0x36), (4, 7, 0, 0x7C), (5, 8, 0, 0xFD),
         (6, 2, 6, 0x1), (70, 5, 5, 0x1A), (102, 6, 5, 0x37),
         (134, 6, 6, 0x38), (198, 6, 7, 0x39), (326, 6, 8, 0x3A),
         (582, 6, 9, 0x3B), (1094, 6, 10, 0x3C), (2118, 7, 11, 0x7D),
         (-22, 8, 32, 0xFE, "lower"), (4166, 8, 32, 0xFF), (2, 0x2)],
    11: [(1, 1, 0, 0x0), (2, 2, 1, 0x2), (4, 4, 0, 0xC), (5, 4, 1, 0xD),
         (7, 5, 1, 0x1C), (9, 5, 2, 0x1D), (13, 6, 2, 0x3C),
         (17, 7, 2, 0x7A), (21, 7, 3, 0x7B), (29, 7, 4, 0x7C),
         (45, 7, 5, 0x7D), (77, 7, 6, 0x7E), (141, 7, 32, 0x7F)],
    12: [(1, 1, 0, 0x0), (2, 2, 0, 0x2), (3, 3, 1, 0x6), (5, 5, 0, 0x1C),
         (6, 5, 1, 0x1D), (8, 6, 1, 0x3C), (10, 7, 0, 0x7A),
         (11, 7, 1, 0x7B), (13, 7, 2, 0x7C), (17, 7, 3, 0x7D),
         (25, 7, 4, 0x7E), (41, 8, 5, 0xFE), (73, 8, 32, 0xFF)],
    13: [(1, 1, 0, 0x0), (2, 3, 0, 0x4), (3, 4, 0, 0xC), (4, 5, 0, 0x1C),
         (5, 4, 1, 0xD), (7, 3, 3, 0x5), (15, 6, 1, 0x3A),
         (17, 6, 2, 0x3B), (21, 6, 3, 0x3C), (29, 6, 4, 0x3D),
         (45, 6, 5, 0x3E), (77, 7, 6, 0x7E), (141, 7, 32, 0x7F)],
    14: [(-2, 3, 0, 0x4), (-1, 3, 0, 0x5), (0, 1, 0, 0x0), (1, 3, 0, 0x6),
         (2, 3, 0, 0x7)],
    15: [(-24, 7, 4, 0x7C), (-8, 6, 2, 0x3C), (-4, 5, 1, 0x1C),
         (-2, 4, 0, 0xC), (-1, 3, 0, 0x4), (0, 1, 0, 0x0), (1, 3, 0, 0x5),
         (2, 4, 0, 0xD), (3, 5, 1, 0x1D), (5, 6, 2, 0x3D),
         (9, 7, 4, 0x7D), (-25, 7, 32, 0x7E, "lower"), (25, 7, 32, 0x7F)],
}
_STANDARD_TABLES: dict = {}


def standard_table(number: int) -> HuffmanTable:
    t = _STANDARD_TABLES.get(number)
    if t is None:
        spec = _STANDARD_TABLE_SPECS.get(number)
        if spec is None:
            raise JBIG2Error(f"standard table B.{number} does not exist")
        t = _STANDARD_TABLES[number] = HuffmanTable(
            [HuffmanLine(s) for s in spec], True)
    return t


def decode_tables_segment(data, start: int, end: int) -> HuffmanTable:
    """7.4.13 coded Huffman table segment → HuffmanTable."""
    flags = data[start]
    lowest = _i32(_read_u32(data, start + 1))
    highest = _i32(_read_u32(data, start + 5))
    br = BitReader(data, start + 9, end)
    prefix_bits = ((flags >> 1) & 7) + 1
    range_bits = ((flags >> 4) & 7) + 1
    lines = []
    low = lowest
    while True:
        plen = br.read_bits(prefix_bits)
        rlen = br.read_bits(range_bits)
        lines.append(HuffmanLine((low, plen, rlen, 0)))
        low += 1 << rlen
        if low >= highest:
            break
    plen = br.read_bits(prefix_bits)
    lines.append(HuffmanLine((lowest - 1, plen, 32, 0, "lower")))
    plen = br.read_bits(prefix_bits)
    lines.append(HuffmanLine((highest, plen, 32, 0)))
    if flags & 1:
        plen = br.read_bits(prefix_bits)
        lines.append(HuffmanLine((plen, 0)))
    return HuffmanTable(lines, False)


def _custom_table(index: int, referred: list, custom: dict) -> HuffmanTable:
    cur = 0
    for ref in referred:
        table = custom.get(ref)
        if table is not None:
            if index == cur:
                return table
            cur += 1
    raise JBIG2Error("can't find custom Huffman table")


def read_uncompressed_bitmap(br: BitReader, width: int, height: int):
    bitmap = []
    for _ in range(height):
        row = bytearray(width)
        for x in range(width):
            row[x] = br.read_bit()
        br.byte_align()
        bitmap.append(row)
    return bitmap


def symbol_id_huffman_table(br: BitReader, n_symbols: int) -> HuffmanTable:
    """6.4.4.1: runcode-coded symbol-ID code lengths from the stream."""
    run_lines = [HuffmanLine((i, br.read_bits(4), 0, 0)) for i in range(35)]
    run_table = HuffmanTable(run_lines, False)
    lines = []
    i = 0
    while i < n_symbols:
        code_len = run_table.decode(br)
        if code_len is None or code_len > 34:
            raise JBIG2Error("invalid code length in symbol ID table")
        if code_len >= 32:
            if code_len == 32:
                if i == 0:
                    raise JBIG2Error("no previous value in symbol ID table")
                repeats = br.read_bits(2) + 3
                repeated = lines[i - 1].prefix_length
            elif code_len == 33:
                repeats = br.read_bits(3) + 3
                repeated = 0
            else:
                repeats = br.read_bits(7) + 11
                repeated = 0
            for _ in range(repeats):
                lines.append(HuffmanLine((i, repeated, 0, 0)))
                i += 1
        else:
            lines.append(HuffmanLine((i, code_len, 0, 0)))
            i += 1
    br.byte_align()
    return HuffmanTable(lines, False)


# ---------------------------------------------------------------------------
# 6.5 Symbol dictionary / 6.4 text region (arithmetic coding)
# ---------------------------------------------------------------------------

def decode_symbol_dictionary(refinement: bool, input_symbols: list,
                             num_new: int, template: int, at,
                             r_template: int, r_at, data, start: int,
                             end: int) -> list:
    if num_new > _MAX_DIM:
        raise JBIG2Error(f"implausible new-symbol count {num_new}")
    mq = MQDecoder(data, start, end)
    cache = ContextCache()
    new_symbols: list = []
    height = 0
    code_length = _log2(len(input_symbols) + num_new)
    while len(new_symbols) < num_new:
        dh = decode_integer(cache, "IADH", mq)
        if dh is None:
            raise JBIG2Error("OOB delta height in symbol dictionary")
        height += dh
        width = 0
        while True:
            dw = decode_integer(cache, "IADW", mq)
            if dw is None:
                break  # OOB: end of height class
            width += dw
            if refinement:
                n_inst = decode_integer(cache, "IAAI", mq)
                if n_inst > 1:
                    bitmap = decode_text_region(
                        True, width, height, 0, n_inst, 1,
                        input_symbols + new_symbols, code_length, 0, 0, 1, 0,
                        r_template, r_at, mq, cache)
                else:
                    sym_id = decode_iaid(cache, mq, code_length)
                    rdx = decode_integer(cache, "IARDX", mq)
                    rdy = decode_integer(cache, "IARDY", mq)
                    symbol = (input_symbols[sym_id]
                              if sym_id < len(input_symbols)
                              else new_symbols[sym_id - len(input_symbols)])
                    bitmap = decode_refinement(mq, width, height, r_template,
                                               symbol, rdx, rdy, False, r_at,
                                               cache)
            else:
                bitmap = decode_generic(mq, width, height, template, False,
                                        None, at, cache)
            new_symbols.append(bitmap)
    # export flags: alternating run lengths over input + new symbols
    flags: list[bool] = []
    flag = False
    total = len(input_symbols) + num_new
    while len(flags) < total:
        run = decode_integer(cache, "IAEX", mq)
        if run is None:
            raise JBIG2Error("OOB export run length")
        flags.extend([flag] * run)
        flag = not flag
    exported = [s for s, f in zip(input_symbols, flags) if f]
    exported.extend(s for s, f in
                    zip(new_symbols, flags[len(input_symbols):]) if f)
    return exported


def decode_text_region(refinement: bool, width: int, height: int,
                       default_pixel: int, num_instances: int,
                       strip_size: int, symbols: list, code_length: int,
                       transposed: int, ds_offset: int, ref_corner: int,
                       comb_op: int, r_template: int, r_at,
                       mq, cache, huffman: dict | None = None):
    """Text region placement walk; integers come from the arithmetic IAx
    procedures or, in Huffman mode, from the `huffman` dict's tables
    ('br' BitReader, 'ids'/'fs'/'ds'/'dt' HuffmanTables, 'log_strip')."""
    _check_dims(width, height, "text region")
    if num_instances > width * height + 1:
        raise JBIG2Error(f"implausible instance count {num_instances}")
    if huffman:
        br = huffman["br"]
        read_dt = lambda: huffman["dt"].decode(br)          # noqa: E731
        read_fs = lambda: huffman["fs"].decode(br)          # noqa: E731
        read_ds = lambda: huffman["ds"].decode(br)          # noqa: E731
        read_it = lambda: br.read_bits(huffman["log_strip"])  # noqa: E731
        read_id = lambda: huffman["ids"].decode(br)         # noqa: E731
    else:
        read_dt = lambda: decode_integer(cache, "IADT", mq)  # noqa: E731
        read_fs = lambda: decode_integer(cache, "IAFS", mq)  # noqa: E731
        read_ds = lambda: decode_integer(cache, "IADS", mq)  # noqa: E731
        read_it = lambda: decode_integer(cache, "IAIT", mq)  # noqa: E731
        read_id = lambda: decode_iaid(cache, mq, code_length)  # noqa: E731
    fill = default_pixel and 1
    bitmap = [bytearray([fill] * width) if fill else bytearray(width)
              for _ in range(height)]
    strip_t = read_dt()
    if strip_t is None:
        raise JBIG2Error("OOB initial strip T")
    strip_t = -strip_t
    first_s = 0
    i = 0
    while i < num_instances:
        dt = read_dt()
        strip_t += dt
        first_s += read_fs()
        cur_s = first_s
        while True:
            cur_t = 0
            if strip_size > 1:
                cur_t = read_it()
            t = strip_size * strip_t + cur_t
            sym_id = read_id()
            apply_ref = refinement and decode_integer(cache, "IARI", mq)
            sym = symbols[sym_id]
            sym_w = len(sym[0]) if sym else 0
            sym_h = len(sym)
            if apply_ref:
                rdw = decode_integer(cache, "IARDW", mq)
                rdh = decode_integer(cache, "IARDH", mq)
                rdx = decode_integer(cache, "IARDX", mq)
                rdy = decode_integer(cache, "IARDY", mq)
                sym_w += rdw
                sym_h += rdh
                sym = decode_refinement(
                    mq, sym_w, sym_h, r_template, sym,
                    (rdw >> 1) + rdx, (rdh >> 1) + rdy, False, r_at, cache)
            increment = 0
            if not transposed:
                if ref_corner > 1:  # right corners advance S first
                    cur_s += sym_w - 1
                else:
                    increment = sym_w - 1
            elif not (ref_corner & 1):
                cur_s += sym_h - 1
            else:
                increment = sym_h - 1
            offset_t = t - (0 if ref_corner & 1 else sym_h - 1)
            offset_s = cur_s - (sym_w - 1 if ref_corner & 2 else 0)
            if transposed:
                for s2 in range(sym_h):
                    y = offset_s + s2
                    if not (0 <= y < height):
                        continue
                    row = bitmap[y]
                    sym_row = sym[s2]
                    max_w = min(width - offset_t, sym_w)
                    if comb_op == 0:
                        for t2 in range(max_w):
                            row[offset_t + t2] |= sym_row[t2]
                    elif comb_op == 2:
                        for t2 in range(max_w):
                            row[offset_t + t2] ^= sym_row[t2]
                    else:
                        raise JBIG2Error(
                            f"combination operator {comb_op} not supported")
            else:
                for t2 in range(sym_h):
                    y = offset_t + t2
                    if not (0 <= y < height):
                        continue
                    row = bitmap[y]
                    sym_row = sym[t2]
                    if comb_op == 0:
                        for s2 in range(sym_w):
                            row[offset_s + s2] |= sym_row[s2]
                    elif comb_op == 2:
                        for s2 in range(sym_w):
                            row[offset_s + s2] ^= sym_row[s2]
                    else:
                        raise JBIG2Error(
                            f"combination operator {comb_op} not supported")
            i += 1
            ds = read_ds()
            if ds is None:
                break  # OOB: end of strip
            cur_s += increment + ds + ds_offset
    return bitmap


def decode_symbol_dictionary_huffman(input_symbols: list, num_new: int,
                                     tables: dict, br: BitReader,
                                     data) -> list:
    """6.5 symbol dictionary, Huffman variant (no refinement): height
    classes carry one collective bitmap each — uncompressed rows or an
    MMR (T.6) stream of explicit byte length — split by the decoded
    symbol widths."""
    if num_new > _MAX_DIM:
        raise JBIG2Error(f"implausible new-symbol count {num_new}")
    from .ccitt import decode_ccitt

    new_symbols: list = []
    widths_all: list[int] = []
    height = 0
    while len(new_symbols) < num_new:
        dh = tables["dh"].decode(br)
        if dh is None:
            raise JBIG2Error("OOB delta height in symbol dictionary")
        height += dh
        _check_dims(1, height, "symbol height class")
        width = 0
        total_width = 0
        first = len(widths_all)
        while True:
            dw = tables["dw"].decode(br)
            if dw is None:
                break
            width += dw
            total_width += width
            _check_dims(width, height, "symbol")
            widths_all.append(width)
            if len(widths_all) - first > num_new:
                raise JBIG2Error("height class exceeds new-symbol count")
        bm_size = tables["bm"].decode(br)
        br.byte_align()
        _check_dims(total_width, height, "collective bitmap")
        if bm_size == 0:
            collective = read_uncompressed_bitmap(br, total_width, height)
        else:
            chunk = bytes(data[br.pos:br.pos + bm_size])
            try:
                img = decode_ccitt(chunk, columns=total_width, rows=height,
                                   k=-1)
            except Exception as e:
                raise JBIG2Error(f"MMR collective bitmap: {e}") from e
            collective = [bytearray(r) for r in img.tolist()]
            br.pos += bm_size
            br.byte_align()
        n_decoded = len(widths_all)
        if first == n_decoded - 1:
            new_symbols.append(collective)
        else:
            x0 = 0
            for w in widths_all[first:n_decoded]:
                new_symbols.append([row[x0:x0 + w] for row in collective])
                x0 += w
    flags: list[bool] = []
    flag = False
    total = len(input_symbols) + num_new
    b1 = standard_table(1)
    while len(flags) < total:
        run = b1.decode(br)
        if run is None:
            raise JBIG2Error("OOB export run length")
        flags.extend([flag] * run)
        flag = not flag
    exported = [s for s, f in zip(input_symbols, flags) if f]
    exported.extend(s for s, f in
                    zip(new_symbols, flags[len(input_symbols):]) if f)
    return exported


# ---------------------------------------------------------------------------
# 6.6/6.7 pattern dictionary + halftone region
# ---------------------------------------------------------------------------

def decode_pattern_dictionary(mmr: bool, pat_w: int, pat_h: int,
                              max_index: int, template: int,
                              data, start: int, end: int) -> list:
    at = []
    if not mmr:
        at.append((-pat_w, 0))
        if template == 0:
            at.extend([(-3, -1), (2, -2), (-2, -2)])
    collective_w = (max_index + 1) * pat_w
    _check_dims(collective_w, pat_h, "pattern dictionary")
    if mmr:
        collective = decode_generic(None, collective_w, pat_h, template,
                                    False, None, at, ContextCache(),
                                    mmr=True, mmr_data=data[start:end])
    else:
        mq = MQDecoder(data, start, end)
        collective = decode_generic(mq, collective_w, pat_h, template,
                                    False, None, at, ContextCache())
    return [[row[i * pat_w:(i + 1) * pat_w] for row in collective]
            for i in range(max_index + 1)]


def decode_halftone_region(mmr: bool, patterns: list, template: int,
                           width: int, height: int, default_pixel: int,
                           enable_skip: bool, comb_op: int,
                           grid_w: int, grid_h: int, grid_x: int, grid_y: int,
                           vec_x: int, vec_y: int,
                           data, start: int, end: int):
    _check_dims(width, height, "halftone region")
    _check_dims(grid_w, grid_h, "halftone grid")
    if enable_skip:
        raise JBIG2Error("halftone skip is not supported")
    if comb_op != 0:
        raise JBIG2Error(
            f"combination operator {comb_op} not supported in halftone")
    fill = default_pixel and 1
    region = [bytearray([fill] * width) if fill else bytearray(width)
              for _ in range(height)]
    pat_w = len(patterns[0][0])
    pat_h = len(patterns[0])
    bits_per_value = _log2(len(patterns))
    at = []
    if not mmr:
        at.append((3 if template <= 1 else 2, -1))
        if template == 0:
            at.extend([(-3, -1), (2, -2), (-2, -2)])
    planes: list = [None] * bits_per_value
    if mmr:
        # gray-code planes share ONE T.6 cursor, each plane EOFB-
        # terminated (reference build/pdf.worker.js:9994-10005)
        from .ccitt import decode_mmr_planes

        arrs = decode_mmr_planes(bytes(data[start:end]), grid_w, grid_h,
                                 bits_per_value)
        for k, i in enumerate(range(bits_per_value - 1, -1, -1)):
            planes[i] = arrs[k]
    else:
        mq = MQDecoder(data, start, end)
        cache = ContextCache()
        for i in range(bits_per_value - 1, -1, -1):
            planes[i] = decode_generic(mq, grid_w, grid_h, template, False,
                                       None, at, cache)
    # gray-code combine, then stamp patterns on the skewed grid
    for mg in range(grid_h):
        for ng in range(grid_w):
            bit = 0
            index = 0
            for j in range(bits_per_value - 1, -1, -1):
                bit ^= planes[j][mg][ng]
                index |= bit << j
            pattern = patterns[index]
            x = _i32(grid_x + mg * vec_y + ng * vec_x) >> 8
            y = _i32(grid_y + mg * vec_x - ng * vec_y) >> 8
            if 0 <= x and x + pat_w <= width and 0 <= y and \
                    y + pat_h <= height:
                for i in range(pat_h):
                    row = region[y + i]
                    prow = pattern[i]
                    for j in range(pat_w):
                        row[x + j] |= prow[j]
            else:
                for i in range(pat_h):
                    ry = y + i
                    if not (0 <= ry < height):
                        continue
                    row = region[ry]
                    prow = pattern[i]
                    for j in range(pat_w):
                        rx = x + j
                        if 0 <= rx < width:
                            row[rx] |= prow[j]
    return region


def _i32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - 0x100000000 if v >= 0x80000000 else v


# ---------------------------------------------------------------------------
# 7: segments, page assembly
# ---------------------------------------------------------------------------

_VALID_SEGMENT_TYPES = frozenset(
    [0, 4, 6, 7, 16, 20, 22, 23, 36, 38, 39, 40, 42, 43,
     48, 49, 50, 51, 52, 53, 62])


def _read_u32(data, pos: int) -> int:
    return struct.unpack_from(">I", data, pos)[0]


def _read_u16(data, pos: int) -> int:
    return struct.unpack_from(">H", data, pos)[0]


def _read_i8(data, pos: int) -> int:
    v = data[pos]
    return v - 256 if v >= 128 else v


def _read_segment_header(data, start: int) -> dict:
    h = {"number": _read_u32(data, start)}
    flags = data[start + 4]
    seg_type = flags & 0x3F
    if seg_type not in _VALID_SEGMENT_TYPES:
        raise JBIG2Error(f"invalid segment type: {seg_type}")
    h["type"] = seg_type
    page_assoc_4 = bool(flags & 0x40)
    referred_flags = data[start + 5]
    count = (referred_flags >> 5) & 7
    pos = start + 6
    if referred_flags == 7:
        count = _read_u32(data, pos - 1) & 0x1FFFFFFF
        pos += 3
        pos += (count + 7) >> 3  # retain bits
    elif referred_flags in (5, 6):
        raise JBIG2Error("invalid referred-to flags")
    ref_size = 1 if h["number"] <= 256 else (2 if h["number"] <= 65536 else 4)
    referred = []
    for _ in range(count):
        if ref_size == 1:
            referred.append(data[pos])
        elif ref_size == 2:
            referred.append(_read_u16(data, pos))
        else:
            referred.append(_read_u32(data, pos))
        pos += ref_size
    h["referred_to"] = referred
    if page_assoc_4:
        h["page"] = _read_u32(data, pos)
        pos += 4
    else:
        h["page"] = data[pos]
        pos += 1
    h["length"] = _read_u32(data, pos)
    pos += 4
    if h["length"] == 0xFFFFFFFF:
        # unknown length: only valid for immediate generic regions; scan
        # for the terminator (row-count field after the 2-byte MMR=0
        # marker FF AC, or bare row count for MMR)
        if h["type"] != 38:
            raise JBIG2Error("invalid unknown segment length")
        region_h = _read_u32(data, pos + 4)
        mmr = data[pos + 17] & 1
        pattern = (b"" if mmr else b"\xff\xac") + struct.pack(">I", region_h)
        idx = bytes(data).find(pattern, pos)
        if idx < 0:
            raise JBIG2Error("segment end was not found")
        h["length"] = idx + len(pattern)
    h["header_end"] = pos
    return h


def _read_region_info(data, pos: int) -> dict:
    return {
        "width": _read_u32(data, pos),
        "height": _read_u32(data, pos + 4),
        "x": _read_u32(data, pos + 8),
        "y": _read_u32(data, pos + 12),
        "comb_op": data[pos + 16] & 7,
    }


class _PageAssembler:
    """Streams decoded region bitmaps into the packed 1-bpp page buffer
    (MSB-first rows, rowSize = (W+7)>>3, 1 = black)."""

    def __init__(self, max_pixels: int | None = None):
        self.page = None
        self.buffer: bytearray | None = None
        self.symbols: dict[int, list] = {}
        self.patterns: dict[int, list] = {}
        self.custom_tables: dict[int, HuffmanTable] = {}
        self.max_pixels = max_pixels

    def on_page_info(self, info: dict) -> None:
        self.page = info
        row_size = (info["width"] + 7) >> 3
        height = info["height"]
        if height == 0xFFFFFFFF:
            raise JBIG2Error("unknown page height is not supported")
        _check_dims(info["width"], height, "page")
        if self.max_pixels and info["width"] * height > self.max_pixels:
            raise JBIG2Error(
                f"page {info['width']}x{height} exceeds the decode cap "
                f"({self.max_pixels} px)")
        fill = 0xFF if info["default_pixel"] else 0
        self.buffer = bytearray([fill] * (row_size * height))

    def draw(self, info: dict, bitmap) -> None:
        if self.buffer is None:
            raise JBIG2Error("region before page information")
        width, height = info["width"], info["height"]
        row_size = (self.page["width"] + 7) >> 3
        op = (info["comb_op"] if self.page["comb_op_override"]
              else self.page["comb_op"])
        if op not in (0, 2):
            raise JBIG2Error(f"page combination operator {op} not supported")
        buf = self.buffer
        x0, y0 = info["x"], info["y"]
        for i in range(height):
            row = bitmap[i]
            mask = 0x80 >> (x0 & 7)
            offset = (y0 + i) * row_size + (x0 >> 3)
            if op == 0:
                for j in range(width):
                    if row[j]:
                        buf[offset] |= mask
                    mask >>= 1
                    if not mask:
                        mask = 0x80
                        offset += 1
            else:
                for j in range(width):
                    if row[j]:
                        buf[offset] ^= mask
                    mask >>= 1
                    if not mask:
                        mask = 0x80
                        offset += 1


def _process_segment(header: dict, data, start: int, end: int,
                     page: _PageAssembler) -> None:
    t = header["type"]
    pos = start
    if t == 0:  # symbol dictionary
        flags = _read_u16(data, pos)
        pos += 2
        huffman = bool(flags & 1)
        refinement = bool(flags & 2)
        dh_sel = (flags >> 2) & 3
        dw_sel = (flags >> 4) & 3
        bm_sel = (flags >> 6) & 1
        agg_sel = (flags >> 7) & 1
        template = (flags >> 10) & 3
        r_template = (flags >> 12) & 1
        if huffman and refinement:
            raise JBIG2Error("symbol refinement with Huffman "
                             "is not supported")
        at = []
        if not huffman:
            for _ in range(4 if template == 0 else 1):
                at.append((_read_i8(data, pos), _read_i8(data, pos + 1)))
                pos += 2
        r_at = []
        if refinement and not r_template:
            for _ in range(2):
                at_pair = (_read_i8(data, pos), _read_i8(data, pos + 1))
                r_at.append(at_pair)
                pos += 2
        num_ex = _read_u32(data, pos)
        num_new = _read_u32(data, pos + 4)
        pos += 8
        input_symbols: list = []
        for ref in header["referred_to"]:
            input_symbols.extend(page.symbols.get(ref, []))
        if huffman:
            custom_idx = 0
            tables = {}
            for key, sel, std_base in (("dh", dh_sel, 4), ("dw", dw_sel, 2)):
                if sel in (0, 1):
                    tables[key] = standard_table(sel + std_base)
                elif sel == 3:
                    tables[key] = _custom_table(
                        custom_idx, header["referred_to"],
                        page.custom_tables)
                    custom_idx += 1
                else:
                    raise JBIG2Error(f"invalid Huffman {key} selector")
            tables["bm"] = (_custom_table(custom_idx, header["referred_to"],
                                          page.custom_tables)
                            if bm_sel else standard_table(1))
            custom_idx += bm_sel
            tables["agg"] = (_custom_table(custom_idx,
                                           header["referred_to"],
                                           page.custom_tables)
                             if agg_sel else standard_table(1))
            br = BitReader(data, pos, end)
            exported = decode_symbol_dictionary_huffman(
                input_symbols, num_new, tables, br, data)
        else:
            exported = decode_symbol_dictionary(
                refinement, input_symbols, num_new, template, at,
                r_template, r_at, data, pos, end)
        del num_ex  # reference derives the export set from IAEX runs alone
        page.symbols[header["number"]] = exported
    elif t in (6, 7):  # immediate (lossless) text region
        info = _read_region_info(data, pos)
        pos += 17
        flags = _read_u16(data, pos)
        pos += 2
        huffman = bool(flags & 1)
        refinement = bool(flags & 2)
        log_strip = (flags >> 2) & 3
        strip_size = 1 << log_strip
        ref_corner = (flags >> 4) & 3
        transposed = int(bool(flags & 64))
        comb_op = (flags >> 7) & 3
        default_pixel = (flags >> 9) & 1
        # 5-bit signed DS offset at bits 10-14
        ds_offset = _i32((flags << 17) & 0xFFFFFFFF) >> 27
        r_template = (flags >> 15) & 1
        if huffman and refinement:
            raise JBIG2Error("refinement with Huffman is not supported")
        hflags = 0
        if huffman:
            hflags = _read_u16(data, pos)
            pos += 2
        r_at = []
        if refinement and not r_template:
            for _ in range(2):
                r_at.append((_read_i8(data, pos), _read_i8(data, pos + 1)))
                pos += 2
        num_instances = _read_u32(data, pos)
        pos += 4
        symbols: list = []
        for ref in header["referred_to"]:
            symbols.extend(page.symbols.get(ref, []))
        code_length = _log2(len(symbols))
        if huffman:
            fs_sel = hflags & 3
            ds_sel = (hflags >> 2) & 3
            dt_sel = (hflags >> 4) & 3
            br = BitReader(data, pos, end)
            ids = symbol_id_huffman_table(br, len(symbols))
            custom_idx = 0
            hm = {"br": br, "ids": ids, "log_strip": log_strip}
            for key, sel, std_base, n_std in (("fs", fs_sel, 6, 2),
                                              ("ds", ds_sel, 8, 3),
                                              ("dt", dt_sel, 11, 3)):
                if sel < n_std:
                    hm[key] = standard_table(sel + std_base)
                elif sel == 3:
                    hm[key] = _custom_table(custom_idx,
                                            header["referred_to"],
                                            page.custom_tables)
                    custom_idx += 1
                else:
                    raise JBIG2Error(f"invalid Huffman {key} selector")
            bitmap = decode_text_region(
                False, info["width"], info["height"], default_pixel,
                num_instances, strip_size, symbols, code_length,
                transposed, ds_offset, ref_corner, comb_op, r_template,
                r_at, None, None, huffman=hm)
        else:
            mq = MQDecoder(data, pos, end)
            cache = ContextCache()
            bitmap = decode_text_region(
                refinement, info["width"], info["height"], default_pixel,
                num_instances, strip_size, symbols, code_length,
                transposed, ds_offset, ref_corner, comb_op, r_template,
                r_at, mq, cache)
        page.draw(info, bitmap)
    elif t == 16:  # pattern dictionary
        flags = data[pos]
        pos += 1
        mmr = bool(flags & 1)
        template = (flags >> 1) & 3
        pat_w = data[pos]
        pat_h = data[pos + 1]
        pos += 2
        max_index = _read_u32(data, pos)
        pos += 4
        page.patterns[header["number"]] = decode_pattern_dictionary(
            mmr, pat_w, pat_h, max_index, template, data, pos, end)
    elif t in (22, 23):  # immediate (lossless) halftone region
        info = _read_region_info(data, pos)
        pos += 17
        flags = data[pos]
        pos += 1
        mmr = bool(flags & 1)
        template = (flags >> 1) & 3
        enable_skip = bool(flags & 8)
        comb_op = (flags >> 4) & 7
        default_pixel = (flags >> 7) & 1
        grid_w = _read_u32(data, pos)
        grid_h = _read_u32(data, pos + 4)
        grid_x = _read_u32(data, pos + 8)
        grid_y = _read_u32(data, pos + 12)
        pos += 16
        vec_x = _read_u16(data, pos)
        vec_y = _read_u16(data, pos + 2)
        pos += 4
        patterns = page.patterns.get(header["referred_to"][0])
        if not patterns:
            raise JBIG2Error("halftone region without pattern dictionary")
        bitmap = decode_halftone_region(
            mmr, patterns, template, info["width"], info["height"],
            default_pixel, enable_skip, comb_op, grid_w, grid_h,
            grid_x, grid_y, vec_x, vec_y, data, pos, end)
        page.draw(info, bitmap)
    elif t in (38, 39):  # immediate (lossless) generic region
        info = _read_region_info(data, pos)
        pos += 17
        flags = data[pos]
        pos += 1
        mmr = bool(flags & 1)
        template = (flags >> 1) & 3
        prediction = bool(flags & 8)
        at = []
        if not mmr:
            for _ in range(4 if template == 0 else 1):
                at.append((_read_i8(data, pos), _read_i8(data, pos + 1)))
                pos += 2
        if mmr:
            bitmap = decode_generic(None, info["width"], info["height"],
                                    template, prediction, None, at,
                                    ContextCache(), mmr=True,
                                    mmr_data=data[pos:end])
        else:
            mq = MQDecoder(data, pos, end)
            bitmap = decode_generic(mq, info["width"], info["height"],
                                    template, prediction, None, at,
                                    ContextCache())
        page.draw(info, bitmap)
    elif t == 48:  # page information
        info = {
            "width": _read_u32(data, pos),
            "height": _read_u32(data, pos + 4),
        }
        seg_flags = data[pos + 16]
        info["default_pixel"] = (seg_flags >> 2) & 1
        info["comb_op"] = (seg_flags >> 3) & 3
        info["comb_op_override"] = bool(seg_flags & 64)
        page.on_page_info(info)
    elif t in (49, 50, 51, 62):  # end-of-page/stripe/file, extension
        pass
    elif t == 53:  # coded Huffman table segment
        page.custom_tables[header["number"]] = \
            decode_tables_segment(data, pos, end)
    else:
        raise JBIG2Error(f"segment type {t} is not implemented")


def _process_chunk(data, page: _PageAssembler) -> None:
    pos = 0
    n = len(data)
    while pos < n:
        header = _read_segment_header(data, pos)
        seg_start = header["header_end"]
        seg_end = seg_start + header["length"]
        _process_segment(header, data, seg_start, seg_end, page)
        pos = seg_end
        if header["type"] == 51:
            break


def decode_jbig2_packed(data: bytes, globals_: bytes | None = None,
                        max_pixels: int | None = None,
                        ) -> tuple[bytes, int, int]:
    """Decode embedded-organization JBIG2 (the PDF `JBIG2Decode` payload,
    optional `JBIG2Globals` first) → (packed 1-bpp page rows MSB-first
    with 1 = black, width, height)."""
    page = _PageAssembler(max_pixels=max_pixels)
    if globals_:
        _process_chunk(globals_, page)
    _process_chunk(data, page)
    if page.buffer is None:
        raise JBIG2Error("no page information segment")
    return bytes(page.buffer), page.page["width"], page.page["height"]


def decode_jbig2(data: bytes, globals_: bytes | None = None,
                 max_pixels: int | None = None) -> np.ndarray:
    """Decode to a (height, width) uint8 array, 1 = black."""
    packed, width, height = decode_jbig2_packed(data, globals_,
                                                max_pixels=max_pixels)
    bits = np.unpackbits(np.frombuffer(packed, dtype=np.uint8)
                         .reshape(height, -1), axis=1)
    return np.ascontiguousarray(bits[:, :width])


JBIG2_FILE_MAGIC = b"\x97JB2\r\n\x1a\n"


def decode_jbig2_file(data: bytes,
                      max_pixels: int | None = None,
                      ) -> tuple[bytes, int, int]:
    """Decode a standalone .jb2 file (T.88 Annex D header + sequential
    segment stream).  The reference's Jbig2Image.parse raises for this
    organization; supporting it here is additive (multimodal blobs)."""
    if not data.startswith(JBIG2_FILE_MAGIC):
        raise JBIG2Error("not a JBIG2 file (bad magic)")
    flags = data[8]
    if flags & 1 == 0:
        raise JBIG2Error("random-access JBIG2 files are not supported")
    pos = 9
    if not flags & 2:  # number of pages known: u32 present
        pos += 4
    return decode_jbig2_packed(data[pos:], max_pixels=max_pixels)
