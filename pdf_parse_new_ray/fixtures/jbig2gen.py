"""Deterministic JBIG2 encoder for fixtures (ITU-T T.88, embedded flavor).

Produces JBIG2 streams — generic regions (all four GB templates,
optional TPGDON), symbol dictionary + text region pairs (arithmetic AND
Huffman flavors incl. MMR collective bitmaps and custom table
segments), refinement-aggregate dictionaries with IARI text refinement,
and pattern-dictionary + halftone regions — used to exercise
`pdfkernel/jbig2.py` and to differential-test it against the live
reference decoder (tools/jbig2_ref.py).  Encoder-side procedures follow
T.88 Annex E (MQ coder) and Annex A (integer coding); everything here is
the mirror image of the decoder and shares its context-labeling scheme.
"""

from __future__ import annotations

import struct

import numpy as np

from ..pdfkernel.jbig2 import (_CODING_TEMPLATES, _QE, _TPGDON_CONTEXTS,
                               ContextCache, _log2)


class MQEncoder:
    """MQ arithmetic encoder (T.88 E.3): BYTEOUT with 0xFF stuffing and
    carry propagation, FLUSH appends the FF AC terminator."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        # leading dummy byte absorbs a (theoretical) carry before the
        # first real BYTEOUT; stripped in finish()
        self.out = bytearray([0])

    def _byteout(self) -> None:
        out = self.out
        if out[-1] == 0xFF:
            out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            # carry into the previous byte
            out[-1] += 1
            if out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def encode(self, cx: bytearray, pos: int, d: int) -> None:
        state = cx[pos]
        icx = state >> 1
        mps = state & 1
        qe, nmps, nlps, switch = _QE[icx]
        if d == mps:
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx[pos] = (nmps << 1) | mps
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                mps = 1 - mps
            cx[pos] = (nlps << 1) | mps
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _setbits_flush(self) -> None:
        # SETBITS fills the low C bits with ONES — matching the 0xFF
        # bytes every conformant decoder synthesizes at end-of-data —
        # while keeping C inside the final interval [C, C+A)
        upper = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= upper:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.out[0] != 0:
            raise AssertionError("carry before first byte")

    def finish(self) -> bytes:
        """T.88 FLUSH: terminate with the FF AC marker pair."""
        self._setbits_flush()
        if self.out[-1] != 0xFF:
            self.out.append(0xFF)
        self.out.append(0xAC)
        return bytes(self.out[1:])

    def finish_raw(self) -> bytes:
        """T.800-style termination (JPEG2000 codeblock segments): no
        marker tail, and a trailing 0xFF is discarded."""
        self._setbits_flush()
        end = len(self.out)
        if self.out[end - 1] == 0xFF:
            end -= 1
        return bytes(self.out[1:end])


def encode_integer(cache: ContextCache, name: str, enc: MQEncoder, v):
    """Mirror of decode_integer; v=None encodes OOB."""
    cx = cache.get_contexts(name)
    prev = 1

    def put(bit: int) -> None:
        nonlocal prev
        enc.encode(cx, prev, bit)
        prev = (prev << 1) | bit if prev < 256 else \
            ((((prev << 1) | bit) & 511) | 256)

    def put_bits(value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            put((value >> i) & 1)

    if v is None:  # OOB = sign 1, value 0
        put(1)
        put(0)
        put_bits(0, 2)
        return
    sign = 0 if v >= 0 else 1
    av = -v if v < 0 else v
    put(sign)
    if av < 4:
        put(0)
        put_bits(av, 2)
    elif av < 20:
        put(1)
        put(0)
        put_bits(av - 4, 4)
    elif av < 84:
        put(1)
        put(1)
        put(0)
        put_bits(av - 20, 6)
    elif av < 340:
        put(1)
        put(1)
        put(1)
        put(0)
        put_bits(av - 84, 8)
    elif av < 4436:
        put(1)
        put(1)
        put(1)
        put(1)
        put(0)
        put_bits(av - 340, 12)
    else:
        put(1)
        put(1)
        put(1)
        put(1)
        put(1)
        put_bits(av - 4436, 32)


def encode_iaid(cache: ContextCache, enc: MQEncoder, code_length: int,
                value: int) -> None:
    cx = cache.get_contexts("IAID")
    prev = 1
    t = value + (1 << code_length)
    for i in range(code_length - 1, -1, -1):
        bit = (t >> i) & 1
        enc.encode(cx, prev, bit)
        prev = (prev << 1) | bit


def encode_generic(enc: MQEncoder, bitmap, template: int, at,
                   cache: ContextCache, tpgdon: bool = False) -> None:
    """Encode a bitmap (list of int rows, 1=black) as a generic region
    using the decoder's sorted-template context labeling."""
    height = len(bitmap)
    width = len(bitmap[0]) if height else 0
    template_px = sorted(list(_CODING_TEMPLATES[template]) + list(at),
                         key=lambda p: (p[1], p[0]))
    tlen = len(template_px)
    pseudo = _TPGDON_CONTEXTS[template]
    cx = cache.get_contexts("GB")
    ltp = 0
    for i in range(height):
        if tpgdon:
            typical = i > 0 and bytes(bitmap[i]) == bytes(bitmap[i - 1])
            sltp = (1 if typical else 0) ^ ltp
            enc.encode(cx, pseudo, sltp)
            ltp ^= sltp
            if ltp:
                continue
        row = bitmap[i]
        for j in range(width):
            label = 0
            shift = tlen - 1
            for x, y in template_px:
                j0 = j + x
                if 0 <= j0 < width:
                    i0 = i + y
                    if i0 >= 0 and bitmap[i0][j0]:
                        label |= 1 << shift
                shift -= 1
            enc.encode(cx, label, row[j])


# ---------------------------------------------------------------------------
# segment framing (embedded organization, short-form headers)
# ---------------------------------------------------------------------------

def _segment(number: int, seg_type: int, referred: list[int],
             page: int, payload: bytes) -> bytes:
    if len(referred) > 4:
        raise ValueError("short-form header supports <= 4 referred segments")
    head = struct.pack(">IB", number, seg_type)
    head += bytes([len(referred) << 5])
    ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    for r in referred:
        head += r.to_bytes(ref_size, "big")
    head += bytes([page])
    head += struct.pack(">I", len(payload))
    return head + payload


def _region_info(width: int, height: int, x: int = 0, y: int = 0,
                 comb_op: int = 0) -> bytes:
    return struct.pack(">IIIIB", width, height, x, y, comb_op)


def page_info_segment(number: int, width: int, height: int,
                      default_pixel: int = 0, comb_op: int = 0,
                      comb_op_override: bool = False) -> bytes:
    flags = (default_pixel << 2) | (comb_op << 3) | \
        (0x40 if comb_op_override else 0)
    payload = struct.pack(">IIIIBH", width, height, 0, 0, flags, 0)
    return _segment(number, 48, [], 1, payload)


_NOMINAL_AT = ((3, -1), (-3, -1), (2, -2), (-2, -2))


def generic_region_segment(number: int, bitmap, template: int = 0,
                           at=None, tpgdon: bool = False, x: int = 0,
                           y: int = 0, comb_op: int = 0,
                           lossless: bool = False) -> bytes:
    height = len(bitmap)
    width = len(bitmap[0])
    if at is None:
        at = _NOMINAL_AT[:4 if template == 0 else 1]
    enc = MQEncoder()
    cache = ContextCache()
    encode_generic(enc, bitmap, template, at, cache, tpgdon=tpgdon)
    data = enc.finish()
    flags = (template << 1) | (8 if tpgdon else 0)
    payload = _region_info(width, height, x, y, comb_op) + bytes([flags])
    for ax, ay in at:
        payload += bytes([ax & 0xFF, ay & 0xFF])
    payload += data
    return _segment(number, 39 if lossless else 38, [], 1, payload)


def symbol_dict_segment(number: int, symbols: list, template: int = 0,
                        at=None) -> bytes:
    """Arithmetic symbol dictionary exporting every symbol.  Symbols are
    encoded in the given order grouped into ascending-height classes."""
    if at is None:
        at = _NOMINAL_AT[:4 if template == 0 else 1]
    order = sorted(range(len(symbols)), key=lambda k: len(symbols[k]))
    enc = MQEncoder()
    cache = ContextCache()
    height = 0
    i = 0
    while i < len(order):
        h = len(symbols[order[i]])
        encode_integer(cache, "IADH", enc, h - height)
        height = h
        width = 0
        while i < len(order) and len(symbols[order[i]]) == height:
            sym = symbols[order[i]]
            w = len(sym[0])
            encode_integer(cache, "IADW", enc, w - width)
            width = w
            encode_generic(enc, sym, template, at, cache)
            i += 1
        encode_integer(cache, "IADW", enc, None)  # OOB ends height class
    # export all: run of 0 non-exported, then run of all exported
    encode_integer(cache, "IAEX", enc, 0)
    encode_integer(cache, "IAEX", enc, len(symbols))
    data = enc.finish()
    flags = template << 10
    payload = struct.pack(">H", flags)
    for ax, ay in at:
        payload += bytes([ax & 0xFF, ay & 0xFF])
    payload += struct.pack(">II", len(symbols), len(symbols))
    payload += data
    return payload, order


def build_symbol_text_stream(width: int, height: int, symbols: list,
                             placements) -> bytes:
    """Full embedded stream: page info + symbol dictionary + text region.

    symbols: list of bitmaps (list of int rows).  placements: list of
    (symbol_index, s_left, t_top) with TOPLEFT reference corner and no
    transposition.  Mirrors the decoder's strip walk: per strip IADT
    delta, IAFS for the first S, then IADS deltas measured from the
    previous symbol's right edge (left + width - 1), OOB to end a strip.
    """
    payload, order = symbol_dict_segment(2, symbols)
    dict_seg = _segment(2, 0, [], 1, payload)
    text_seg = _text_region_segment(symbols, placements, order,
                                    width, height)
    return page_info_segment(1, width, height) + dict_seg + text_seg


def build_symbol_text_chunks(width: int, height: int, symbols: list,
                             placements) -> tuple[bytes, bytes]:
    """PDF `JBIG2Decode` flavor: (JBIG2Globals chunk carrying the symbol
    dictionary, image chunk carrying page info + text region)."""
    payload, order = symbol_dict_segment(2, symbols)
    dict_seg = _segment(2, 0, [], 0, payload)  # globals: page assoc 0
    text_seg = _text_region_segment(symbols, placements, order,
                                    width, height)
    return dict_seg, page_info_segment(1, width, height) + text_seg


def _text_region_segment(symbols: list, placements, order: list,
                         width: int, height: int) -> bytes:
    # dictionary export order permutes ids (sorted by height);
    # remap placement ids to exported positions
    remap = {orig: pos for pos, orig in enumerate(order)}
    code_length = _log2(len(symbols))
    enc = MQEncoder()
    cache = ContextCache()
    by_t: dict[int, list] = {}
    for sym, s, t in placements:
        by_t.setdefault(t, []).append((s, sym))
    strip_ts = sorted(by_t)
    encode_integer(cache, "IADT", enc, 0)  # initial stripT = -0
    cur_strip_t = 0
    first_s = 0
    for t in strip_ts:
        encode_integer(cache, "IADT", enc, t - cur_strip_t)
        cur_strip_t = t
        row = sorted(by_t[t])
        encode_integer(cache, "IAFS", enc, row[0][0] - first_s)
        first_s = row[0][0]
        prev_right = None
        for s, sym in row:
            if prev_right is not None:
                encode_integer(cache, "IADS", enc, s - prev_right)
            encode_iaid(cache, enc, code_length, remap[sym])
            prev_right = s + len(symbols[sym][0]) - 1
        encode_integer(cache, "IADS", enc, None)
    data = enc.finish()
    flags = 1 << 4  # ref corner TOPLEFT, strip size 1, not transposed
    payload = _region_info(width, height, 0, 0, 0)
    payload += struct.pack(">H", flags)
    payload += struct.pack(">I", len(placements))
    payload += data
    return _segment(3, 6, [2], 1, payload)


def build_generic_stream(bitmap, template: int = 0, at=None,
                         tpgdon: bool = False,
                         default_pixel: int = 0) -> bytes:
    height = len(bitmap)
    width = len(bitmap[0])
    return (page_info_segment(1, width, height, default_pixel=default_pixel)
            + generic_region_segment(2, bitmap, template, at, tpgdon))


def build_halftone_stream(values: np.ndarray, patterns: list,
                          pat_w: int, pat_h: int,
                          mmr: bool = False) -> bytes:
    """values: (grid_h, grid_w) int array of pattern indices; patterns:
    list of bitmaps pat_h x pat_w.  Axis-aligned grid, spacing =
    max(pat_w, pat_h).  With mmr=True both the pattern dictionary
    (HDMMR=1, T.6 collective bitmap, no EOFB) and the halftone region
    (HMMR=1, gray planes back-to-back on one cursor, EOFB after each)
    use MMR coding per T.88 6.7.5/C.5."""
    from .ccittgen import encode_g4

    grid_h, grid_w = values.shape
    n_pat = len(patterns)
    step = max(pat_w, pat_h)
    width = grid_w * step
    height = grid_h * step
    # pattern dictionary: collective bitmap, AT = (-pat_w, 0) + template-0
    collective = [sum((list(p[r]) for p in patterns), [])
                  for r in range(pat_h)]
    if mmr:
        coll_data = encode_g4(np.array(collective, dtype=np.uint8),
                              with_eofb=False)
    else:
        enc = MQEncoder()
        cache = ContextCache()
        at = [(-pat_w, 0), (-3, -1), (2, -2), (-2, -2)]
        encode_generic(enc, collective, 0, at, cache)
        coll_data = enc.finish()
    pat_payload = bytes([1 if mmr else 0, pat_w, pat_h]) \
        + struct.pack(">I", n_pat - 1) + coll_data
    pat_seg = _segment(2, 16, [], 1, pat_payload)
    # halftone region: gray-coded bit planes, MSB first, shared contexts
    bits_per_value = _log2(n_pat)
    gray = values ^ (values >> 1)
    if mmr:
        plane_data = b"".join(
            encode_g4(((gray >> j) & 1).astype(np.uint8), with_eofb=True)
            for j in range(bits_per_value - 1, -1, -1))
    else:
        enc = MQEncoder()
        cache = ContextCache()
        h_at = [(3, -1), (-3, -1), (2, -2), (-2, -2)]
        for j in range(bits_per_value - 1, -1, -1):
            plane = ((gray >> j) & 1).astype(np.uint8)
            encode_generic(enc, plane.tolist(), 0, h_at, cache)
        plane_data = enc.finish()
    ht_flags = 1 if mmr else 0  # template 0, no skip, OR, default 0
    payload = _region_info(width, height, 0, 0, 0) + bytes([ht_flags])
    payload += struct.pack(">IIII", grid_w, grid_h, 0, 0)
    payload += struct.pack(">HH", step << 8, 0)
    payload += plane_data
    ht_seg = _segment(3, 22, [2], 1, payload)
    return page_info_segment(1, width, height) + pat_seg + ht_seg


# ---------------------------------------------------------------------------
# Huffman-coded flavors (T.88 Annex B): symbol dictionary with an
# uncompressed collective bitmap, text region with a runcode symbol-ID
# table, optional custom table segments (type 53)
# ---------------------------------------------------------------------------

from ..pdfkernel.jbig2 import (HuffmanTable, decode_tables_segment,  # noqa: E402
                               standard_table)


class BitWriterMSB:
    """Plain MSB-first bit writer (Huffman segment data — no stuffing)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bit: int) -> None:
        self.acc = (self.acc << 1) | bit
        self.n += 1
        if self.n == 8:
            self.out.append(self.acc)
            self.acc = 0
            self.n = 0

    def write_bits(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.write((value >> i) & 1)

    def byte_align(self) -> None:
        while self.n:
            self.write(0)

    def finish(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


def huff_encode(bw: BitWriterMSB, table: HuffmanTable, value) -> None:
    """Emit `value` (None = OOB) with the table's covering line."""
    for ln in table.lines:
        if ln.prefix_length == 0:
            continue
        if value is None:
            if ln.is_oob:
                bw.write_bits(ln.prefix_code, ln.prefix_length)
                return
            continue
        if ln.is_oob:
            continue
        if ln.is_lower:
            if value <= ln.range_low:
                bw.write_bits(ln.prefix_code, ln.prefix_length)
                bw.write_bits(ln.range_low - value, ln.range_length)
                return
        elif ln.range_low <= value and (
                ln.range_length >= 32
                or value < ln.range_low + (1 << ln.range_length)):
            bw.write_bits(ln.prefix_code, ln.prefix_length)
            bw.write_bits(value - ln.range_low, ln.range_length)
            return
    raise ValueError(f"value {value} not encodable by table")


def symbol_dict_segment_huffman(symbols: list,
                                mmr: bool = False) -> tuple[bytes, list]:
    """Huffman symbol dictionary payload (selectors 0: DH=B.4, DW=B.2,
    BMSIZE=B.1), exporting everything.  Collective bitmaps are
    uncompressed rows or, with mmr=True, explicit-length T.6 streams.
    Returns (payload, height-sorted order)."""
    order = sorted(range(len(symbols)), key=lambda k: len(symbols[k]))
    t_dh, t_dw, t_b1 = standard_table(4), standard_table(2), \
        standard_table(1)
    bw = BitWriterMSB()
    height = 0
    i = 0
    while i < len(order):
        h = len(symbols[order[i]])
        huff_encode(bw, t_dh, h - height)
        height = h
        width = 0
        cls = []
        while i < len(order) and len(symbols[order[i]]) == height:
            sym = symbols[order[i]]
            huff_encode(bw, t_dw, len(sym[0]) - width)
            width = len(sym[0])
            cls.append(sym)
            i += 1
        huff_encode(bw, t_dw, None)  # OOB ends the height class
        total_w = sum(len(s[0]) for s in cls)
        if mmr:
            from .ccittgen import encode_g4

            collective = np.array(
                [sum((list(s[y]) for s in cls), []) for y in range(height)],
                dtype=np.uint8)
            data = encode_g4(collective, with_eofb=False)
            huff_encode(bw, t_b1, len(data))
            bw.byte_align()
            for byte in data:
                bw.write_bits(byte, 8)
        else:
            huff_encode(bw, t_b1, 0)  # BMSIZE=0: uncompressed collective
            bw.byte_align()
            for y in range(height):
                for sym in cls:
                    for px in sym[y]:
                        bw.write(px)
                # row padding to byte boundary (readUncompressedBitmap)
                pad = (-total_w) % 8
                for _ in range(pad):
                    bw.write(0)
    huff_encode(bw, t_b1, 0)
    huff_encode(bw, t_b1, len(symbols))
    flags = 1  # huffman; all selectors 0; template 0
    payload = struct.pack(">H", flags)
    payload += struct.pack(">II", len(symbols), len(symbols))
    payload += bw.finish()
    return payload, order


def custom_ds_table_segment(number: int, lowest: int = -16,
                            highest: int = 16) -> bytes:
    """A type-53 coded table usable as a DS table (selector 3): one
    zero-range line per value in [lowest, highest), uniform prefix
    length, with OOB."""
    n_lines = highest - lowest
    plen = max(4, (n_lines + 3 - 1).bit_length())
    bw = BitWriterMSB()
    for _ in range(n_lines):
        bw.write_bits(plen, 4)  # prefix length
        bw.write_bits(0, 1)     # range length 0
    bw.write_bits(plen, 4)      # lower line
    bw.write_bits(plen, 4)      # upper line
    bw.write_bits(plen, 4)      # OOB line
    flags = 1 | ((4 - 1) << 1) | ((1 - 1) << 4)  # OOB, 4-bit plen, 1-bit rlen
    payload = bytes([flags]) + struct.pack(">ii", lowest, highest) \
        + bw.finish()
    return _segment(number, 53, [], 1, payload)


def build_huffman_symbol_text_stream(width: int, height: int,
                                     symbols: list, placements,
                                     custom_ds: bool = False,
                                     mmr: bool = False) -> bytes:
    """Full embedded stream with HUFFMAN coding: page info + (optional
    custom DS table) + huffman symbol dictionary + huffman text region.
    Same placement semantics as build_symbol_text_stream."""
    segs = [page_info_segment(1, width, height)]
    referred = []
    ds_sel = 0
    t_ds = standard_table(8)
    if custom_ds:
        table_seg = custom_ds_table_segment(5)
        segs.append(table_seg)
        referred.append(5)
        ds_sel = 3
        # encode with the decoder's exact view of the table (short-form
        # header for segment 5 with no referred segments is 11 bytes)
        t_ds = decode_tables_segment(table_seg, 11, len(table_seg))
    payload, order = symbol_dict_segment_huffman(symbols, mmr=mmr)
    segs.append(_segment(2, 0, referred, 1, payload))
    remap = {orig: pos for pos, orig in enumerate(order)}
    n = len(symbols)
    code_len = max(1, (n - 1).bit_length()) if n > 1 else 1
    t_fs, t_dt = standard_table(6), standard_table(11)
    bw = BitWriterMSB()
    # runcode preamble: 35 4-bit lengths; only runcode `code_len` used
    for i in range(35):
        bw.write_bits(1 if i == code_len else 0, 4)
    # every symbol gets code length `code_len`; the runcode table has a
    # single 1-bit code (0) for that length
    for _ in range(n):
        bw.write_bits(0, 1)
    bw.byte_align()
    by_t: dict[int, list] = {}
    for sym, s, t in placements:
        by_t.setdefault(t, []).append((s, sym))
    strip_ts = sorted(by_t)
    huff_encode(bw, t_dt, 1)  # initial stripT = -1 (B.11 encodes >= 1)
    cur_t = -1
    first_s = 0
    for t in strip_ts:
        huff_encode(bw, t_dt, t - cur_t)
        cur_t = t
        row = sorted(by_t[t])
        huff_encode(bw, t_fs, row[0][0] - first_s)
        first_s = row[0][0]
        prev_right = None
        for s, sym in row:
            if prev_right is not None:
                huff_encode(bw, t_ds, s - prev_right)
            bw.write_bits(remap[sym], code_len)
            prev_right = s + len(symbols[sym][0]) - 1
        huff_encode(bw, t_ds, None)  # OOB ends the strip
    flags = 1 | (1 << 4)  # huffman, TOPLEFT corner, strip size 1
    hflags = (ds_sel << 2)  # FS sel 0, DS sel, DT sel 0
    payload = _region_info(width, height, 0, 0, 0)
    payload += struct.pack(">HH", flags, hflags)
    payload += struct.pack(">I", len(placements))
    payload += bw.finish()
    segs.append(_segment(3, 6, referred + [2], 1, payload))
    return b"".join(segs)


# ---------------------------------------------------------------------------
# refinement coding (6.3): encoder mirror of decode_refinement, a
# refinement-aggregate symbol dictionary (SDREFAGG=1 refining the
# exports of a base dictionary), and a text region with per-instance
# IARI refinement
# ---------------------------------------------------------------------------

from ..pdfkernel.jbig2 import _REFINEMENT_TEMPLATES  # noqa: E402


def encode_refinement(enc: MQEncoder, bitmap, reference, dx: int, dy: int,
                      template: int, at, cache: ContextCache) -> None:
    coding = list(_REFINEMENT_TEMPLATES[template][0])
    ref_tpl = list(_REFINEMENT_TEMPLATES[template][1])
    if template == 0:
        coding.append(tuple(at[0]))
        ref_tpl.append(tuple(at[1]))
    height = len(bitmap)
    width = len(bitmap[0]) if height else 0
    ref_h = len(reference)
    ref_w = len(reference[0]) if ref_h else 0
    cx = cache.get_contexts("GR")
    for i in range(height):
        for j in range(width):
            label = 0
            for x, y in coding:
                i0, j0 = i + y, j + x
                if i0 < 0 or j0 < 0 or j0 >= width:
                    label <<= 1
                else:
                    label = (label << 1) | bitmap[i0][j0]
            for x, y in ref_tpl:
                i0, j0 = i + y - dy, j + x - dx
                if i0 < 0 or i0 >= ref_h or j0 < 0 or j0 >= ref_w:
                    label <<= 1
                else:
                    label = (label << 1) | reference[i0][j0]
            enc.encode(cx, label, bitmap[i][j])


_R_AT = ((-1, -1), (-1, -1))


def refagg_dict_payload(input_symbols: list, refined: list) -> bytes:
    """SDREFAGG=1 dictionary: each new symbol refines an input symbol.
    refined: list of (input_index, bitmap, rdx, rdy), ascending heights.
    Exports ONLY the new symbols."""
    enc = MQEncoder()
    cache = ContextCache()
    num_new = len(refined)
    code_len = _log2(len(input_symbols) + num_new)
    order = sorted(range(num_new), key=lambda k: len(refined[k][1]))
    cur_h = 0
    i = 0
    while i < num_new:
        h = len(refined[order[i]][1])
        encode_integer(cache, "IADH", enc, h - cur_h)
        cur_h = h
        cur_w = 0
        while i < num_new and len(refined[order[i]][1]) == cur_h:
            base_idx, bitmap, rdx, rdy = refined[order[i]]
            encode_integer(cache, "IADW", enc, len(bitmap[0]) - cur_w)
            cur_w = len(bitmap[0])
            encode_integer(cache, "IAAI", enc, 1)  # single instance
            encode_iaid(cache, enc, code_len, base_idx)
            encode_integer(cache, "IARDX", enc, rdx)
            encode_integer(cache, "IARDY", enc, rdy)
            encode_refinement(enc, bitmap, input_symbols[base_idx],
                              rdx, rdy, 0, _R_AT, cache)
            i += 1
        encode_integer(cache, "IADW", enc, None)
    # export flags: skip the input symbols, export the new ones
    encode_integer(cache, "IAEX", enc, len(input_symbols))
    encode_integer(cache, "IAEX", enc, num_new)
    data = enc.finish()
    flags = 2  # refinement, arithmetic, templates 0, rtemplate 0
    payload = struct.pack(">H", flags)
    for ax, ay in _NOMINAL_AT:  # GB AT pixels (template 0) — nominal
        payload += bytes([ax & 0xFF, ay & 0xFF])
    for ax, ay in _R_AT:
        payload += bytes([ax & 0xFF, ay & 0xFF])
    payload += struct.pack(">II", num_new, num_new)
    return payload + data


def build_refined_symbol_text_stream(width: int, height: int,
                                     base_symbols: list, refined: list,
                                     placements,
                                     inline_refine=None) -> bytes:
    """Page with a base dictionary (seg 2), a refinement-aggregate
    dictionary refining its exports (seg 3, SDREFAGG=1), and a text
    region (seg 4) placing ids [bases..., refined...].  placements:
    (symbol_id, s_left, t_top).  inline_refine: optional dict mapping a
    placement INDEX to (bitmap, rdw, rdh, rdx, rdy) applied via IARI=1
    at that instance (TEXT-REGION refinement)."""
    base_payload, base_order = symbol_dict_segment(2, base_symbols)
    segs = [page_info_segment(1, width, height),
            _segment(2, 0, [], 1, base_payload)]
    base_remap = {orig: pos for pos, orig in enumerate(base_order)}
    exported_bases = [base_symbols[base_order[i]]
                      for i in range(len(base_symbols))]
    refined_mapped = [(base_remap[bi], bm, rdx, rdy)
                      for bi, bm, rdx, rdy in refined]
    segs.append(_segment(3, 0, [2], 1,
                         refagg_dict_payload(exported_bases,
                                             refined_mapped)))
    # text region referring to both dictionaries: ids are bases (in
    # exported order) then refined (ascending-height order)
    n_sym = len(base_symbols) + len(refined)
    code_len = _log2(n_sym)
    enc = MQEncoder()
    cache = ContextCache()
    r_order = sorted(range(len(refined)),
                     key=lambda k: len(refined[k][1]))
    r_remap = {orig: len(base_symbols) + pos
               for pos, orig in enumerate(r_order)}

    def text_id(sym_id: int) -> int:
        if sym_id < len(base_symbols):
            return base_remap[sym_id]
        return r_remap[sym_id - len(base_symbols)]

    by_t: dict[int, list] = {}
    for idx, (sym, s, t) in enumerate(placements):
        by_t.setdefault(t, []).append((s, sym, idx))
    strip_ts = sorted(by_t)
    encode_integer(cache, "IADT", enc, 0)
    cur_strip_t = 0
    first_s = 0
    all_syms = exported_bases + [refined[k][1] for k in r_order]
    inline_refine = inline_refine or {}
    for t in strip_ts:
        encode_integer(cache, "IADT", enc, t - cur_strip_t)
        cur_strip_t = t
        row = sorted(by_t[t])
        encode_integer(cache, "IAFS", enc, row[0][0] - first_s)
        first_s = row[0][0]
        prev_right = None
        for s, sym, pidx in row:
            if prev_right is not None:
                encode_integer(cache, "IADS", enc, s - prev_right)
            tid = text_id(sym)
            encode_iaid(cache, enc, code_len, tid)
            inline = inline_refine.get(pidx)
            if inline is None:
                encode_integer(cache, "IARI", enc, 0)
                placed = all_syms[tid]
            else:
                bitmap, rdw, rdh, rdx, rdy = inline
                encode_integer(cache, "IARI", enc, 1)
                encode_integer(cache, "IARDW", enc, rdw)
                encode_integer(cache, "IARDH", enc, rdh)
                encode_integer(cache, "IARDX", enc, rdx)
                encode_integer(cache, "IARDY", enc, rdy)
                encode_refinement(enc, bitmap, all_syms[tid],
                                  (rdw >> 1) + rdx, (rdh >> 1) + rdy,
                                  0, _R_AT, cache)
                placed = bitmap
            prev_right = s + len(placed[0]) - 1
        encode_integer(cache, "IADS", enc, None)
    data = enc.finish()
    flags = 2 | (1 << 4)  # refinement, TOPLEFT corner, rtemplate 0
    payload = _region_info(width, height, 0, 0, 0)
    payload += struct.pack(">H", flags)
    for ax, ay in _R_AT:
        payload += bytes([ax & 0xFF, ay & 0xFF])
    payload += struct.pack(">I", len(placements))
    payload += data
    segs.append(_segment(4, 6, [2, 3], 1, payload))
    return b"".join(segs)
