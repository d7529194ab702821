"""CCITT Group 3/4 (T.4/T.6) fax decoder — pure Python/numpy.

Reference analogue: ``class CCITTFaxDecoder`` (lib/pdf.js/v4.5.136/
build/pdf.worker.js:8070+) decoding /CCITTFaxDecode image streams.
Implements K<0 (pure 2D / Group 4), K=0 (1D MH / Group 3) and K>0
(mixed-mode G3: per-line 1D/2D tag bit after EOL).

The modified-Huffman run tables below are the ITU-T T.4 §4.1/Table 1-3
codeword sets (terminating runs 0-63, makeup runs 64-1728, shared
extended makeups 1792-2560, EOL) stored as {(bit_length, code): run};
run == -2 marks EOL.  The constants are standard data, transcribed from
the specification tables (the reference carries the same values as
peek-indexed LUTs, pdf.worker.js:8057-8061); the decoder itself is an
independent implementation of the T.4/T.6 coding procedure.
"""

from __future__ import annotations

import numpy as np

from .cos import PDFError

_WHITE = {
    (4,7):2, (4,8):3, (4,11):4, (4,12):5, (4,14):6, (4,15):7,
    (5,7):10, (5,8):11, (5,18):128, (5,19):8, (5,20):9, (5,27):64,
    (6,3):13, (6,7):1, (6,8):12, (6,23):192, (6,24):1664, (6,42):16,
    (6,43):17, (6,52):14, (6,53):15, (7,3):22, (7,4):23, (7,8):20,
    (7,12):19, (7,19):26, (7,23):21, (7,24):28, (7,36):27, (7,39):18,
    (7,40):24, (7,43):25, (7,55):256, (8,2):29, (8,3):30, (8,4):45,
    (8,5):46, (8,10):47, (8,11):48, (8,18):33, (8,19):34, (8,20):35,
    (8,21):36, (8,22):37, (8,23):38, (8,26):31, (8,27):32, (8,36):53,
    (8,37):54, (8,40):39, (8,41):40, (8,42):41, (8,43):42, (8,44):43,
    (8,45):44, (8,50):61, (8,51):62, (8,52):63, (8,53):0, (8,54):320,
    (8,55):384, (8,74):59, (8,75):60, (8,82):49, (8,83):50, (8,84):51,
    (8,85):52, (8,88):55, (8,89):56, (8,90):57, (8,91):58, (8,100):448,
    (8,101):512, (8,103):640, (8,104):576, (9,152):1472, (9,153):1536, (9,154):1600,
    (9,155):1728, (9,204):704, (9,205):768, (9,210):832, (9,211):896, (9,212):960,
    (9,213):1024, (9,214):1088, (9,215):1152, (9,216):1216, (9,217):1280, (9,218):1344,
    (9,219):1408, (11,8):1792, (11,12):1856, (11,13):1920, (12,1):-2, (12,18):1984,
    (12,19):2048, (12,20):2112, (12,21):2176, (12,22):2240, (12,23):2304, (12,28):2368,
    (12,29):2432, (12,30):2496, (12,31):2560,
}

_BLACK = {
    (2,2):3, (2,3):2, (3,2):1, (3,3):4, (4,2):6, (4,3):5,
    (5,3):7, (6,4):9, (6,5):8, (7,4):10, (7,5):11, (7,7):12,
    (8,4):13, (8,7):14, (9,24):15, (10,8):18, (10,15):64, (10,23):16,
    (10,24):17, (10,55):0, (11,8):1792, (11,12):1856, (11,13):1920, (11,23):24,
    (11,24):25, (11,40):23, (11,55):22, (11,103):19, (11,104):20, (11,108):21,
    (12,1):-2, (12,18):1984, (12,19):2048, (12,20):2112, (12,21):2176, (12,22):2240,
    (12,23):2304, (12,28):2368, (12,29):2432, (12,30):2496, (12,31):2560, (12,36):52,
    (12,39):55, (12,40):56, (12,43):59, (12,44):60, (12,51):320, (12,52):384,
    (12,53):448, (12,55):53, (12,56):54, (12,82):50, (12,83):51, (12,84):44,
    (12,85):45, (12,86):46, (12,87):47, (12,88):57, (12,89):58, (12,90):61,
    (12,91):256, (12,100):48, (12,101):49, (12,102):62, (12,103):63, (12,104):30,
    (12,105):31, (12,106):32, (12,107):33, (12,108):40, (12,109):41, (12,200):128,
    (12,201):192, (12,202):26, (12,203):27, (12,204):28, (12,205):29, (12,210):34,
    (12,211):35, (12,212):36, (12,213):37, (12,214):38, (12,215):39, (12,218):42,
    (12,219):43, (13,74):640, (13,75):704, (13,76):768, (13,77):832, (13,82):1280,
    (13,83):1344, (13,84):1408, (13,85):1472, (13,90):1536, (13,91):1600, (13,100):1664,
    (13,101):1728, (13,108):512, (13,109):576, (13,114):896, (13,115):960, (13,116):1024,
    (13,117):1088, (13,118):1152, (13,119):1216,
}

_EOL = -2

# 2D (vertical/pass/horizontal) mode codes, T.4 Table 4 / T.6
_MODES = {
    (1, 1): ("V", 0),       # 1
    (3, 1): ("H", 0),       # 001
    (3, 3): ("V", 1),       # 011   VR1
    (3, 2): ("V", -1),      # 010   VL1
    (4, 1): ("P", 0),       # 0001
    (6, 3): ("V", 2),       # 000011 VR2
    (6, 2): ("V", -2),      # 000010 VL2
    (7, 3): ("V", 3),       # 0000011 VR3
    (7, 2): ("V", -3),      # 0000010 VL3
}

_MAX_CODE_LEN = 14


class _Bits:
    """MSB-first bit reader (zero-padded at end-of-data)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def exhausted(self) -> bool:
        return self.pos >= len(self.data)

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def byte_align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _read_code(bits: _Bits, table: dict) -> int:
    ln = 0
    code = 0
    while ln < _MAX_CODE_LEN:
        code = (code << 1) | bits.read_bit()
        ln += 1
        v = table.get((ln, code))
        if v is not None:
            return v
    raise PDFError("bad CCITT code")


def _read_run(bits: _Bits, white: bool) -> int:
    """Total run for one colour: makeup codes accumulate until a
    terminating (<64) code arrives."""
    table = _WHITE if white else _BLACK
    total = 0
    while True:
        v = _read_code(bits, table)
        if v == _EOL:
            raise PDFError("unexpected EOL inside run")
        total += v
        if v < 64:
            return total


def _read_mode(bits: _Bits):
    ln = 0
    code = 0
    while ln < 7:
        code = (code << 1) | bits.read_bit()
        ln += 1
        m = _MODES.get((ln, code))
        if m is not None:
            return m
        if ln == 7 and code == 0:
            return ("EOL?", 0)
    # 12-bit EOL prefix: 7 zeros seen is handled above; anything else is bad
    raise PDFError("bad CCITT 2D mode code")


def _decode_line_1d(bits: _Bits, columns: int) -> list[int]:
    """One MH-coded line → list of changing-element positions (the
    position where each colour run ENDS; alternating white-first)."""
    changes: list[int] = []
    pos = 0
    white = True
    while pos < columns:
        run = _read_run(bits, white)
        pos += run
        changes.append(min(pos, columns))
        white = not white
    return changes


def _decode_line_2d(bits: _Bits, ref: list[int], columns: int) -> list[int]:
    """One T.6 2D-coded line against reference changing elements."""
    changes: list[int] = []
    a0 = -1
    white = True
    while a0 < columns:
        # b1: first reference change > a0 whose parity matches the current
        # colour (even index = white→black transition)
        start_parity = 0 if white else 1
        b1 = columns
        b2 = columns
        i = start_parity
        while i < len(ref):
            if ref[i] > a0:
                b1 = ref[i]
                b2 = ref[i + 1] if i + 1 < len(ref) else columns
                break
            i += 2
        mode = _read_mode(bits)
        kind, n = mode
        if kind == "P":
            a0 = b2  # colour unchanged; no changing element recorded
        elif kind == "V":
            a1 = b1 + n
            changes.append(min(max(a1, 0), columns))
            a0 = a1
            white = not white
        elif kind == "H":
            a0s = max(a0, 0)
            r1 = _read_run(bits, white)
            r2 = _read_run(bits, not white)
            changes.append(min(a0s + r1, columns))
            changes.append(min(a0s + r1 + r2, columns))
            a0 = a0s + r1 + r2
        else:  # EOL prefix (7 zeros read): consume rest of EOL / EOFB
            return []
        if a0 >= columns:
            break
    return changes


def _changes_to_row(changes: list[int], columns: int) -> np.ndarray:
    row = np.zeros(columns, dtype=np.uint8)
    pos = 0
    black = False
    for c in changes:
        c = min(c, columns)
        if black:
            row[pos:c] = 1
        pos = c
        black = not black
        if pos >= columns:
            break
    if black and pos < columns:
        row[pos:] = 1
    return row


def decode_ccitt(data: bytes, columns: int, rows: int = 0, k: int = -1,
                 byte_align: bool = False, black_is_1: bool = False,
                 ) -> np.ndarray:
    """Decode a CCITTFax stream → (rows, columns) uint8 array, 1 = black.
    rows=0 decodes until EOFB / data end.  black_is_1 only flips
    the PACKED-output convention (pack_bilevel); the array is always
    1 = black."""
    bits = _Bits(data)
    out: list[np.ndarray] = []
    ref = [columns, columns]
    while True:
        if rows and len(out) >= rows:
            break
        if not rows and bits.exhausted():
            break
        if byte_align and k <= 0:
            bits.byte_align()
        try:
            if k < 0:
                changes = _decode_line_2d(bits, ref, columns)
                if not changes and bits.exhausted():
                    break
                if not changes:  # EOFB
                    break
            elif k == 0:
                changes = _decode_line_1d(bits, columns)
            else:  # mixed G3: EOL + 1 tag bit per line
                # scan for EOL (11 zeros + 1); tolerate fill bits
                zeros = 0
                while True:
                    b = bits.read_bit()
                    if b == 0:
                        zeros += 1
                        if zeros > 64 and bits.exhausted():
                            raise PDFError("EOL not found")
                    else:
                        if zeros >= 11:
                            break
                        zeros = 0
                tag = bits.read_bit()
                changes = (_decode_line_1d(bits, columns) if tag
                           else _decode_line_2d(bits, ref, columns))
        except PDFError:
            if out and not rows:
                break  # trailing fill bits after the last line
            raise
        out.append(_changes_to_row(changes, columns))
        ref = changes + [columns, columns]
    if rows and len(out) < rows:
        raise PDFError(f"CCITT stream ended after {len(out)}/{rows} rows")
    if not out:
        raise PDFError("empty CCITT stream")
    return np.stack(out)


def pack_bilevel(img: np.ndarray, black_is_1: bool = False) -> bytes:
    """(rows, cols) 1=black array → packed 1-bit rows (PDF CCITTFaxDecode
    output convention: BlackIs1 false ⇒ 0 bits are black)."""
    px = img if black_is_1 else (1 - img)
    return np.packbits(px, axis=1).tobytes()


def decode_mmr_planes(data: bytes, columns: int, rows: int,
                      n_planes: int) -> list[np.ndarray]:
    """Decode `n_planes` consecutive T.6 bitplanes from ONE shared bit
    cursor — the JBIG2 halftone HMMR=1 layout (T.88 6.6.5.2 via C.5:
    gray-code planes coded back-to-back, each terminated by EOFB; the
    reference runs one Reader through all planes,
    build/pdf.worker.js:9994-10005,10926-10963).  Plane boundaries
    byte-align after each EOFB (the encoder pads, matching the
    reference's byte-granular input pulls).  A truncated stream
    zero-fills the remainder, as the reference's eof path does."""
    bits = _Bits(data)
    planes: list[np.ndarray] = []
    eof = False
    for _p in range(n_planes):
        out: list[np.ndarray] = []
        ref = [columns, columns]
        while len(out) < rows:
            if eof or bits.exhausted():
                out.append(np.zeros(columns, dtype=np.uint8))
                continue
            try:
                changes = _decode_line_2d(bits, ref, columns)
            except PDFError:
                eof = True
                continue
            if not changes and _peek_is_eol_tail(bits):
                # EOFB arrived before `rows` rows: reference pads with
                # zero rows (readNextChar returns -1 → currentByte 0)
                eof = True
                continue
            out.append(_changes_to_row(changes, columns))
            ref = changes + [columns, columns]
        if not eof:
            _consume_eofb(bits)
        planes.append(np.stack(out))
    return planes


def _peek_is_eol_tail(bits: _Bits) -> bool:
    # _decode_line_2d returns [] after reading an EOL *prefix* (7 zeros);
    # treat it as the start of EOFB unconditionally — inside JBIG2 MMR
    # planes no other code begins with 7 zero bits
    return True


def _consume_eofb(bits: _Bits) -> None:
    """Consume EOFB (two T.4 EOLs: 000000000001 twice) and byte-align.
    Tolerant of fill zeros before each '1' bit; a missing/truncated EOFB
    just exhausts the stream."""
    for _ in range(2):
        zeros = 0
        while not bits.exhausted():
            if bits.read_bit():
                break
            zeros += 1
            if zeros > 64:
                return
    bits.byte_align()
