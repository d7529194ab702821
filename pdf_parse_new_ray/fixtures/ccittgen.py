"""CCITT G4 / G3-1D encoders for fixtures (test-side counterpart of
pdfkernel/ccitt.py).  Standard T.4/T.6 coding procedure: greedy
pass/vertical/horizontal mode selection for 2D, MH run codes for 1D.
"""

from __future__ import annotations

import numpy as np

from ..pdfkernel.ccitt import _BLACK, _WHITE

# invert the decode tables: run → (bit_length, code)
_W_ENC = {run: (ln, code) for (ln, code), run in _WHITE.items() if run >= 0}
_B_ENC = {run: (ln, code) for (ln, code), run in _BLACK.items() if run >= 0}
_MODE_BITS = {
    ("V", 0): (1, 1), ("V", 1): (3, 3), ("V", -1): (3, 2),
    ("V", 2): (6, 3), ("V", -2): (6, 2), ("V", 3): (7, 3), ("V", -3): (7, 2),
    ("P", 0): (4, 1), ("H", 0): (3, 1),
}
_MAKEUPS = sorted((r for r in _W_ENC if r >= 64), reverse=True)


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
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc << (8 - self.nbits))
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _write_run(bw: _BitWriter, run: int, white: bool) -> None:
    enc = _W_ENC if white else _B_ENC
    while run >= 64:
        mk = max(m for m in _MAKEUPS if m <= run)  # largest makeup ≤ run
        ln, code = enc[mk]
        bw.write(code, ln)
        run -= mk
    ln, code = enc[run]
    bw.write(code, ln)


def _changes(row: np.ndarray) -> list[int]:
    """Changing-element positions (run end positions, white-first: a row
    that starts black begins with a zero-length white run ending at 0)."""
    d = (np.nonzero(np.diff(row.astype(np.int8)))[0] + 1).tolist()
    if row[0] == 1:
        d = [0] + d
    return d


def encode_g4(img: np.ndarray, with_eofb: bool = True) -> bytes:
    """(rows, cols) 1=black array → T.6 (Group 4) stream."""
    rows, columns = img.shape
    bw = _BitWriter()
    ref = [columns, columns]
    for y in range(rows):
        cur = _changes(img[y]) + [columns, columns]
        a0 = -1
        white = True
        ci = 0  # index into cur of the next changing element ≥ a0
        while a0 < columns:
            # b1/b2 on the reference line
            parity = 0 if white else 1
            b1 = b2 = columns
            i = parity
            while i < len(ref):
                if ref[i] > a0:
                    b1 = ref[i]
                    b2 = ref[i + 1] if i + 1 < len(ref) else columns
                    break
                i += 2
            # a1 = next changing element on the coding line after a0
            while ci < len(cur) and cur[ci] <= a0:
                ci += 1
            a1 = cur[ci] if ci < len(cur) else columns
            a2 = cur[ci + 1] if ci + 1 < len(cur) else columns
            if b2 < a1:
                ln, code = _MODE_BITS[("P", 0)]
                bw.write(code, ln)
                a0 = b2
            elif abs(a1 - b1) <= 3:
                ln, code = _MODE_BITS[("V", a1 - b1)]
                bw.write(code, ln)
                a0 = a1
                white = not white
            else:
                ln, code = _MODE_BITS[("H", 0)]
                bw.write(code, ln)
                a0s = max(a0, 0)
                _write_run(bw, a1 - a0s, white)
                _write_run(bw, a2 - a1, not white)
                a0 = a2
            if a0 >= columns:
                break
        ref = _changes(img[y]) + [columns, columns]
    if with_eofb:
        bw.write(0x001, 12)
        bw.write(0x001, 12)
    return bw.flush()


def encode_g3_1d(img: np.ndarray) -> bytes:
    """(rows, cols) 1=black array → K=0 (MH 1D) stream, no EOLs."""
    rows, columns = img.shape
    bw = _BitWriter()
    for y in range(rows):
        pos = 0
        white = True
        # lines always start with a white run (possibly length 0); the
        # trailing sentinel emits the final run out to `columns`
        for c in _changes(img[y]) + [columns]:
            _write_run(bw, c - pos, white)
            pos = c
            white = not white
            if pos >= columns:
                break
    return bw.flush()
