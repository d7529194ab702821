"""Embedded CMap streams for Type0 /Encoding.

Parity targets in the reference: CMap class + readCharCode
(build/pdf.worker.js:14401-14520) and the textual CMap parser
(parseCMap / parseCodespaceRange / parseCidChar / parseCidRange /
parseWMode / parseCMapName, :14611-14760).  Registered external CMaps
(UniGB-UCS2-H etc.) are NOT supported — the reference ships no cmap
resource files either, so both engines fail identically on those; only
CMap STREAMS embedded in the PDF are handled here.

Re-implemented from ISO 32000-1 §9.7.5 + the Adobe CMap spec; behavior
(code segmentation and code→CID mapping) is what must match.
"""

from __future__ import annotations

from typing import Optional

from .cos import Lexer, Name, PDFError

# pdf.js MAX_MAP_RANGE guard (CMap.mapCidRange): ranges above 2^24 codes
# are ignored rather than materialized.
_MAX_MAP_RANGE = 2 ** 24


class EmbeddedCMap:
    """code→CID map with codespace-driven variable-length code reading."""

    __slots__ = ("codespace_ranges", "_chars", "_ranges", "vertical", "name")

    def __init__(self) -> None:
        # per byte-length (index n-1): flat [lo, hi, lo, hi, ...]
        self.codespace_ranges: list[list[int]] = [[], [], [], []]
        self._chars: dict[int, int] = {}
        self._ranges: list[tuple[int, int, int]] = []
        self.vertical = False
        self.name = ""

    # -- queries ---------------------------------------------------------
    def read_char_code(self, data: bytes, offset: int) -> tuple[int, int]:
        """(charcode, byte_length) per readCharCode: accumulate bytes until
        the value falls inside a codespace range of that byte length;
        unmatched → (0, 1).  An out-of-range read acts as byte 0 (JS
        charCodeAt → NaN → |0)."""
        c = 0
        n_data = len(data)
        for n in range(4):
            i = offset + n
            c = ((c << 8) | (data[i] if i < n_data else 0)) & 0xFFFFFFFF
            rng = self.codespace_ranges[n]
            for k in range(0, len(rng), 2):
                if rng[k] <= c <= rng[k + 1]:
                    return c, n + 1
        return 0, 1

    def lookup(self, code: int) -> Optional[int]:
        cid = self._chars.get(code)
        if cid is not None:
            return cid
        for low, high, dst in self._ranges:
            if low <= code <= high:
                return dst + (code - low)
        return None

    # -- parser ----------------------------------------------------------
    @classmethod
    def parse(cls, data: bytes) -> "EmbeddedCMap":
        m = cls()
        lx = Lexer(data, 0)
        prev_name: Optional[str] = None
        try:
            while True:
                tok = lx.next_token()
                if tok.kind == "eof":
                    break
                if tok.kind == "name":
                    nm = str(tok.value)
                    if nm == "WMode":
                        t2 = lx.next_token()
                        if t2.kind == "int":
                            m.vertical = bool(t2.value)
                    elif nm == "CMapName":
                        t2 = lx.next_token()
                        if t2.kind == "name":
                            m.name = str(t2.value)
                    prev_name = nm
                    continue
                if tok.kind != "op":
                    continue
                op = tok.value
                if op == "endcmap":
                    break
                if op == "begincodespacerange":
                    m._parse_codespace(lx)
                elif op == "begincidchar":
                    m._parse_cidchar(lx)
                elif op == "begincidrange":
                    m._parse_cidrange(lx)
                # usecmap references a registered CMap — no resource files
                # exist offline (reference included), so it is skipped; the
                # bf* operators are ToUnicode-space and ignored here, as the
                # reference's parseBfChar/parseBfRange only feed _map used
                # for bfchar-style CMaps, which /Encoding CMaps do not use.
                _ = prev_name
        except (PDFError, IndexError, ValueError):
            pass
        return m

    def _parse_codespace(self, lx: Lexer) -> None:
        while True:
            t1 = lx.next_token()
            if t1.kind == "eof" or (t1.kind == "op"
                                    and t1.value == "endcodespacerange"):
                return
            if t1.kind != "str":
                return
            t2 = lx.next_token()
            if t2.kind != "str":
                return
            lo_b, hi_b = t1.value, t2.value
            n = len(hi_b)  # pdf.js keys the range on the HIGH string length
            if not 1 <= n <= 4:
                continue
            self.codespace_ranges[n - 1].extend(
                (int.from_bytes(lo_b, "big"), int.from_bytes(hi_b, "big")))

    def _parse_cidchar(self, lx: Lexer) -> None:
        while True:
            t1 = lx.next_token()
            if t1.kind == "eof" or (t1.kind == "op"
                                    and t1.value == "endcidchar"):
                return
            if t1.kind != "str":
                return
            t2 = lx.next_token()
            if t2.kind != "int":
                return
            self._chars[int.from_bytes(t1.value, "big")] = int(t2.value)

    def _parse_cidrange(self, lx: Lexer) -> None:
        while True:
            t1 = lx.next_token()
            if t1.kind == "eof" or (t1.kind == "op"
                                    and t1.value == "endcidrange"):
                return
            if t1.kind != "str":
                return
            t2 = lx.next_token()
            if t2.kind != "str":
                return
            t3 = lx.next_token()
            if t3.kind != "int":
                return
            low = int.from_bytes(t1.value, "big")
            high = int.from_bytes(t2.value, "big")
            if high - low > _MAX_MAP_RANGE:
                continue
            self._ranges.append((low, high, int(t3.value)))
