"""Font loading + charcode→(unicode, width) decoding.

Parity targets in the reference: `charsToGlyphs` (build/pdf.worker.js:
29819-29846), CMap / IdentityCMap (:14401,:14539), ToUnicodeMap /
IdentityToUnicodeMap (:21968,:22004), `readToUnicode` (:37362-37416),
glyph category (:20976-20988).  Re-implemented from the PDF spec + Adobe
CMap spec; behavior (unicode string and advance width per charcode) is what
must match, not structure.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Any, Optional

from .afm_data import METRICS, SERIF_FONTS, STD_FONT_MAP
from .cos import FastLexer, Name, PDFError, Ref, StreamObj
from .encodings import (
    encoding_names,
    encoding_table,
    glyph_name_to_unicode,
    simple_font_to_unicode,
    simple_font_to_unicode_cached,
)

FONT_IDENTITY_MATRIX = (0.001, 0.0, 0.0, 0.001, 0.0, 0.0)

# getSymbolsFonts (build/pdf.worker.js:21391-21398): named fonts whose
# non-embedded instances suppress an explicit base encoding and force the
# symbolic default-table selection.
_SYMBOLS_FONTS = frozenset(
    ("Dingbats", "Symbol", "ZapfDingbats", "Wingdings",
     "Wingdings-Bold", "Wingdings-Regular")
)


# JS /\\s/ whitespace set (cf. getCharUnicodeCategory regex,
# build/pdf.worker.js:20974): note it EXCLUDES \x1c-\x1f, which Python's
# str.isspace() would include.
_JS_WS = frozenset(
    " \t\n\x0b\x0c\r\u00a0\u1680\u2028\u2029\u202f\u205f\u3000\ufeff"
) | frozenset(chr(c) for c in range(0x2000, 0x200B))


class Glyph:
    __slots__ = ("unicode", "width", "is_space", "is_diacritic", "is_format_mark")

    def __init__(self, unicode: str, width: float):
        self.unicode = unicode
        self.width = width
        # category per pdf.js getCharUnicodeCategory: ^(\\s)|(\\p{Mn})|(\\p{Cf})$
        if len(unicode) == 1:
            self.is_space = unicode in _JS_WS
            cat = unicodedata.category(unicode)
            self.is_diacritic = cat == "Mn"
            self.is_format_mark = cat == "Cf"
        else:
            self.is_space = False
            self.is_diacritic = False
            self.is_format_mark = False


class ToUnicodeMap:
    """charcode -> unicode string, parsed from a ToUnicode CMap stream."""

    def __init__(self) -> None:
        self.map: dict[int, str] = {}

    def get(self, code: int) -> Optional[str]:
        return self.map.get(code)

    @classmethod
    def parse(cls, data: bytes) -> "ToUnicodeMap":
        m = cls()
        lx = FastLexer(data, 0)
        stack: list[Any] = []
        mode: Optional[str] = None
        try:
            while True:
                tok = lx.next_token()
                if tok.kind == "eof":
                    break
                if tok.kind == "op":
                    v = tok.value
                    if v == "beginbfchar":
                        mode, stack = "bfchar", []
                    elif v == "beginbfrange":
                        mode, stack = "bfrange", []
                    elif v in ("endbfchar", "endbfrange", "endcmap"):
                        mode = None
                    continue
                if mode is None:
                    continue
                if tok.kind == "str":
                    stack.append(tok.value)
                elif tok.kind == "arr_open":
                    arr = []
                    while True:
                        t2 = lx.next_token()
                        if t2.kind in ("arr_close", "eof"):
                            break
                        if t2.kind == "str":
                            arr.append(t2.value)
                    stack.append(arr)
                elif tok.kind in ("int", "num"):
                    stack.append(tok.value)
                if mode == "bfchar" and len(stack) == 2:
                    src, dst = stack
                    stack = []
                    if isinstance(src, bytes) and isinstance(dst, bytes):
                        m.map[int.from_bytes(src, "big")] = _utf16be(dst)
                elif mode == "bfrange" and len(stack) == 3:
                    lo, hi, dst = stack
                    stack = []
                    if not (isinstance(lo, bytes) and isinstance(hi, bytes)):
                        continue
                    lo_i, hi_i = int.from_bytes(lo, "big"), int.from_bytes(hi, "big")
                    if hi_i - lo_i > 0x10000:
                        hi_i = lo_i + 0x10000
                    if isinstance(dst, list):
                        for i, d in enumerate(dst):
                            if lo_i + i <= hi_i and isinstance(d, bytes):
                                m.map[lo_i + i] = _utf16be(d)
                    elif isinstance(dst, bytes):
                        base = int.from_bytes(dst, "big") if len(dst) <= 4 else None
                        for c in range(lo_i, hi_i + 1):
                            if base is not None:
                                m.map[c] = _utf16be((base + (c - lo_i)).to_bytes(max(2, len(dst)), "big"))
                            else:
                                # long destination: increment last code unit
                                s = _utf16be(dst)
                                m.map[c] = s[:-1] + chr(ord(s[-1]) + (c - lo_i)) if s else ""
        except (PDFError, OverflowError, ValueError):
            pass
        return m


def _utf16be(b: bytes) -> str:
    if len(b) % 2:
        b = b + b"\x00"
    try:
        return b.decode("utf-16-be", "replace")
    except Exception:
        return ""


class Font:
    """Loaded font: decodes content-stream char bytes to glyphs.

    One instance per (font-dict ref) — cached per document in the extractor
    actor (SURVEY §2.3 T2: warm `_charsCache` analogue)."""

    def __init__(self, doc, font_dict: dict, loaded_name: str):
        r = doc.resolve
        self.loaded_name = loaded_name
        self.font_dict = font_dict
        subtype = str(r(font_dict.get("Subtype", "")) or "")
        self.subtype = subtype
        self.vertical = False
        self.is_type3 = subtype == "Type3"
        self.font_matrix = FONT_IDENTITY_MATRIX
        self.base_font = str(r(font_dict.get("BaseFont", "")) or "")
        self.fallback_name = self.base_font.split("+")[-1] or "sans-serif"
        self.ascent = 0.75
        self.descent = -0.25
        self.composite = subtype == "Type0"
        self._glyph_cache: dict[bytes, list[Glyph]] = {}

        if self.is_type3:
            fm = r(font_dict.get("FontMatrix"))
            if isinstance(fm, list) and len(fm) == 6:
                self.font_matrix = tuple(float(r(v)) for v in fm)

        desc = None
        if self.composite:
            desc_fonts = r(font_dict.get("DescendantFonts"))
            d0 = r(desc_fonts[0]) if isinstance(desc_fonts, list) and desc_fonts else {}
            desc = r((d0 or {}).get("FontDescriptor"))
            self._set_symbolic(doc, desc)
            self._load_cid(doc, d0 or {})
        else:
            desc = r(font_dict.get("FontDescriptor"))
            self._set_symbolic(doc, desc)
            self._load_simple(doc, font_dict, desc if isinstance(desc, dict) else None)

        if isinstance(desc, dict):
            a = r(desc.get("Ascent"))
            d = r(desc.get("Descent"))
            if isinstance(a, (int, float)) and a:
                self.ascent = a / 1000.0
            if isinstance(d, (int, float)) and d:
                self.descent = d / 1000.0
            mw = r(desc.get("MissingWidth"))
            if isinstance(mw, (int, float)):
                self.default_width = float(mw)

        # ToUnicode
        self.to_unicode: Optional[ToUnicodeMap] = None
        tu = r(font_dict.get("ToUnicode"))
        if isinstance(tu, StreamObj):
            try:
                self.to_unicode = ToUnicodeMap.parse(tu.get_data(r))
            except PDFError:
                self.to_unicode = None

    # -- simple fonts ----------------------------------------------------
    def _load_simple(self, doc, fd: dict, desc: Optional[dict]) -> None:
        r = doc.resolve
        self.default_width = 0.0
        widths: dict[int, float] = {}
        first = r(fd.get("FirstChar", 0)) or 0
        warr = r(fd.get("Widths"))
        has_widths_array = isinstance(warr, list)
        if has_widths_array:
            for i, w in enumerate(warr):
                w = r(w)
                if isinstance(w, (int, float)):
                    widths[first + i] = float(w)
        self.widths = widths

        # encoding selection — PartialEvaluator.extractDataStructures parity
        # (pdf.worker.js:37167-37229): an explicit /Encoding name or
        # /BaseEncoding survives only for MacRoman/MacExpert/WinAnsi; a
        # non-embedded symbols-list font suppresses it; the default table is
        # Standard / WinAnsi (TrueType, not explicitly nonsymbolic) /
        # MacRoman (symbolic — with the Symbol/ZapfDingbats/Wingdings set
        # tables for the non-embedded named fonts).
        base_name: Optional[str] = None
        diffs: dict[int, str] = {}
        enc = r(fd.get("Encoding"))
        if isinstance(enc, Name):
            base_name = str(enc)
        elif isinstance(enc, dict):
            be = r(enc.get("BaseEncoding"))
            if isinstance(be, (Name, str)):
                base_name = str(be)
            darr = r(enc.get("Differences"))
            if isinstance(darr, list):
                code = 0
                for item in darr:
                    item = r(item)
                    if isinstance(item, (int, float)):
                        code = int(item)
                    elif isinstance(item, (Name, str)):
                        diffs[code] = str(item)
                        code += 1
        if base_name not in ("MacRomanEncoding", "MacExpertEncoding",
                             "WinAnsiEncoding"):
            base_name = None
        embedded = isinstance(desc, dict) and any(
            isinstance(r(desc.get(k)), StreamObj)
            for k in ("FontFile", "FontFile2", "FontFile3"))
        self.missing_file = not embedded
        is_symbols_name = self.base_font in _SYMBOLS_FONTS
        if base_name is not None and not embedded and is_symbols_name:
            base_name = None
        has_encoding = base_name is not None or bool(diffs)
        # NB: selection uses the RAW symbolic bit (flags & 4), per the
        # reference's local isSymbolicFont (pdf.worker.js:37210) — not the
        # symbolic-and-not-nonsymbolic combination used elsewhere.
        symbolic_raw = bool(self.flags & 4)
        default_enc_name = None
        if base_name is not None:
            enc_name = base_name
        else:
            enc_name = "StandardEncoding"
            if self.subtype == "TrueType" and not (self.flags & 32):
                enc_name = "WinAnsiEncoding"
            if symbolic_raw or is_symbols_name:
                enc_name = "MacRomanEncoding"
                if not embedded:
                    if re.search(r"Symbol", self.base_font, re.I):
                        enc_name = "SymbolSetEncoding"
                    elif re.search(r"Dingbats", self.base_font, re.I):
                        enc_name = "ZapfDingbatsEncoding"
                    elif re.search(r"Wingdings", self.base_font, re.I):
                        enc_name = "WinAnsiEncoding"
            default_enc_name = enc_name
        default_names = encoding_names(enc_name)
        # resolved per-code glyph names: differences first, then the default
        # table — the lookup _charToGlyph performs for the missing-file
        # Type1 empty-name rule (pdf.worker.js:29779-29786)
        if diffs:
            self._enc_names_resolved = [
                diffs.get(c, default_names[c]) for c in range(256)
            ]
            # merged names for _simpleFontToUnicode (its own differences
            # loop skips only '.notdef', pdf.worker.js:37248-37253)
            merged = list(default_names)
            for code, gname in diffs.items():
                if 0 <= code < 256 and gname != ".notdef":
                    merged[code] = gname
            table = simple_font_to_unicode(merged, base_name)
        else:
            self._enc_names_resolved = default_names  # read-only tuple
            table = simple_font_to_unicode_cached(default_names, base_name)
        # builtin font-program encoding: Type1 cleartext /Encoding or CFF
        # (FontFile3) Charset+Encoding — the reference's builtInEncoding
        builtin = self._parse_builtin_font_encoding(doc, desc)
        has_included_tounicode = isinstance(r(fd.get("ToUnicode")), StreamObj)
        # embedded-TrueType recovery (adjustTrueTypeToUnicode,
        # pdf.worker.js:27514-27558): a symbolic TrueType with NO /Encoding
        # and no included /ToUnicode whose `name` table records are all
        # Windows records is actually WinAnsi-coded — overlay WinAnsi where
        # the AGL maps the name.
        if (self.subtype == "TrueType" and symbolic_raw and not has_encoding
                and not has_included_tounicode
                and default_enc_name != "WinAnsiEncoding"
                and self._truetype_name_records_all_windows(doc, desc)):
            win = encoding_table("WinAnsiEncoding")
            table = [win[c] if win[c] else table[c] for c in range(256)]
        # adjustType1ToUnicode amend (pdf.worker.js:27559-27586): builtin
        # font-program glyph names OVERWRITE the encoding-derived values for
        # codes not pinned by a base encoding name (which suppresses every
        # amend) or a per-code /Differences entry; an included /ToUnicode
        # suppresses the amend entirely (hasIncludedToUnicodeMap guard).
        if builtin is not None and not has_included_tounicode:
            if isinstance(table, tuple):
                table = list(table)
            for code, gname in builtin.items():
                if 0 <= code < 256:
                    if has_encoding and (base_name is not None
                                         or code in diffs):
                        continue
                    u = glyph_name_to_unicode(gname)
                    if u:
                        table[code] = u
        self._enc_table = table
        self._diff_names = diffs
        self._has_encoding = has_encoding
        # no /Widths array: the standard-14 AFM metrics keyed by glyph NAME
        # through the resolved encoding — getBaseFontMetrics +
        # buildCharCodeToWidth (pdf.worker.js:37559-37597); a glyph name
        # outside the AFM table gets NO width (defaultWidth 0), which is
        # what suppresses inter-item space insertion for such glyphs.
        if not has_widths_array:
            if diffs:
                gw, self.default_width = _base_font_metrics(self.base_font)
                w2: dict[int, float] = {}
                for c in range(256):
                    gname = diffs.get(c)
                    if gname is not None and gw.get(gname):
                        w2[c] = gw[gname]
                        continue
                    gn = default_names[c]
                    if gn and gw.get(gn):
                        w2[c] = gw[gn]
                self.widths = w2
            else:
                # memoized shared dict — read-only after build
                self.widths, self.default_width = _std14_charcode_widths(
                    self.base_font, enc_name)

    def _set_symbolic(self, doc, desc) -> None:
        flags = doc.resolve(desc.get("Flags")) if isinstance(desc, dict) else None
        self.flags = flags if isinstance(flags, int) else 0
        self.symbolic = bool(isinstance(flags, int) and (flags & 4) and not (flags & 32))

    @staticmethod
    def _truetype_name_records_all_windows(doc, desc) -> bool:
        """Parse the embedded FontFile2 sfnt `name` table: True iff it has
        at least one Mac/Windows name record and ALL of them are Windows
        (platform 3, encoding 1, language 0x409) — the reference's
        isWinNameRecord gate (pdf.worker.js:27740, readNameTable:29004)."""
        if not isinstance(desc, dict):
            return False
        ff = doc.resolve(desc.get("FontFile2"))
        if not isinstance(ff, StreamObj):
            return False
        try:
            data = ff.get_data(doc.resolve)
        except PDFError:
            return False
        if len(data) < 12:
            return False
        try:
            num_tables = int.from_bytes(data[4:6], "big")
            name_off = name_len = None
            for i in range(num_tables):
                rec = data[12 + 16 * i: 12 + 16 * (i + 1)]
                if len(rec) < 16:
                    return False
                if rec[0:4] == b"name":
                    name_off = int.from_bytes(rec[8:12], "big")
                    name_len = int.from_bytes(rec[12:16], "big")
                    break
            if name_off is None or name_off + 6 > len(data):
                return False
            tbl = data[name_off: name_off + name_len]
            fmt = int.from_bytes(tbl[0:2], "big")
            if fmt != 0 or len(tbl) < 6:
                return False
            count = int.from_bytes(tbl[2:4], "big")
            records = []
            for i in range(count):
                r = tbl[6 + 12 * i: 6 + 12 * (i + 1)]
                if len(r) < 12:
                    break
                plat = int.from_bytes(r[0:2], "big")
                enc = int.from_bytes(r[2:4], "big")
                lang = int.from_bytes(r[4:6], "big")
                if (plat == 1 and enc == 0 and lang == 0) or \
                        (plat == 3 and enc == 1 and lang == 0x409):
                    records.append((plat, enc, lang))
            return bool(records) and all(p == 3 for p, _, _ in records)
        except (IndexError, ValueError):
            return False

    def _parse_builtin_font_encoding(self, doc, desc) -> Optional[dict[int, str]]:
        """code→glyphname from the embedded font program: Type1 cleartext
        /Encoding (FontFile) or CFF Charset+Encoding (FontFile3/Type1C,
        reference CFFFont._createBuiltInEncoding)."""
        b = self._parse_builtin_type1_encoding(doc, desc)
        if b is not None:
            return b
        if not isinstance(desc, dict):
            return None
        ff3 = doc.resolve(desc.get("FontFile3"))
        if not isinstance(ff3, StreamObj):
            return None
        try:
            from .cff import cff_builtin_encoding

            return cff_builtin_encoding(ff3.get_data(doc.resolve))
        except Exception:
            return None

    @staticmethod
    def _parse_builtin_type1_encoding(doc, desc: Optional[dict]) -> Optional[dict[int, str]]:
        """Parse /Encoding from the cleartext section of an embedded Type1
        font program (the source pdf.js uses for symbolic Type1 base
        encodings).  Returns code→glyphname, or None."""
        if not isinstance(desc, dict):
            return None
        ff = doc.resolve(desc.get("FontFile"))
        if not isinstance(ff, StreamObj):
            return None
        try:
            data = ff.get_data(doc.resolve)
        except PDFError:
            return None
        head = data.split(b"eexec", 1)[0]
        idx = head.find(b"/Encoding")
        if idx == -1:
            return None
        seg = head[idx : idx + 65536]
        if b"StandardEncoding" in seg[:64]:
            enc_std = encoding_table("StandardEncoding")
            # reuse unicode table by synthesizing names is pointless; signal
            # "standard" by returning None so caller falls through — but the
            # caller only reaches here when symbolic, so map via table:
            return None
        out: dict[int, str] = {}
        for m in re.finditer(rb"dup\s+(\d+)\s*/([^\s/\(\)\[\]{}<>]+)\s+put", seg):
            try:
                out[int(m.group(1))] = m.group(2).decode("latin-1")
            except ValueError:
                continue
        return out or None

    # -- composite (Type0) fonts ----------------------------------------
    def _load_cid(self, doc, d0: dict) -> None:
        r = doc.resolve
        self.default_width = float(r(d0.get("DW", 1000)) or 1000)
        widths: dict[int, float] = {}
        warr = r(d0.get("W"))
        if isinstance(warr, list):
            i = 0
            vals = [r(v) for v in warr]
            while i < len(vals):
                c = vals[i]
                if i + 1 < len(vals) and isinstance(vals[i + 1], list):
                    for j, w in enumerate(vals[i + 1]):
                        w = r(w)
                        if isinstance(w, (int, float)):
                            widths[int(c) + j] = float(w)
                    i += 2
                elif i + 2 < len(vals):
                    c2, w = vals[i + 1], vals[i + 2]
                    if all(isinstance(x, (int, float)) for x in (c, c2, w)):
                        for cc in range(int(c), min(int(c2), int(c) + 65536) + 1):
                            widths[cc] = float(w)
                    i += 3
                else:
                    break
        self.widths = widths
        self.cid_to_gid_identity = True
        enc = doc.resolve(self.font_dict.get("Encoding")) if hasattr(self, "font_dict") else None
        self.vertical = isinstance(enc, (Name, str)) and str(enc).endswith("-V")
        # /Encoding as an embedded CMap STREAM: variable-length codes +
        # code→CID mapping (reference: CMapFactory.create on a BaseStream,
        # pdf.worker.js:14761+).  CIDSystemInfo-REGISTERED non-identity
        # CMaps are external resource files neither engine ships offline;
        # Identity-H/V stays the fast default path.
        self.cmap = None
        if isinstance(enc, StreamObj):
            from .cmap import EmbeddedCMap

            try:
                self.cmap = EmbeddedCMap.parse(enc.get_data(doc.resolve))
                self.vertical = self.cmap.vertical or str(
                    self.cmap.name).endswith("-V")
            except PDFError:
                self.cmap = None
        self._enc_table = None
        self._diff_names = {}
        self._enc_names_resolved = None
        self._has_encoding = False
        self.missing_file = False

    # -- decode ----------------------------------------------------------
    def chars_to_glyphs(self, chars: bytes) -> list[Glyph]:
        cached = self._glyph_cache.get(chars)
        if cached is not None:
            return cached
        glyphs: list[Glyph] = []
        # per-code cache probed inline (one dict.get per glyph instead of
        # a _make_glyph call — the hot loop of every Tj)
        code_cache = self.__dict__.setdefault("_code_cache", {})
        cget = code_cache.get
        ap = glyphs.append
        mg = self._make_glyph
        if self.composite:
            cmap = getattr(self, "cmap", None)
            if cmap is not None:
                # embedded-CMap codespace segmentation (charsToGlyphs with
                # cMap.readCharCode, pdf.worker.js:29826-29837)
                i, nn = 0, len(chars)
                rcc = cmap.read_char_code
                while i < nn:
                    code, length = rcc(chars, i)
                    i += length
                    g = cget(code)
                    ap(g if g is not None else mg(code))
            else:
                # 2-byte Identity mapping
                for i in range(0, len(chars) - 1, 2):
                    code = (chars[i] << 8) | chars[i + 1]
                    g = cget(code)
                    ap(g if g is not None else mg(code))
                if len(chars) % 2:  # dangling byte
                    g = cget(chars[-1])
                    ap(g if g is not None else mg(chars[-1]))
        else:
            for b in chars:
                g = cget(b)
                ap(g if g is not None else mg(b))
        if len(self._glyph_cache) < 4096:
            self._glyph_cache[chars] = glyphs
        return glyphs

    def _make_glyph(self, code: int) -> Glyph:
        # per-charcode cache (Glyphs are immutable): the string-keyed
        # _glyph_cache only hits on repeated whole strings, this one hits on
        # every repeated character
        cache = self.__dict__.setdefault("_code_cache", {})
        g = cache.get(code)
        if g is not None:
            return g
        g = self._make_glyph_uncached(code)
        cache[code] = g
        return g

    def _make_glyph_uncached(self, code: int) -> Glyph:
        # unicode precedence == buildToUnicode + _charToGlyph
        # (pdf.worker.js:37321-37330, :29772): included /ToUnicode first;
        # its holes consult the encoding-derived table only when the font
        # HAS an encoding (amendFallbackToUnicode, :27590-27604); without an
        # included map the encoding table (with builtin amendments) IS the
        # toUnicode; remaining holes fall back to the charcode itself.
        u: Optional[str] = None
        if self.to_unicode is not None:
            u = self.to_unicode.get(code)
            if u is None and self._has_encoding and self._enc_table is not None \
                    and 0 <= code < 256:
                u = self._enc_table[code] or None
        elif self._enc_table is not None and 0 <= code < 256:
            u = self._enc_table[code] or None
        if not u:
            # pdf.js falls back to the charcode itself
            try:
                u = chr(code)
            except ValueError:
                u = "�"
        # widths are CID-keyed for composite fonts: widthCode goes through
        # the CMap when it contains the charcode (_charToGlyph,
        # pdf.worker.js:29760-29766)
        width_code = code
        cmap = getattr(self, "cmap", None)
        if cmap is not None:
            cid = cmap.lookup(code)
            if cid is not None:
                width_code = cid
        w = self.widths.get(width_code)
        if w is None:
            w = self.default_width
        # missing-file Type1 empty-name rule (_charToGlyph,
        # pdf.worker.js:29779-29786): a non-embedded Type1 charcode whose
        # resolved glyph name is '' renders the space fontChar — unicode
        # becomes ' ' and a zero width borrows the space width.
        if (self.missing_file and self.subtype in ("Type1", "MMType1")
                and self._enc_names_resolved is not None and 0 <= code < 256
                and self._enc_names_resolved[code] == ""):
            u = " "
            if not w:
                w = self.widths.get(0x20) or self.default_width
        return Glyph(u, w)


# -- standard 14 metrics (AFM, name-keyed) -----------------------------------
def _base_font_metrics(name: str) -> tuple[dict[str, float], float]:
    """getBaseFontMetrics parity (pdf.worker.js:37559-37581): alias map,
    then Times-Roman/Helvetica fallback by serif-ness; monospace entries
    carry a single default advance and an empty name table."""
    lookup = STD_FONT_MAP.get(name, name)
    if lookup not in METRICS:
        wo_style = name.split("-", 1)[0]
        serif = wo_style in SERIF_FONTS or re.search(r"serif", wo_style, re.I)
        lookup = "Times-Roman" if serif else "Helvetica"
    gw = METRICS[lookup]
    if isinstance(gw, float):
        return {}, gw
    return gw, 0.0


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=256)
def _std14_charcode_widths(base_font: str, enc_name: str):
    """Memoized buildCharCodeToWidth for the no-/Differences case; the
    returned dict is shared across Font instances and never mutated."""
    gw, default = _base_font_metrics(base_font)
    names = encoding_names(enc_name)
    w2 = {}
    for c in range(256):
        gn = names[c]
        if gn and gw.get(gn):
            w2[c] = gw[gn]
    return w2, default
