"""Character encodings + glyph-name→Unicode mapping.

Data (ISO 32000-1 Annex D tables, Adobe Glyph List) lives in
``agl_data.py``; this module carries the reference's lookup/fallback
LOGIC with per-function parity targets:

- ``glyph_name_to_unicode``  == getUnicodeForGlyph
  (reference build/pdf.worker.js:20927-20953): AGL hit, else
  ``uniXXXX`` (exactly 7 chars) / ``uXXXX[XX]`` (5-7 chars),
  upper-case hex only, parsed with JS parseInt prefix semantics.
- ``simple_font_to_unicode`` == PartialEvaluator._simpleFontToUnicode
  (pdf.worker.js:37242-37320): AGL first; G/g hex names, C/c
  decimal-else-retry-whole-font-as-hex names, u-names, f_h/f_t/T_h
  ligature names; the base-encoding re-check when the derived code
  equals the charcode.
- ``encoding_names``/``encoding_table`` == getEncoding
  (pdf.worker.js:14860-14880) as names / as AGL-resolved unicode.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Sequence

from .agl_data import AGL, ENCODING_NAMES


def encoding_names(name: str) -> tuple:
    """256-entry tuple of glyph names ('' = unmapped slot)."""
    t = ENCODING_NAMES.get(name)
    return t if t is not None else ENCODING_NAMES["StandardEncoding"]


@lru_cache(maxsize=16)
def encoding_table(name: str) -> tuple:
    """256-entry tuple code→unicode str ('' when the slot is unmapped or
    the glyph name is outside the AGL) — the view adjustTrueTypeToUnicode
    takes of WinAnsi (pdf.worker.js:27541-27553)."""
    return tuple(AGL.get(n, "") for n in encoding_names(name))


def _js_parse_int_hex(s: str) -> float:
    """JS parseInt(s, 16): longest valid prefix; NaN when none."""
    i = 0
    while i < len(s) and s[i] in "0123456789abcdefABCDEF":
        i += 1
    if i == 0:
        return math.nan
    return float(int(s[:i], 16))


def _js_plus(s: str) -> float:
    """JS unary plus on a string: decimal Number() conversion, NaN on fail."""
    t = s.strip()
    if t == "":
        return 0.0
    try:
        if t.startswith(("0x", "0X")):
            return float(int(t, 16))
        return float(t)
    except ValueError:
        return math.nan


def _unicode_for_glyph(name: str) -> int:
    """getUnicodeForGlyph parity: codepoint or -1."""
    u = AGL.get(name)
    if u is not None:
        return ord(u)
    if not name:
        return -1
    if name[0] == "u":
        n = len(name)
        if n == 7 and name[1] == "n" and name[2] == "i":
            hex_str = name[3:]
        elif 5 <= n <= 7:
            hex_str = name[1:]
        else:
            return -1
        if hex_str == hex_str.upper():
            code = _js_parse_int_hex(hex_str)
            if not math.isnan(code) and code >= 0:
                return int(code)
    return -1


@lru_cache(maxsize=4096)
def glyph_name_to_unicode(name: str) -> str:
    """Glyph name → unicode string ('' when unknown)."""
    code = _unicode_for_glyph(name)
    if code == -1:
        return ""
    try:
        return chr(code)
    except (ValueError, OverflowError):
        return ""


@lru_cache(maxsize=256)
def simple_font_to_unicode_cached(
    names: tuple, base_encoding_name: Optional[str]
) -> tuple:
    """Memoized no-/Differences path: fonts overwhelmingly reuse the same
    (default table, base name) pair across documents, and the 256-slot
    build is pure."""
    return tuple(simple_font_to_unicode(names, base_encoding_name))


def simple_font_to_unicode(
    names: Sequence[str],
    base_encoding_name: Optional[str] = None,
    force_glyphs: bool = False,
) -> list[str]:
    """_simpleFontToUnicode parity over a merged 256-name table
    (defaults + /Differences already applied by the caller).

    Returns a 256-entry unicode list with '' holes; holes fall back to
    chr(charcode) at glyph-construction time, exactly as
    ``ToUnicodeMap.get(c) || c`` does in _charToGlyph."""
    out = [""] * 256
    for charcode in range(min(256, len(names))):
        glyph_name = names[charcode]
        if glyph_name == "":
            continue
        u = AGL.get(glyph_name)
        if u is not None:
            out[charcode] = u
            continue
        code = 0.0
        c0 = glyph_name[0]
        if c0 == "G":
            if len(glyph_name) == 3:
                code = _js_parse_int_hex(glyph_name[1:])
        elif c0 == "g":
            if len(glyph_name) == 5:
                code = _js_parse_int_hex(glyph_name[1:])
        elif c0 in "Cc":
            if 3 <= len(glyph_name) <= 4:
                code_str = glyph_name[1:]
                if force_glyphs:
                    code = _js_parse_int_hex(code_str)
                else:
                    code = _js_plus(code_str)
                    if math.isnan(code) and not math.isnan(
                        _js_parse_int_hex(code_str)
                    ):
                        # a Cxx name that is hex-but-not-decimal: redo the
                        # WHOLE font with hex parsing (pdf.worker.js:37287)
                        return simple_font_to_unicode(
                            names, base_encoding_name, force_glyphs=True
                        )
        elif c0 == "u":
            gu = _unicode_for_glyph(glyph_name)
            if gu != -1:
                code = float(gu)
        else:
            if glyph_name in ("f_h", "f_t", "T_h"):
                out[charcode] = glyph_name.replace("_", "")
                continue
        if (
            not math.isnan(code)
            and 0 < code <= 0x10FFFF
            and float(code).is_integer()
        ):
            icode = int(code)
            if base_encoding_name is not None and icode == charcode:
                base = encoding_names(base_encoding_name)
                gn = base[charcode]
                if gn:
                    # fromCharCode(glyphsUnicodeMap[gn]); undefined → NaN →
                    # fromCharCode(NaN) === '\\x00' (pdf.worker.js:37311)
                    bu = AGL.get(gn)
                    out[charcode] = bu if bu is not None else "\x00"
                    continue
            out[charcode] = chr(icode)
    return out
