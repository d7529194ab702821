"""Character encodings + glyph-name→Unicode mapping (PDF 1.7 Annex D,
Adobe Glyph List).  Parity target: pdf.js encoding tables and
`getGlyphsUnicode` — we reproduce the code→unicode outcome, not the tables'
representation.

WinAnsi == cp1252 (with NBSP tweaks), MacRoman == Python's mac_roman codec;
StandardEncoding is given as a sparse override of latin-1.
"""

from __future__ import annotations

from functools import lru_cache

# StandardEncoding positions that differ from latin-1 (code -> unicode char).
_STANDARD_OVERRIDES = {
    0x27: "’",  # quoteright
    0x60: "‘",  # quoteleft
    0xA1: "¡", 0xA2: "¢", 0xA3: "£", 0xA4: "⁄",
    0xA5: "¥", 0xA6: "ƒ", 0xA7: "§", 0xA8: "¤",
    0xA9: "'", 0xAA: "“", 0xAB: "«", 0xAC: "‹",
    0xAD: "›", 0xAE: "ﬁ", 0xAF: "ﬂ",
    0xB1: "–", 0xB2: "†", 0xB3: "‡", 0xB4: "·",
    0xB6: "¶", 0xB7: "•", 0xB8: "‚", 0xB9: "„",
    0xBA: "”", 0xBB: "»", 0xBC: "…", 0xBD: "‰",
    0xBF: "¿", 0xC1: "`", 0xC2: "´", 0xC3: "ˆ",
    0xC4: "˜", 0xC5: "¯", 0xC6: "˘", 0xC7: "˙",
    0xC8: "¨", 0xCA: "˚", 0xCB: "¸", 0xCD: "˝",
    0xCE: "˛", 0xCF: "ˇ", 0xD0: "—", 0xE1: "Æ",
    0xE3: "ª", 0xE8: "Ł", 0xE9: "Ø", 0xEA: "Œ",
    0xEB: "º", 0xF1: "æ", 0xF5: "ı", 0xF8: "ł",
    0xF9: "ø", 0xFA: "œ", 0xFB: "ß",
}


@lru_cache(maxsize=8)
def encoding_table(name: str) -> tuple:
    """256-entry tuple code→unicode str ('' when unmapped)."""
    table = [""] * 256
    if name == "WinAnsiEncoding":
        for c in range(256):
            try:
                table[c] = bytes([c]).decode("cp1252")
            except UnicodeDecodeError:
                table[c] = ""
        table[0xA0] = " "  # pdf.js maps nbsp-ish to space via 'space' glyph at 0xa0? keep nbsp
        table[0xA0] = " "
        table[0xAD] = "­"
    elif name == "MacRomanEncoding":
        for c in range(256):
            try:
                table[c] = bytes([c]).decode("mac_roman")
            except UnicodeDecodeError:
                table[c] = ""
    elif name == "MacExpertEncoding":
        # rarely used; approximate with latin-1 printables
        for c in range(0x20, 0x7F):
            table[c] = chr(c)
    else:  # StandardEncoding / default
        for c in range(0x20, 0x7F):
            table[c] = chr(c)
        for c, u in _STANDARD_OVERRIDES.items():
            table[c] = u
    # control range: unmapped
    for c in range(0x00, 0x20):
        table[c] = ""
    for c in (0x09, 0x0A, 0x0D):
        table[c] = ""
    table[0x20] = " "
    return tuple(table)


# Compact Adobe-Glyph-List subset: the names that occur in practice in
# /Differences arrays and Type1 embedded encodings.  uniXXXX / uXXXX are
# handled programmatically.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "dagger": "†", "daggerdbl": "‡",
    "perthousand": "‰", "guilsinglleft": "‹", "guilsinglright": "›",
    "guillemotleft": "«", "guillemotright": "»",
    "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ", "ffl": "ﬄ",
    "florin": "ƒ", "fraction": "⁄", "minus": "−",
    "exclamdown": "¡", "questiondown": "¿", "cent": "¢",
    "sterling": "£", "yen": "¥", "currency": "¤",
    "section": "§", "paragraph": "¶", "periodcentered": "·",
    "copyright": "©", "registered": "®", "trademark": "™",
    "degree": "°", "plusminus": "±", "multiply": "×",
    "divide": "÷", "onehalf": "½", "onequarter": "¼",
    "threequarters": "¾", "onesuperior": "¹", "twosuperior": "²",
    "threesuperior": "³", "ordfeminine": "ª", "ordmasculine": "º",
    "brokenbar": "¦", "logicalnot": "¬", "mu": "µ",
    "micro": "µ", "cedilla": "¸", "acute": "´",
    "dieresis": "¨", "macron": "¯", "circumflex": "ˆ",
    "caron": "ˇ", "breve": "˘", "dotaccent": "˙",
    "ring": "˚", "ogonek": "˛", "tilde": "˜",
    "hungarumlaut": "˝", "softhyphen": "­", "sfthyphen": "­",
    "nbspace": " ", "Euro": "€", "euro": "€",
    "dotlessi": "ı", "Lslash": "Ł", "lslash": "ł",
    "OE": "Œ", "oe": "œ", "Scaron": "Š", "scaron": "š",
    "Zcaron": "Ž", "zcaron": "ž", "Ydieresis": "Ÿ",
    "AE": "Æ", "ae": "æ", "Oslash": "Ø", "oslash": "ø",
    "Thorn": "Þ", "thorn": "þ", "Eth": "Ð", "eth": "ð",
    "germandbls": "ß", "longs": "ſ", "apple": "",
    # greek (math-ish usage in academic PDFs)
    "alpha": "α", "beta": "β", "gamma": "γ", "delta": "δ",
    "epsilon": "ε", "lambda": "λ", "sigma": "σ", "pi": "π",
    "theta": "θ", "omega": "ω", "phi": "φ", "tau": "τ",
    "rho": "ρ", "eta": "η", "nu": "ν", "kappa": "κ",
    "chi": "χ", "psi": "ψ", "iota": "ι", "zeta": "ζ",
    "xi": "ξ", "omicron": "ο", "upsilon": "υ", "sigma1": "ς",
    "Gamma": "Γ", "Delta": "Δ", "Theta": "Θ", "Lambda": "Λ",
    "Xi": "Ξ", "Pi": "Π", "Sigma": "Σ", "Upsilon": "Υ",
    "Phi": "Φ", "Psi": "Ψ", "Omega": "Ω",
    # Computer Modern / math glyph names (CMSY, CMMI, CMEX)
    "asteriskmath": "∗", "circlecopyrt": "©", "copyrightsans": "©",
    "copyrightserif": "©", "periodcentered": "·", "dotmath": "⋅",
    "circlemultiply": "⊗", "circleplus": "⊕", "circledot": "⊙",
    "openbullet": "◦", "circle": "○", "angbracketleft": "〈",
    "angbracketright": "〉", "bardbl": "∥", "braceleftbig": "{",
    "bracerightbig": "}", "bracketleftbig": "[", "bracketrightbig": "]",
    "parenleftbig": "(", "parenrightbig": ")", "slashbig": "/",
    "backslashbig": "\\", "vextendsingle": "⏐", "vextenddouble": "∥",
    "tildewide": "˜", "hatwide": "ˆ", "similar": "∼",
    "asymptoticallyequal": "≃", "equivalence": "≡", "propersubset": "⊂",
    "propersuperset": "⊃", "reflexsubset": "⊆", "reflexsuperset": "⊇",
    "union": "∪", "intersection": "∩", "logicaland": "∧",
    "logicalor": "∨", "negationslash": "̸", "emptyset": "∅",
    "universal": "∀", "existential": "∃", "turnstileleft": "⊢",
    "perpendicular": "⊥", "nabla": "∇", "prime": "′",
    "lessmuch": "≪", "greatermuch": "≫", "precedes": "≺",
    "follows": "≻", "proportional": "∝", "angle": "∠",
    "triangle": "△", "diamondmath": "⋄", "star": "⋆",
    "dagger.1": "†", "vector": "⃗", "tie": "⁀",
    "epsilon1": "ϵ", "theta1": "ϑ", "phi1": "ϕ", "rho1": "ϱ",
    "pi1": "ϖ", "omega1": "ϖ", "weierstrass": "℘",
    "aleph": "ℵ", "Ifraktur": "ℑ", "Rfraktur": "ℜ",
    "infinity": "∞", "partialdiff": "∂", "summation": "∑",
    "product": "∏", "integral": "∫", "radical": "√",
    "approxequal": "≈", "notequal": "≠", "lessequal": "≤",
    "greaterequal": "≥", "arrowright": "→", "arrowleft": "←",
    "arrowup": "↑", "arrowdown": "↓", "lozenge": "◊",
}

# single accented latin letters: generate Xacute/Xgrave/... programmatically
_ACCENTS = {
    "acute": "́", "grave": "̀", "circumflex": "̂",
    "tilde": "̃", "dieresis": "̈", "ring": "̊",
    "cedilla": "̧", "macron": "̄", "breve": "̆",
    "caron": "̌", "hungarumlaut": "̋", "ogonek": "̨",
    "dotaccent": "̇",
}


@lru_cache(maxsize=4096)
def glyph_name_to_unicode(name: str) -> str:
    if not name:
        return ""
    if name in _AGL:
        return _AGL[name]
    if len(name) == 1:
        return name
    if name.startswith("uni") and len(name) >= 7:
        try:
            chars = [chr(int(name[i : i + 4], 16)) for i in range(3, len(name) - 3 + 1, 4) if len(name[i : i + 4]) == 4]
            if chars:
                return "".join(chars)
        except ValueError:
            pass
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except (ValueError, OverflowError):
            pass
    # accented composites, e.g. 'eacute'
    import unicodedata

    for acc, comb in _ACCENTS.items():
        if name.endswith(acc) and len(name) > len(acc):
            base = name[: -len(acc)]
            if len(base) == 1 and base.isalpha():
                return unicodedata.normalize("NFC", base + comb)
    # gNN / cidNN / index names: no unicode — pdf.js falls back to the
    # charcode; we return '' and let the caller decide
    return ""


# Symbolic std-14 fonts (Symbol, ZapfDingbats) get a minimal map so common
# bullets survive; full tables are out of scope for text parity.
SYMBOL_MAP = {0xB7: "•", 0xA0: "€", 0x20: " "}
