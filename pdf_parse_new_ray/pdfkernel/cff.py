"""CFF (Compact Font Format) reader — just enough to recover the builtin
encoding of an embedded FontFile3 (Type1C) program: INDEX structures, Top
DICT, Charset, Encoding, and the standard strings.

Reference parity target: ``CFFParser`` (lib/pdf.js/v4.5.136/build/
pdf.worker.js:15098) feeding ``properties.builtInEncoding``
(CFFFont._createBuiltInEncoding, :22110-22132), which the evaluator's
adjustType1ToUnicode turns into text-extraction unicode for fonts with no
/ToUnicode and no usable /Encoding.  Charstrings are never interpreted —
text extraction needs names, not outlines.

Standard strings are the 391 constants of the public CFF specification
(Adobe TN #5176, Appendix A).
"""

from __future__ import annotations

from typing import Optional

CFF_STANDARD_STRINGS = (
    ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
    "percent", "ampersand", "quoteright", "parenleft", "parenright",
    "asterisk", "plus", "comma", "hyphen", "period", "slash", "zero",
    "one", "two", "three", "four", "five", "six", "seven", "eight", "nine",
    "colon", "semicolon", "less", "equal", "greater", "question", "at",
    "A", "B", "C", "D", "E", "F", "G", "H", "I", "J", "K", "L", "M", "N",
    "O", "P", "Q", "R", "S", "T", "U", "V", "W", "X", "Y", "Z",
    "bracketleft", "backslash", "bracketright", "asciicircum",
    "underscore", "quoteleft", "a", "b", "c", "d", "e", "f", "g", "h", "i",
    "j", "k", "l", "m", "n", "o", "p", "q", "r", "s", "t", "u", "v", "w",
    "x", "y", "z", "braceleft", "bar", "braceright", "asciitilde",
    "exclamdown", "cent", "sterling", "fraction", "yen", "florin",
    "section", "currency", "quotesingle", "quotedblleft", "guillemotleft",
    "guilsinglleft", "guilsinglright", "fi", "fl", "endash", "dagger",
    "daggerdbl", "periodcentered", "paragraph", "bullet", "quotesinglbase",
    "quotedblbase", "quotedblright", "guillemotright", "ellipsis",
    "perthousand", "questiondown", "grave", "acute", "circumflex", "tilde",
    "macron", "breve", "dotaccent", "dieresis", "ring", "cedilla",
    "hungarumlaut", "ogonek", "caron", "emdash", "AE", "ordfeminine",
    "Lslash", "Oslash", "OE", "ordmasculine", "ae", "dotlessi", "lslash",
    "oslash", "oe", "germandbls", "onesuperior", "logicalnot", "mu",
    "trademark", "Eth", "onehalf", "plusminus", "Thorn", "onequarter",
    "divide", "brokenbar", "degree", "thorn", "threequarters",
    "twosuperior", "registered", "minus", "eth", "multiply",
    "threesuperior", "copyright", "Aacute", "Acircumflex", "Adieresis",
    "Agrave", "Aring", "Atilde", "Ccedilla", "Eacute", "Ecircumflex",
    "Edieresis", "Egrave", "Iacute", "Icircumflex", "Idieresis", "Igrave",
    "Ntilde", "Oacute", "Ocircumflex", "Odieresis", "Ograve", "Otilde",
    "Scaron", "Uacute", "Ucircumflex", "Udieresis", "Ugrave", "Yacute",
    "Ydieresis", "Zcaron", "aacute", "acircumflex", "adieresis", "agrave",
    "aring", "atilde", "ccedilla", "eacute", "ecircumflex", "edieresis",
    "egrave", "iacute", "icircumflex", "idieresis", "igrave", "ntilde",
    "oacute", "ocircumflex", "odieresis", "ograve", "otilde", "scaron",
    "uacute", "ucircumflex", "udieresis", "ugrave", "yacute", "ydieresis",
    "zcaron", "exclamsmall", "Hungarumlautsmall", "dollaroldstyle",
    "dollarsuperior", "ampersandsmall", "Acutesmall", "parenleftsuperior",
    "parenrightsuperior", "twodotenleader", "onedotenleader",
    "zerooldstyle", "oneoldstyle", "twooldstyle", "threeoldstyle",
    "fouroldstyle", "fiveoldstyle", "sixoldstyle", "sevenoldstyle",
    "eightoldstyle", "nineoldstyle", "commasuperior",
    "threequartersemdash", "periodsuperior", "questionsmall", "asuperior",
    "bsuperior", "centsuperior", "dsuperior", "esuperior", "isuperior",
    "lsuperior", "msuperior", "nsuperior", "osuperior", "rsuperior",
    "ssuperior", "tsuperior", "ff", "ffi", "ffl", "parenleftinferior",
    "parenrightinferior", "Circumflexsmall", "hyphensuperior",
    "Gravesmall", "Asmall", "Bsmall", "Csmall", "Dsmall", "Esmall",
    "Fsmall", "Gsmall", "Hsmall", "Ismall", "Jsmall", "Ksmall", "Lsmall",
    "Msmall", "Nsmall", "Osmall", "Psmall", "Qsmall", "Rsmall", "Ssmall",
    "Tsmall", "Usmall", "Vsmall", "Wsmall", "Xsmall", "Ysmall", "Zsmall",
    "colonmonetary", "onefitted", "rupiah", "Tildesmall",
    "exclamdownsmall", "centoldstyle", "Lslashsmall", "Scaronsmall",
    "Zcaronsmall", "Dieresissmall", "Brevesmall", "Caronsmall",
    "Dotaccentsmall", "Macronsmall", "figuredash", "hypheninferior",
    "Ogoneksmall", "Ringsmall", "Cedillasmall", "questiondownsmall",
    "oneeighth", "threeeighths", "fiveeighths", "seveneighths", "onethird",
    "twothirds", "zerosuperior", "foursuperior", "fivesuperior",
    "sixsuperior", "sevensuperior", "eightsuperior", "ninesuperior",
    "zeroinferior", "oneinferior", "twoinferior", "threeinferior",
    "fourinferior", "fiveinferior", "sixinferior", "seveninferior",
    "eightinferior", "nineinferior", "centinferior", "dollarinferior",
    "periodinferior", "commainferior", "Agravesmall", "Aacutesmall",
    "Acircumflexsmall", "Atildesmall", "Adieresissmall", "Aringsmall",
    "AEsmall", "Ccedillasmall", "Egravesmall", "Eacutesmall",
    "Ecircumflexsmall", "Edieresissmall", "Igravesmall", "Iacutesmall",
    "Icircumflexsmall", "Idieresissmall", "Ethsmall", "Ntildesmall",
    "Ogravesmall", "Oacutesmall", "Ocircumflexsmall", "Otildesmall",
    "Odieresissmall", "OEsmall", "Oslashsmall", "Ugravesmall",
    "Uacutesmall", "Ucircumflexsmall", "Udieresissmall", "Yacutesmall",
    "Thornsmall", "Ydieresissmall", "001.000", "001.001", "001.002",
    "001.003", "Black", "Bold", "Book", "Light", "Medium", "Regular",
    "Roman", "Semibold"
)


class CFFError(Exception):
    pass


def _read_index(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """CFF INDEX at pos → (entries, end_pos)."""
    if pos + 2 > len(data):
        raise CFFError("truncated INDEX")
    count = int.from_bytes(data[pos:pos + 2], "big")
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    if not 1 <= off_size <= 4:
        raise CFFError(f"bad offSize {off_size}")
    offs = []
    for i in range(count + 1):
        offs.append(int.from_bytes(data[pos:pos + off_size], "big"))
        pos += off_size
    base = pos - 1
    entries = [data[base + offs[i]: base + offs[i + 1]] for i in range(count)]
    return entries, base + offs[count]


def _parse_dict(data: bytes) -> dict[int, list]:
    """DICT data → {op: operands} (op 12 xx stored as 1200+xx)."""
    out: dict[int, list] = {}
    operands: list = []
    i = 0
    n = len(data)
    while i < n:
        b0 = data[i]
        if b0 <= 21:  # operator
            if b0 == 12:
                i += 1
                op = 1200 + data[i]
            else:
                op = b0
            out[op] = operands
            operands = []
            i += 1
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        elif b0 == 28:
            operands.append(int.from_bytes(data[i + 1:i + 3], "big", signed=True))
            i += 3
        elif b0 == 29:
            operands.append(int.from_bytes(data[i + 1:i + 5], "big", signed=True))
            i += 5
        elif b0 == 30:  # real number (BCD) — value unused here, skip
            i += 1
            while i < n:
                nib = data[i]
                i += 1
                if (nib & 0x0F) == 0x0F or (nib >> 4) == 0x0F:
                    break
            operands.append(0.0)
        else:
            raise CFFError(f"bad DICT byte {b0}")
    return out


def cff_builtin_encoding(data: bytes) -> Optional[dict[int, str]]:
    """code → glyph name from a CFF font's Charset + custom Encoding,
    or None (predefined/CID encodings, malformed data)."""
    if len(data) < 4:
        return None
    hdr_size = data[2]
    pos = hdr_size
    _names, pos = _read_index(data, pos)
    top_dicts, pos = _read_index(data, pos)
    strings, pos = _read_index(data, pos)
    if not top_dicts:
        return None
    top = _parse_dict(top_dicts[0])
    if 1230 in top:  # ROS → CIDFont: no encoding
        return None
    cs_off = top.get(15, [0])[0]
    enc_off = top.get(16, [0])[0]
    ch_off = top.get(17, [None])[0]
    if ch_off is None:
        return None
    charstrings, _ = _read_index(data, int(ch_off))
    n_glyphs = len(charstrings)
    if n_glyphs == 0:
        return None

    def sid_name(sid: int) -> str:
        if sid < len(CFF_STANDARD_STRINGS):
            return CFF_STANDARD_STRINGS[sid]
        k = sid - len(CFF_STANDARD_STRINGS)
        return strings[k].decode("latin-1") if k < len(strings) else ""

    # charset → gid → name
    names = [".notdef"] * n_glyphs
    cs_off = int(cs_off)
    if cs_off in (0, 1, 2):
        # predefined (ISOAdobe/Expert/ExpertSubset): SID == GID suffices for
        # ISOAdobe; Expert charsets are irrelevant for text recovery
        for gid in range(1, n_glyphs):
            names[gid] = sid_name(gid)
    else:
        p = cs_off
        fmt = data[p]
        p += 1
        if fmt == 0:
            for gid in range(1, n_glyphs):
                names[gid] = sid_name(int.from_bytes(data[p:p + 2], "big"))
                p += 2
        elif fmt in (1, 2):
            gid = 1
            step = 1 if fmt == 1 else 2
            while gid < n_glyphs:
                first = int.from_bytes(data[p:p + 2], "big")
                p += 2
                n_left = int.from_bytes(data[p:p + step], "big")
                p += step
                for d in range(n_left + 1):
                    if gid >= n_glyphs:
                        break
                    names[gid] = sid_name(first + d)
                    gid += 1
        else:
            return None

    # encoding → code → gid (custom formats only; predefined 0/1 carry no
    # font-specific information worth recovering)
    enc_off = int(enc_off)
    if enc_off in (0, 1):
        return None
    p = enc_off
    fmt = data[p]
    p += 1
    out: dict[int, str] = {}
    if (fmt & 0x7F) == 0:
        n_codes = data[p]
        p += 1
        for gid in range(1, n_codes + 1):
            code = data[p]
            p += 1
            if gid < n_glyphs:
                out[code] = names[gid]
    elif (fmt & 0x7F) == 1:
        n_ranges = data[p]
        p += 1
        gid = 1
        for _ in range(n_ranges):
            first = data[p]
            n_left = data[p + 1]
            p += 2
            for code in range(first, first + n_left + 1):
                if gid < n_glyphs:
                    out[code] = names[gid]
                gid += 1
    else:
        return None
    if fmt & 0x80:  # supplements: code → SID directly
        n_sup = data[p]
        p += 1
        for _ in range(n_sup):
            code = data[p]
            sid = int.from_bytes(data[p + 1:p + 3], "big")
            p += 3
            out[code] = sid_name(sid)
    return out or None
