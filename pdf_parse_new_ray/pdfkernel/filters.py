"""Stream filter decoders (PDF 1.7 §7.4).

Parity targets in the reference: FlateStream (build/pdf.worker.js:8610),
LZWStream (:12961), PredictorStream (:13086), RunLengthStream (:13271),
Ascii85Stream (:7923), AsciiHexStream (:7989).  Re-implemented from the
public PDF spec; Flate uses zlib with the same lenient truncated-stream
fallback pdf.js applies.
"""

from __future__ import annotations

import zlib
from typing import Any, Optional

from .cos import Name, PDFError, Ref


def _resolve(obj: Any, resolve) -> Any:
    while isinstance(obj, Ref):
        if resolve is None:
            raise PDFError("indirect object in filter params but no resolver")
        obj = resolve(obj)
    return obj


def flate_decode(data: bytes) -> bytes:
    try:
        return zlib.decompress(data)
    except zlib.error:
        # lenient: decompress as much as possible (pdf.js FlateStream keeps
        # partial output on truncated/corrupt deflate data)
        d = zlib.decompressobj()
        try:
            return d.decompress(data)
        except zlib.error:
            # try skipping a bogus first byte (pdf.js checks CMF/FLG)
            for skip in (1, 2):
                try:
                    return zlib.decompressobj().decompress(data[skip:])
                except zlib.error:
                    continue
            # raw deflate without zlib header
            try:
                return zlib.decompressobj(-15).decompress(data)
            except zlib.error as e:
                raise PDFError(f"FlateDecode failed: {e}") from e


def lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """LZW per PDF spec (TIFF-style, 9→12 bit codes, EarlyChange default 1)."""
    out = bytearray()
    dict_size = 258
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    bit_buf = 0
    bit_len = 0
    code_len = 9
    prev: Optional[bytes] = None
    for byte in data:
        bit_buf = (bit_buf << 8) | byte
        bit_len += 8
        while bit_len >= code_len:
            code = (bit_buf >> (bit_len - code_len)) & ((1 << code_len) - 1)
            bit_len -= code_len
            if code == 256:  # clear table
                table = {i: bytes([i]) for i in range(256)}
                dict_size = 258
                code_len = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == dict_size:
                entry = prev + prev[:1]
            else:
                raise PDFError("LZWDecode: bad code")
            out += entry
            if prev is not None:
                table[dict_size] = prev + entry[:1]
                dict_size += 1
            prev = entry
            # width bump one entry early (pdf.js LZWStream rule:
            # dictLength + earlyChange == 1 << codeLength)
            if code_len < 12 and dict_size + early_change >= (1 << code_len):
                code_len += 1
    return bytes(out)


def ascii_hex_decode(data: bytes) -> bytes:
    digits = []
    for b in data:
        c = chr(b)
        if c in "0123456789abcdefABCDEF":
            digits.append(c)
        elif c == ">":
            break
    if len(digits) % 2:
        digits.append("0")
    return bytes.fromhex("".join(digits))


def ascii85_decode(data: bytes) -> bytes:
    out = bytearray()
    group: list[int] = []
    i = 0
    n = len(data)
    # strip optional <~ prefix
    if data[:2] == b"<~":
        i = 2
    while i < n:
        c = data[i]
        i += 1
        if c in b" \t\r\n\x0c\x00":
            continue
        if c == 0x7E:  # '~' EOD
            break
        if c == 0x7A and not group:  # 'z' = four zero bytes
            out += b"\x00\x00\x00\x00"
            continue
        if not (0x21 <= c <= 0x75):
            raise PDFError("Ascii85Decode: bad char")
        group.append(c - 0x21)
        if len(group) == 5:
            val = 0
            for g in group:
                val = val * 85 + g
            out += val.to_bytes(4, "big")
            group = []
    if group:
        k = len(group)
        group += [84] * (5 - k)
        val = 0
        for g in group:
            val = val * 85 + g
        out += val.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def run_length_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        l = data[i]
        i += 1
        if l == 128:
            break
        if l < 128:
            out += data[i : i + l + 1]
            i += l + 1
        else:
            if i < n:
                out += bytes([data[i]]) * (257 - l)
                i += 1
    return bytes(out)


def apply_predictor(data: bytes, params: dict, resolve=None) -> bytes:
    predictor = _resolve(params.get("Predictor", 1), resolve)
    if predictor <= 1:
        return data
    colors = _resolve(params.get("Colors", 1), resolve)
    bpc = _resolve(params.get("BitsPerComponent", 8), resolve)
    columns = _resolve(params.get("Columns", 1), resolve)
    bpp = max(1, (colors * bpc) >> 3)  # bytes per pixel
    row_len = (columns * colors * bpc + 7) >> 3
    if predictor == 2:  # TIFF
        if bpc != 8:
            raise PDFError("TIFF predictor: only 8 bpc supported")
        out = bytearray(data)
        for r in range(0, len(out), row_len):
            for i in range(r + bpp, min(r + row_len, len(out))):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    # PNG predictors: each row prefixed by a filter-type byte
    out = bytearray()
    prev_row = bytearray(row_len)
    i = 0
    n = len(data)
    while i + 1 <= n:
        ft = data[i]
        i += 1
        row = bytearray(data[i : i + row_len])
        if len(row) < row_len:
            row += bytes(row_len - len(row))
        i += row_len
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for j in range(bpp, row_len):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(row_len):
                row[j] = (row[j] + prev_row[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(row_len):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev_row[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(row_len):
                a = row[j - bpp] if j >= bpp else 0
                b = prev_row[j]
                c = prev_row[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pr) & 0xFF
        else:
            raise PDFError(f"PNG predictor: bad filter type {ft}")
        out += row
        prev_row = row
        if i >= n:
            break
    return bytes(out)


_FILTER_ALIASES = {
    "FlateDecode": "FlateDecode",
    "Fl": "FlateDecode",
    "LZWDecode": "LZWDecode",
    "LZW": "LZWDecode",
    "ASCIIHexDecode": "ASCIIHexDecode",
    "AHx": "ASCIIHexDecode",
    "ASCII85Decode": "ASCII85Decode",
    "A85": "ASCII85Decode",
    "RunLengthDecode": "RunLengthDecode",
    "RL": "RunLengthDecode",
    "Crypt": "Crypt",
}

# image filters: the text extractor never decodes them; pass raw through so
# XObject dict inspection still works (reference skips non-Form XObjects,
# build/pdf.worker.js:36980-36984)
_IMAGE_FILTERS = {"DCTDecode", "DCT", "JPXDecode", "CCITTFaxDecode", "CCF", "JBIG2Decode"}


def decode_stream(sdict: dict, raw: bytes, resolve=None) -> bytes:
    filters = _resolve(sdict.get("Filter"), resolve)
    if filters is None:
        return raw
    if isinstance(filters, (Name, str)):
        filters = [filters]
    params = _resolve(sdict.get("DecodeParms", sdict.get("DP")), resolve)
    if not isinstance(params, list):
        params = [params] * len(filters)
    data = raw
    for f, p in zip(filters, params):
        fname = _FILTER_ALIASES.get(str(_resolve(f, resolve)))
        p = _resolve(p, resolve) or {}
        if fname is None:
            if str(f) in _IMAGE_FILTERS:
                return data  # leave encoded; caller treats as opaque image
            raise PDFError(f"unknown filter {f}")
        if fname == "FlateDecode":
            data = flate_decode(data)
        elif fname == "LZWDecode":
            data = lzw_decode(data, _resolve(p.get("EarlyChange", 1), resolve))
        elif fname == "ASCIIHexDecode":
            data = ascii_hex_decode(data)
        elif fname == "ASCII85Decode":
            data = ascii85_decode(data)
        elif fname == "RunLengthDecode":
            data = run_length_decode(data)
        elif fname == "Crypt":
            # decryption (or Identity pass-through) already happened before
            # the filter chain via StreamObj.crypt, armed by the security
            # handler per this stream's /Crypt DecodeParms — a no-op here
            pass
        if fname in ("FlateDecode", "LZWDecode") and p:
            data = apply_predictor(data, p, resolve)
    return data
