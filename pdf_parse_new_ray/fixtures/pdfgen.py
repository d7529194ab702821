"""Deterministic synthetic PDF generator (FIXTURES.md §F3).

Builds byte-deterministic PDFs from a seed, each exercising one reference
behavior (SURVEY.md §2 M-ops).  The generator knows exactly which glyphs and
positions it writes, so it also emits ground-truth expected text — the
conformance oracle for the kernel and the Ray pipeline.

No code from the reference; PDF syntax per ISO 32000-1.
"""

from __future__ import annotations

import random
import re
import zlib
from typing import Optional


def lzw_encode(data: bytes) -> bytes:
    """Minimal LZW encoder (PDF-compatible, EarlyChange=1)."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    code_len = 9
    out = bytearray()
    bit_buf = 0
    bit_len = 0

    def emit(code: int) -> None:
        nonlocal bit_buf, bit_len
        bit_buf = (bit_buf << code_len) | code
        bit_len += code_len
        while bit_len >= 8:
            out.append((bit_buf >> (bit_len - 8)) & 0xFF)
            bit_len -= 8

    emit(256)  # clear table
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
        else:
            emit(table[w])
            table[wc] = next_code
            next_code += 1
            # EarlyChange sync: the decoder's dict lags ours by one entry and
            # widens at dict+1 == 1<<len, so we widen when next_code hits
            # 1<<len — one table slot before we'd mathematically need to
            if code_len < 12 and next_code >= (1 << code_len):
                code_len += 1
            if next_code >= 4094:
                emit(256)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                code_len = 9
            w = bytes([byte])
    if w:
        emit(table[w])
    emit(257)  # EOD
    if bit_len:
        out.append((bit_buf << (8 - bit_len)) & 0xFF)
    return bytes(out)


class PDFBuilder:
    """Assembles a classic-xref (or xref-stream) PDF from object bodies."""

    def __init__(self, version: str = "1.4", header_garbage: bytes = b""):
        self.version = version
        self.header_garbage = header_garbage
        self.objects: list[bytes] = []  # 1-based object bodies (without N 0 obj wrapper)
        self.encryptor: Optional["PDFEncryptor"] = None  # set → streams encrypted

    def add(self, body: bytes) -> int:
        self.objects.append(body)
        return len(self.objects)

    def add_stream(self, dict_extra: bytes, data: bytes, filt: Optional[str]) -> int:
        if filt == "flate":
            enc = zlib.compress(data)
            fspec = b"/Filter /FlateDecode "
        elif filt == "lzw":
            enc = lzw_encode(data)
            fspec = b"/Filter /LZWDecode "
        elif filt == "ahx":
            enc = data.hex().encode() + b">"
            fspec = b"/Filter /ASCIIHexDecode "
        else:
            enc = data
            fspec = b""
        if self.encryptor is not None:
            # encryption applies AFTER filters on write (readers decrypt
            # before decoding); object number is the next add() slot
            enc = self.encryptor.encrypt_stream(len(self.objects) + 1, 0, enc)
        body = b"<< " + fspec + dict_extra + b"/Length " + str(len(enc)).encode() + b" >>\nstream\n" + enc + b"\nendstream"
        return self.add(body)

    def build(self, root_num: int, info_num: Optional[int] = None,
              use_xref_stream: bool = False, truncate_at: Optional[int] = None) -> bytes:
        # the /Encrypt dictionary is itself an (unencrypted) indirect object
        enc_extra = b""
        if self.encryptor is not None:
            enc_num = self.add(self.encryptor.encrypt_dict_body())
            idhex = self.encryptor.id0.hex().encode()
            enc_extra = (f"/Encrypt {enc_num} 0 R ".encode()
                         + b"/ID [<" + idhex + b"> <" + idhex + b">] ")
        out = bytearray()
        out += b"%PDF-" + self.version.encode() + b"\n"
        if self.header_garbage:
            out += self.header_garbage
        offsets = [0]
        for i, body in enumerate(self.objects, 1):
            offsets.append(len(out))
            out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_pos = len(out)
        n = len(self.objects) + 1
        if not use_xref_stream:
            out += b"xref\n"
            out += f"0 {n}\n".encode()
            out += b"0000000000 65535 f \n"
            for off in offsets[1:]:
                out += f"{off:010d} 00000 n \n".encode()
            trailer = f"trailer\n<< /Size {n} /Root {root_num} 0 R ".encode()
            if info_num:
                trailer += f"/Info {info_num} 0 R ".encode()
            trailer += enc_extra
            trailer += b">>\n"
            out += trailer
        else:
            # xref stream object (W = [1 4 2]); the xref stream itself is
            # never encrypted (ISO 32000-1 §7.5.8.2)
            rows = bytearray()
            rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
            for off in offsets[1:]:
                rows += bytes([1]) + off.to_bytes(4, "big") + (0).to_bytes(2, "big")
            # the xref stream itself is one more object
            xnum = n
            rows += bytes([1]) + xref_pos.to_bytes(4, "big") + (0).to_bytes(2, "big")
            data = zlib.compress(bytes(rows))
            extra = (f"/Type /XRef /Size {n + 1} /W [1 4 2] /Index [0 {n + 1}] "
                     f"/Root {root_num} 0 R " + (f"/Info {info_num} 0 R " if info_num else "")).encode()
            extra += enc_extra
            body = extra + b"/Filter /FlateDecode /Length " + str(len(data)).encode() + b" >>\nstream\n" + data + b"\nendstream"
            out += f"{xnum} 0 obj\n<< ".encode() + body + b"\nendobj\n"
        out += b"startxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
        result = bytes(out)
        if truncate_at is not None:
            result = result[:truncate_at]
        return result


def _escape_pdf_text(s: str) -> bytes:
    """Encode text as a WinAnsi literal string."""
    b = s.encode("cp1252", "replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def make_text_pdf(
    pages: list[list[str]],
    filt: Optional[str] = "flate",
    font_size: float = 12.0,
    leading: float = 16.0,
    use_xref_stream: bool = False,
    version: str = "1.4",
    title: str = "synthetic",
    producer: str = "pdfgen",
    encrypt: Optional[str] = None,
    encrypt_seed: int = 0,
) -> tuple[bytes, str]:
    """A multi-page text PDF: each line positioned by its own Tm, Y steps of
    ``leading`` (> Y_TOLERANCE and > fake-space windows, so expected text is
    exactly lines joined with '\\n').  Returns (pdf_bytes, expected_doc_text)
    where expected_doc_text matches the reference sequential join (leading
    '\\n\\n' + pages joined by '\\n\\n')."""
    b = PDFBuilder(version=version)
    if encrypt:
        # empty-user-password encryption: extracted text is identical,
        # decryption is transparent (kernel crypto.SecurityHandler)
        b.encryptor = PDFEncryptor(encrypt, seed=20260817 + encrypt_seed)
    font_num = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    # wrap lines that would overflow the 612pt page (glyphs past the
    # viewBox edge are CLIPPED by the extractor, pdf.worker.js:36530-36536,
    # which would silently truncate the expected text otherwise)
    max_w = (612.0 - 72.0 - 10.0) * 1000.0 / font_size
    pages = [_wrap_lines(lines, max_w) for lines in pages]
    page_nums = []
    content_nums = []
    for lines in pages:
        ops = [b"BT"]
        y = 720.0
        for line in lines:
            ops.append(b"/F1 " + _fmt(font_size) + b" Tf")
            ops.append(b"1 0 0 1 72 " + _fmt(y) + b" Tm")
            ops.append(b"(" + _escape_pdf_text(line) + b") Tj")
            y -= leading
        ops.append(b"ET")
        content = b"\n".join(ops)
        content_nums.append(b.add_stream(b"", content, filt))
    pages_num_placeholder = len(b.objects) + len(pages) + 1
    for cn in content_nums:
        page_nums.append(b.add(
            f"<< /Type /Page /Parent {pages_num_placeholder} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> /Contents {cn} 0 R >>".encode()
        ))
    kids = b" ".join(f"{p} 0 R".encode() for p in page_nums)
    pages_num = b.add(b"<< /Type /Pages /Kids [" + kids + b"] /Count " + str(len(page_nums)).encode() + b" >>")
    assert pages_num == pages_num_placeholder
    root_num = b.add(f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode())
    if b.encryptor is not None:
        # Info strings are encrypted with the Info object's own number
        inum = len(b.objects) + 1
        et = b.encryptor.encrypt_string(inum, 0, title.encode("cp1252", "replace"))
        ep = b.encryptor.encrypt_string(inum, 0, producer.encode("cp1252", "replace"))
        info_num = b.add(b"<< /Title <" + et.hex().encode() + b"> /Producer <"
                         + ep.hex().encode() + b"> >>")
        assert info_num == inum
    else:
        info_num = b.add(b"<< /Title (" + _escape_pdf_text(title) + b") /Producer (" + _escape_pdf_text(producer) + b") >>")
    pdf = b.build(root_num, info_num, use_xref_stream=use_xref_stream)
    # expected text per the reference's default fold: each line its own Tm with
    # |deltaY| > 1 → '\n' between lines; pages joined (with leading) '\n\n'
    expected = "".join("\n\n" + "\n".join(_expected_line(l) for l in lines) for lines in pages)
    return pdf, expected


def _expected_line(line: str) -> str:
    # cp1252 round-trip (the generator writes WinAnsi bytes); space glyphs
    # are never emitted directly — runs collapse to one separator and
    # leading/trailing spaces vanish (pdf.worker.js twoLastChars ring
    # buffer, :36371-36386 + whitespace skip :36693-36702)
    s = line.encode("cp1252", "replace").decode("cp1252")
    return " ".join(p for p in s.split(" ") if p)


# Helvetica ASCII advances (1/1000 em) for line wrapping — frozen here so
# seeded corpus generation stays byte-stable independent of the kernel's
# width model.
_HELV_ASCII = (278,278,355,556,556,889,667,191,333,333,389,584,278,333,278,278,556,556,556,556,556,556,556,556,556,556,278,278,584,584,584,556,1015,667,667,722,722,667,611,778,722,278,500,667,556,833,722,778,667,778,722,667,611,722,667,944,667,667,611,278,278,278,469,556,333,556,556,500,556,556,278,556,556,222,222,500,222,833,556,556,556,556,333,500,278,556,500,722,500,500,500,334,260,334,584)


def _helv_width(s: str) -> float:
    """Approximate Helvetica advance in 1/1000 em units."""
    return sum(
        _HELV_ASCII[ord(c) - 0x20] if 0x20 <= ord(c) < 0x20 + len(_HELV_ASCII)
        else 556.0
        for c in s
    )


def _wrap_lines(lines: list[str], max_w: float) -> list[str]:
    out = []
    for line in lines:
        if _helv_width(line) <= max_w:
            out.append(line)
            continue
        words = line.split(" ")
        cur = ""
        for w in words:
            cand = (cur + " " + w) if cur else w
            if cur and _helv_width(cand) > max_w:
                out.append(cur)
                cur = w
            else:
                cur = cand
        if cur:
            out.append(cur)
    return out


def _fmt(x: float) -> bytes:
    s = f"{x:.2f}".rstrip("0").rstrip(".")
    return s.encode()


def make_tj_kerning_pdf() -> tuple[bytes, str]:
    """TJ arrays with adjustments inside/outside the fake-space window
    [0.102, 0.6]×fontSize (M12/M13).  fontSize=10: adjustment a (thousandths)
    shifts by -a*10/1000 = -a/100 text units; advance gap g relative to
    fontSize decides: g in [1.02, 6.0] units → fake ' ' appended; g > 6.0 →
    separate whitespace item (str ' ')."""
    fs = 10.0
    # gap = -adj * fs / 1000; choose adj=-300 → gap 3.0 (in window → ' ');
    # adj=-50 → gap 0.5 (tracking: merged, no space); adj=-800 → gap 8.0
    # (beyond window → whitespace item ' ' pushed, still a space in the fold)
    content = (b"BT /F1 10 Tf 1 0 0 1 72 700 Tm "
               b"[(AB) -300 (CD) -50 (EF) -800 (GH)] TJ ET")
    b = PDFBuilder()
    font_num = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 {font_num} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    pdf = b.build(root)
    # expected: 'AB CD' merged? gap 3.0 in window → fake space → 'AB CDEF GH':
    #   -300 → ' '  (in window), -50 → nothing (tracking), -800 → whitespace
    #   item ' ' (same line, no Y change → no '\n' in fold)
    return pdf, "\n\nAB CDEF GH"


def make_ytol_pdf() -> tuple[bytes, str]:
    """Successive lines with Y deltas 0.5 / 1.0 / 1.01 / 13 around
    Y_TOLERANCE=1.0 (lib/pdf-parse.js:20,30).  Each line is its own item via
    font-size alternation (forces flush without moving X)."""
    # Y deltas: fold rule newline iff |dy| > 1.0 (strict)
    ys = [700.0, 699.5, 698.5, 697.49, 684.49]
    # deltas:      0.5    1.0     1.01    13.0
    texts = ["L0", "L1", "L2", "L3", "L4"]
    ops = [b"BT"]
    for i, (y, t) in enumerate(zip(ys, texts)):
        size = b"12" if i % 2 == 0 else b"12.5"  # force item flush via Tf change
        ops.append(b"/F1 " + size + b" Tf")
        ops.append(b"1 0 0 1 72 " + _fmt(y) + b" Tm")
        ops.append(b"(" + t.encode() + b") Tj")
    ops.append(b"ET")
    b = PDFBuilder()
    font_num = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    cn = b.add_stream(b"", b"\n".join(ops), "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 {font_num} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    pdf = b.build(root)
    # fold: L0-L1 dy=0.5 (no nl), L1-L2 dy=1.0 (no nl, strict >), L2-L3
    # dy=1.01 (nl), L3-L4 dy=13 (nl).  Note appendEOL in span assembly also
    # breaks lines but the fold's newline comes from transform Y deltas.
    return pdf, "\n\nL0L1L2\nL3\nL4"


def make_ligature_pdf() -> tuple[bytes, str]:
    """Codes mapped via ToUnicode to ligature chars ﬁ ﬂ ﬀ — normalizeUnicode
    (M14) must fold them to fi/fl/ff in the extracted text."""
    # simple font, codes 0x41('A')→'ﬁ', 0x42→'ﬂ', 0x43→'ﬀ' via ToUnicode
    tou = (b"/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
           b"1 begincodespacerange <00> <FF> endcodespacerange "
           b"3 beginbfchar <41> <FB01> <42> <FB02> <43> <FB00> endbfchar "
           b"endcmap end end")
    b = PDFBuilder()
    tou_num = b.add_stream(b"", tou, "flate")
    font_num = b.add(f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding /ToUnicode {tou_num} 0 R >>".encode())
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (A B C) Tj ET"
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 {font_num} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root), "\n\nfi fl ff"


def make_identity_h_pdf() -> tuple[bytes, str]:
    """Type0 / Identity-H with embedded ToUnicode (M10/M11 multi-byte)."""
    text_codes = [0x0048, 0x0049, 0x004A]  # CIDs
    tou = (b"/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
           b"1 begincodespacerange <0000> <FFFF> endcodespacerange "
           b"1 beginbfrange <0048> <004A> <0057> endbfrange "  # → W X Y
           b"endcmap end end")
    b = PDFBuilder()
    tou_num = b.add_stream(b"", tou, "flate")
    desc_num = b.add(b"<< /Type /FontDescriptor /FontName /Synth /Flags 4 /Ascent 750 /Descent -250 /ItalicAngle 0 /CapHeight 700 /StemV 80 /FontBBox [0 -250 1000 750] >>")
    cid_num = b.add(f"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> /FontDescriptor {desc_num} 0 R /DW 600 >>".encode())
    font_num = b.add(f"<< /Type /Font /Subtype /Type0 /BaseFont /Synth /Encoding /Identity-H /DescendantFonts [{cid_num} 0 R] /ToUnicode {tou_num} 0 R >>".encode())
    hexstr = "".join(f"{c:04X}" for c in text_codes)
    content = f"BT /F1 12 Tf 1 0 0 1 72 700 Tm <{hexstr}> Tj ET".encode()
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 {font_num} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root), "\n\nWXY"


def make_empty_page_pdf() -> tuple[bytes, str]:
    b = PDFBuilder()
    cn = b.add_stream(b"", b"", "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root), "\n\n"


def make_invalid_pdf() -> bytes:
    """Valid header, truncated body — must reject whole-doc (test/03)."""
    pdf, _ = make_text_pdf([["will be truncated"]])
    return pdf[: len(pdf) // 3]


_WORDS = (
    "data trace engine stream batch arrow shuffle actor block spill lineage "
    "extract span media text page glyph font matrix kernel filter decode "
    "partition checkpoint resume skew split merge sort offset order schema"
).split()


def random_lines(rng: random.Random, n_lines: int, min_words: int = 3, max_words: int = 9) -> list[str]:
    return [
        " ".join(rng.choice(_WORDS) for _ in range(rng.randint(min_words, max_words)))
        for _ in range(n_lines)
    ]


def make_seeded_pdf(seed: int, n_pages: Optional[int] = None,
                    filt: Optional[str] = None,
                    use_xref_stream: Optional[bool] = None,
                    encrypt: Optional[str] = None) -> tuple[bytes, str, int]:
    """Deterministic content PDF for corpus generation.  Returns
    (pdf_bytes, expected_text, numpages).  ~8% of seeded docs are
    encrypted (empty user password, rc4-128/aesv2/aesv3 rotation) so the
    distributed pipeline exercises transparent decryption end-to-end."""
    rng = random.Random(seed)
    if n_pages is None:
        n_pages = rng.choice([1, 1, 2, 2, 3, 5, 8])
    if filt is None:
        filt = rng.choice(["flate", "flate", "flate", "lzw", None])
    if use_xref_stream is None:
        use_xref_stream = rng.random() < 0.25
    pages = [random_lines(rng, rng.randint(3, 12)) for _ in range(n_pages)]
    if encrypt is None and rng.random() < 0.08:
        encrypt = rng.choice(["rc4-128", "aesv2", "aesv3"])
    pdf, expected = make_text_pdf(pages, filt=filt, use_xref_stream=use_xref_stream,
                                  title=f"doc-{seed}", producer="pdfgen/0.1",
                                  encrypt=encrypt, encrypt_seed=seed)
    return pdf, expected, n_pages


def make_inline_image_pdf() -> tuple[bytes, str]:
    """Content stream with a BI..ID..EI inline image whose binary payload
    contains text-operator-shaped bytes — the interpreter must skip the
    payload wholesale (reference: makeInlineImage + findDefaultInlineStreamEnd,
    build/pdf.worker.js:13387,13449), never executing 'operators' from it."""
    payload = b"\xff\x00) Tj 1 0 0 1 0 0 Tm (FAKE) Tj \x01EI\xfe BT (X"  # traps incl. fake EI
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (before) Tj ET\n"
               b"BI /W 4 /H 2 /CS /G /BPC 8 ID " + payload + b" EI\n"
               b"BT /F1 12 Tf 1 0 0 1 72 680 Tm (after) Tj ET")
    b = PDFBuilder()
    font_num = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 {font_num} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root), "\n\nbefore\nafter"


def _single_page_pdf(content: bytes) -> bytes:
    """One WinAnsi-Helvetica page around a raw content stream (fixture glue)."""
    b = PDFBuilder()
    font_num = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 {font_num} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


def make_rotated_text_pdf() -> tuple[bytes, str]:
    """90°-rotated run between horizontal runs (M12 rotation handling in
    compare_with_last_position; expected string locked against the live
    reference engine)."""
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (flat) Tj ET\n"
               b"BT /F1 12 Tf 0 1 -1 0 300 400 Tm (rising) Tj ET\n"
               b"BT /F1 12 Tf 1 0 0 1 72 650 Tm (flat again) Tj ET")
    return _single_page_pdf(content), "\n\nflat\nrising\nflat again"


def make_hscale_rise_pdf() -> tuple[bytes, str]:
    """Tz horizontal scaling + Ts rise (M9 state handling; expected locked
    against the live reference)."""
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm 50 Tz (squished) Tj "
               b"100 Tz 5 Ts ( raised) Tj 0 Ts ( base) Tj ET")
    # rise shifts trigger the reference's vertical-jump EOLs
    return _single_page_pdf(content), "\n\nsquished \nraised \nbase"


def make_qq_cm_pdf() -> tuple[bytes, str]:
    """q/Q state save/restore around a cm scale (M9 ctm; expected locked
    against the live reference)."""
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (one) Tj ET\n"
               b"q 2 0 0 2 0 0 cm BT /F1 12 Tf 1 0 0 1 50 330 Tm (scaled) Tj ET Q\n"
               b"BT /F1 12 Tf 1 0 0 1 72 640 Tm (two) Tj ET")
    return _single_page_pdf(content), "\n\none\nscaled\ntwo"


def make_form_xobject_pdf() -> tuple[bytes, str]:
    """Do-recursion into a Form XObject with its own Matrix + Resources
    (M17; expected locked against the live reference)."""
    b = PDFBuilder()
    font_num = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    form_content = b"BT /F1 12 Tf 1 0 0 1 0 0 Tm (inside form) Tj ET"
    form_num = b.add_stream(
        f"/Type /XObject /Subtype /Form /BBox [0 0 200 50] /Matrix [1 0 0 1 100 500] /Resources << /Font << /F1 {font_num} 0 R >> >>".encode(),
        form_content, "flate")
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (before form) Tj ET\n"
               b"/Fx1 Do\n"
               b"BT /F1 12 Tf 1 0 0 1 72 640 Tm (after form) Tj ET")
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add((f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> /XObject << /Fx1 {form_num} 0 R >> >> "
                f"/Contents {cn} 0 R >>").encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root), "\n\nbefore form\ninside form\nafter form"


def make_type3_pdf() -> tuple[bytes, str]:
    """Type3 font: glyphs defined by CharProcs content streams, advances in
    glyph space scaled by /FontMatrix (M9/M10 Type3 path; expected locked
    against the live reference)."""
    b = PDFBuilder()
    # two trivial charprocs (content irrelevant for text extraction)
    pa_ = b.add_stream(b"", b"10 0 0 0 0 0 d0", None)
    pb_ = b.add_stream(b"", b"10 0 0 0 0 0 d0", None)
    font_num = b.add((
        "<< /Type /Font /Subtype /Type3 /FontBBox [0 0 10 10] "
        "/FontMatrix [0.1 0 0 0.1 0 0] "
        f"/CharProcs << /ga {pa_} 0 R /gb {pb_} 0 R >> "
        "/Encoding << /Type /Encoding /Differences [65 /ga 66 /gb] >> "
        "/FirstChar 65 /LastChar 66 /Widths [10 10] "
        "/ToUnicode {tou} 0 R >>"
    ).encode())
    tou = (b"/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
           b"1 begincodespacerange <00> <FF> endcodespacerange "
           b"2 beginbfchar <41> <0058> <42> <0059> endbfchar "  # A->X, B->Y
           b"endcmap end end")
    tou_num = b.add_stream(b"", tou, "flate")
    # patch the font dict with the real tou obj number
    b.objects[font_num - 1] = b.objects[font_num - 1].replace(b"{tou}", str(tou_num).encode())
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (AB) Tj ET"
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 {font_num} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root), "\n\nXY"


# ---------------------------------------------------------------------------
# encrypted fixtures (SURVEY gap: reference decrypts transparently via
# pdf.js CipherTransformFactory, build/pdf.worker.js:40867)
# ---------------------------------------------------------------------------

class PDFEncryptor:
    """Generation-side standard security handler for fixtures.

    Modes: ``rc4-40`` (V1 R2), ``rc4-128`` (V2 R3), ``aesv2`` (V4 R4,
    AES-128-CBC crypt filter), ``aesv3`` (V5 R6, AES-256).  Produces /O /U
    (/OE /UE /Perms for V5) entries that validate against the given user
    password per ISO 32000 Algorithms 2-5 / 2.A-2.B, and encrypts stream
    bytes with the matching per-object (or file) key.  The live pdf.js
    reference is the conformance oracle for these fixtures.
    """

    def __init__(self, mode: str, user_pw: bytes = b"",
                 owner_pw: bytes = b"owner-secret", p: int = -44,
                 seed: int = 20260817, encrypt_metadata: bool = True):
        import hashlib

        from ..pdfkernel import crypto as C

        self._C = C
        self.mode = mode
        self.rng = random.Random(seed)
        self.id0 = bytes(self.rng.randrange(256) for _ in range(16))
        self.p = p
        self.encrypt_metadata = encrypt_metadata
        pw32 = (user_pw + C.PAD)[:32]
        ow32 = (owner_pw + C.PAD)[:32] if owner_pw else pw32
        params = {"rc4-40": (1, 2, 40), "rc4-128": (2, 3, 128),
                  "aesv2": (4, 4, 128), "aesv3": (5, 6, 256)}
        if mode not in params:
            raise ValueError(f"unknown encryption mode {mode!r}")
        self.v, self.r, self.length = params[mode]

        if self.v != 5:
            klen = self.length >> 3
            # Algorithm 3: /O from the owner password
            ho = hashlib.md5(ow32).digest()
            if self.r >= 3:
                for _ in range(50):
                    ho = hashlib.md5(ho).digest()
            key_o = ho[:klen]
            if self.r == 2:
                self.O = C.rc4(key_o, pw32)
            else:
                tmp = pw32
                for i in range(20):
                    tmp = C.rc4(bytes(b ^ i for b in key_o), tmp)
                self.O = tmp
            # Algorithm 2: file key from the user password
            buf = (pw32 + self.O + (p & 0xFFFFFFFF).to_bytes(4, "little")
                   + self.id0)
            if self.r >= 4 and not encrypt_metadata:
                buf += b"\xff\xff\xff\xff"
            h = hashlib.md5(buf).digest()
            if self.r >= 3:
                for _ in range(50):
                    h = hashlib.md5(h[:klen]).digest()
            self.key = h[:klen]
            # Algorithm 4/5: /U
            if self.r == 2:
                self.U = C.rc4(self.key, C.PAD)
            else:
                chk = C.rc4(self.key, hashlib.md5(C.PAD + self.id0).digest())
                for i in range(1, 20):
                    chk = C.rc4(bytes(b ^ i for b in self.key), chk)
                self.U = chk + b"\x00" * 16
        else:
            # V5 R6: random file key wrapped by password-derived AES keys
            key = bytes(self.rng.randrange(256) for _ in range(32))
            self.key = key
            uv = bytes(self.rng.randrange(256) for _ in range(8))
            uk = bytes(self.rng.randrange(256) for _ in range(8))
            self.U = C._pdf20_hash(user_pw, user_pw + uv, b"") + uv + uk
            ikey_u = C._pdf20_hash(user_pw, user_pw + uk, b"")
            self.UE = C.aes_cbc_encrypt(ikey_u, key, b"\x00" * 16)
            ov = bytes(self.rng.randrange(256) for _ in range(8))
            ok_ = bytes(self.rng.randrange(256) for _ in range(8))
            u48 = self.U[:48]
            self.O = C._pdf20_hash(owner_pw, owner_pw + ov + u48, u48) + ov + ok_
            ikey_o = C._pdf20_hash(owner_pw, owner_pw + ok_ + u48, u48)
            self.OE = C.aes_cbc_encrypt(ikey_o, key, b"\x00" * 16)
            perms = ((p & 0xFFFFFFFF).to_bytes(4, "little")
                     + b"\xff\xff\xff\xff" + b"Tadb" + bytes(4))
            self.Perms = C.aes_ecb_encrypt(key, perms)

    def _objkey(self, num: int, gen: int, aes: bool) -> bytes:
        import hashlib

        buf = self.key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        if aes:
            buf += b"sAlT"
        return hashlib.md5(buf).digest()[: min(len(self.key) + 5, 16)]

    def _aes_enc(self, key: bytes, data: bytes) -> bytes:
        iv = bytes(self.rng.randrange(256) for _ in range(16))
        padlen = 16 - len(data) % 16
        return iv + self._C.aes_cbc_encrypt(key, data + bytes([padlen]) * padlen, iv)

    def encrypt_stream(self, num: int, gen: int, data: bytes) -> bytes:
        if self.v in (1, 2):
            return self._C.rc4(self._objkey(num, gen, aes=False), data)
        if self.mode == "aesv2":
            return self._aes_enc(self._objkey(num, gen, aes=True), data)
        return self._aes_enc(self.key, data)

    # StrF == StmF == /StdCF in these fixtures
    encrypt_string = encrypt_stream

    def encrypt_dict_body(self) -> bytes:
        def hexs(b: bytes) -> bytes:
            return b"<" + b.hex().encode() + b">"

        ou = b" /O " + hexs(self.O) + b" /U " + hexs(self.U)
        if self.v == 1:
            return (b"<< /Filter /Standard /V 1 /R 2" + ou
                    + f" /P {self.p} >>".encode())
        if self.v == 2:
            return (b"<< /Filter /Standard /V 2 /R 3 /Length 128" + ou
                    + f" /P {self.p} >>".encode())
        if self.v == 4:
            return (b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                    b"/CF << /StdCF << /CFM /AESV2 /Length 16 /AuthEvent /DocOpen >> >> "
                    + (b"/StmF /StdCF /StrF /StdCF /EncryptMetadata "
                       + (b"true" if self.encrypt_metadata else b"false")) + ou
                    + f" /P {self.p} >>".encode())
        return (b"<< /Filter /Standard /V 5 /R 6 "
                b"/CF << /StdCF << /CFM /AESV3 /Length 32 /AuthEvent /DocOpen >> >> "
                b"/StmF /StdCF /StrF /StdCF"
                + ou + b" /OE " + hexs(self.OE) + b" /UE " + hexs(self.UE)
                + b" /Perms " + hexs(self.Perms)
                + f" /P {self.p} >>".encode())


def make_encrypted_pdf(mode: str, user_pw: bytes = b"",
                       use_xref_stream: bool = False) -> tuple[bytes, str]:
    """Two-page encrypted text PDF (content streams + Info strings
    encrypted; /Encrypt dict and xref plaintext).  With the default empty
    user password this must extract byte-exact vs the live reference;
    with a non-empty one both engines must reject."""
    enc = PDFEncryptor(mode, user_pw=user_pw)
    b = PDFBuilder(version="1.6")
    b.encryptor = enc
    font_num = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    pages = [["secret page one line a", "cipher text becomes plain"],
             ["second page under " + mode, "final line of the fixture"]]
    content_nums = []
    for lines in pages:
        ops = [b"BT"]
        y = 720.0
        for line in lines:
            ops.append(b"/F1 12 Tf")
            ops.append(b"1 0 0 1 72 " + _fmt(y) + b" Tm")
            ops.append(b"(" + _escape_pdf_text(line) + b") Tj")
            y -= 16.0
        ops.append(b"ET")
        content_nums.append(b.add_stream(b"", b"\n".join(ops), "flate"))
    pages_num_placeholder = len(b.objects) + len(pages) + 1
    page_nums = [b.add(
        f"<< /Type /Page /Parent {pages_num_placeholder} 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {font_num} 0 R >> >> /Contents {cn} 0 R >>".encode())
        for cn in content_nums]
    kids = b" ".join(f"{p} 0 R".encode() for p in page_nums)
    pages_num = b.add(b"<< /Type /Pages /Kids [" + kids + b"] /Count "
                      + str(len(page_nums)).encode() + b" >>")
    assert pages_num == pages_num_placeholder
    root_num = b.add(f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode())
    # Info strings are encrypted with the Info object's own number
    info_num = len(b.objects) + 1
    title = enc.encrypt_string(info_num, 0, b"encrypted fixture")
    prod = enc.encrypt_string(info_num, 0, b"pdfgen/enc")
    got = b.add(b"<< /Title <" + title.hex().encode() + b"> /Producer <"
                + prod.hex().encode() + b"> >>")
    assert got == info_num
    pdf = b.build(root_num, info_num, use_xref_stream=use_xref_stream)
    expected = "".join("\n\n" + "\n".join(_expected_line(l) for l in lines)
                       for lines in pages)
    return pdf, expected


# ---------------------------------------------------------------------------
# minimal TrueType builder (for the symbolic no-ToUnicode fixture: the
# reference recovers WinAnsi text via the font's Windows `name` records,
# adjustTrueTypeToUnicode, pdf.worker.js:27514)
# ---------------------------------------------------------------------------

def _ttf_table_dir(tables: list[tuple[bytes, bytes]]) -> bytes:
    """Assemble an sfnt from (tag, data) pairs."""
    import struct as _s

    n = len(tables)
    search_range = 16
    entry_selector = 0
    while search_range * 2 <= n * 16:
        search_range *= 2
        entry_selector += 1
    out = _s.pack(">IHHHH", 0x00010000, n, search_range, entry_selector,
                  n * 16 - search_range)
    offset = 12 + 16 * n
    dir_entries = b""
    body = b""
    for tag, data in tables:
        pad = (-len(data)) % 4
        checksum = 0
        padded = data + b"\x00" * pad
        for i in range(0, len(padded), 4):
            checksum = (checksum + int.from_bytes(padded[i:i + 4], "big")) & 0xFFFFFFFF
        dir_entries += tag + _s.pack(">III", checksum, offset, len(data))
        body += padded
        offset += len(padded)
    return out + dir_entries + body


def _cmap_format4(segments: list[tuple[int, int, int]]) -> bytes:
    """Format-4 cmap subtable from (start, end, delta) segments (terminator
    added automatically)."""
    import struct as _s

    segs = segments + [(0xFFFF, 0xFFFF, 1)]
    seg_count = len(segs)
    seg_x2 = seg_count * 2
    search_range = 2
    entry_selector = 0
    while search_range * 2 <= seg_x2:
        search_range *= 2
        entry_selector += 1
    sub = _s.pack(">HHHHHH", 4, 16 + seg_count * 8, 0, seg_x2,
                  search_range, entry_selector)
    sub += _s.pack(">H", seg_x2 - search_range)
    sub += b"".join(_s.pack(">H", e) for _, e, _ in segs)
    sub += b"\x00\x00"  # reservedPad
    sub += b"".join(_s.pack(">H", s) for s, _, _ in segs)
    sub += b"".join(_s.pack(">H", d & 0xFFFF) for _, _, d in segs)  # idDelta mod 65536
    sub += b"".join(b"\x00\x00" for _ in segs)  # idRangeOffset = 0
    return sub


def make_minimal_ttf(win_name_records_only: bool = True) -> bytes:
    """A syntactically valid 2-glyph TrueType: (3,0) symbol cmap, Windows
    (or Mac) `name` records, empty glyphs.  Enough for the reference's
    checkAndRepair to parse and run adjustTrueTypeToUnicode."""
    import struct as _s

    head = _s.pack(">IIIIHHQQhhhhHHhhh",
                   0x00010000, 0, 0, 0x5F0F3CF5, 0, 1000, 0, 0,
                   0, 0, 1000, 1000, 0, 8, 2, 0, 0)
    maxp = _s.pack(">IH", 0x00010000, 2) + b"\x00" * 26
    hhea = _s.pack(">IhhhHhhhhhhhhhhhH",
                   0x00010000, 750, -250, 0, 1000, 0, 0, 1000,
                   1, 0, 0, 0, 0, 0, 0, 0, 2)
    hmtx = _s.pack(">HhHh", 500, 0, 500, 0)
    loca = _s.pack(">HHH", 0, 0, 0)  # short format, both glyphs empty
    glyf = b"\x00\x00\x00\x00"
    # (3,0) symbol cmap: F020-F0FF and 20-FF both -> glyph 1
    sub = _cmap_format4([(0x20, 0xFF, 1 - 0x20), (0xF020, 0xF0FF, 1 - 0xF020)])
    cmap = _s.pack(">HHHHI", 0, 1, 3, 0, 12) + sub
    # name table
    def utf16(s: str) -> bytes:
        return s.encode("utf-16-be")

    strings = []
    records = []
    specs = [(3, 1, 0x409, 1, "SynthSymbol"), (3, 1, 0x409, 6, "SynthSymbol")]
    if not win_name_records_only:
        specs.append((1, 0, 0, 1, "SynthSymbol"))
    str_data = b""
    for plat, enc, lang, name_id, s in specs:
        b = utf16(s) if plat == 3 else s.encode("latin-1")
        records.append(_s.pack(">HHHHHH", plat, enc, lang, name_id,
                               len(b), len(str_data)))
        str_data += b
    name = _s.pack(">HHH", 0, len(specs), 6 + 12 * len(specs)) \
        + b"".join(records) + str_data
    post = _s.pack(">IIhhIIIII", 0x00030000, 0, 0, 0, 0, 0, 0, 0, 0)
    return _ttf_table_dir(sorted([
        (b"cmap", cmap), (b"glyf", glyf), (b"head", head), (b"hhea", hhea),
        (b"hmtx", hmtx), (b"loca", loca), (b"maxp", maxp), (b"name", name),
        (b"post", post),
    ]))


def make_symbolic_truetype_pdf(win_names: bool = True) -> tuple[bytes, str]:
    """Symbolic embedded TrueType, NO ToUnicode, NO /Encoding: the
    reference recovers WinAnsi text iff the name records are all-Windows
    (adjustTrueTypeToUnicode); with a Mac record present it falls back to
    MacRoman.  Content uses bytes where WinAnsi, MacRoman and identity all
    differ (0x91-0x97 quotes/dashes), so the mapping choice is observable.
    Expected strings locked against the live reference run."""
    b = PDFBuilder(version="1.4")
    ttf = make_minimal_ttf(win_name_records_only=win_names)
    ff_num = b.add_stream(b"/Length1 " + str(len(ttf)).encode() + b" ", ttf, "flate")
    desc_num = b.add((
        "<< /Type /FontDescriptor /FontName /SynthSymbol /Flags 4 "
        "/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 750 /Descent -250 "
        "/CapHeight 700 /StemV 80 "
        f"/FontFile2 {ff_num} 0 R >>").encode())
    widths = " ".join(["500"] * (0xFF - 0x20 + 1))
    font_num = b.add((
        "<< /Type /Font /Subtype /TrueType /BaseFont /SynthSymbol "
        f"/FirstChar 32 /LastChar 255 /Widths [{widths}] "
        f"/FontDescriptor {desc_num} 0 R >>").encode())
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (AB \221\222\223\224\226\227 yz) Tj ET"
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 {font_num} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    expected = ("\n\nAB ‘’“”–— yz" if win_names
                else "\n\nAB ëíìîñó yz")
    return b.build(root), expected


def make_identity_v_pdf() -> bytes:
    """Type0 / Identity-V CID font (WMode=1): vertical writing mode.
    Two vertical columns (right column first, as CJK layout reads), a TJ
    with kerning numbers (which shift Y in vertical mode), and a Td line
    step — exercising the kernel's font.vertical advance/assembly paths
    (reference: styles[].vertical + the vertical branches of appendText,
    build/pdf.worker.js textContent path).  Expected text is locked
    byte-exact against the live reference in tests and the differential
    sweep."""
    tou = (b"/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
           b"1 begincodespacerange <0000> <FFFF> endcodespacerange "
           b"1 beginbfrange <0041> <005A> <0041> endbfrange "  # CID==U+0041..
           b"endcmap end end")
    b = PDFBuilder()
    tou_num = b.add_stream(b"", tou, "flate")
    desc_num = b.add(b"<< /Type /FontDescriptor /FontName /SynthV /Flags 4 /Ascent 750 /Descent -250 /ItalicAngle 0 /CapHeight 700 /StemV 80 /FontBBox [0 -250 1000 750] >>")
    cid_num = b.add(f"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SynthV /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> /FontDescriptor {desc_num} 0 R /DW 1000 /DW2 [880 -1000] >>".encode())
    font_num = b.add(f"<< /Type /Font /Subtype /Type0 /BaseFont /SynthV /Encoding /Identity-V /DescendantFonts [{cid_num} 0 R] /ToUnicode {tou_num} 0 R >>".encode())

    def hexs(s: str) -> str:
        return "".join(f"{ord(ch):04X}" for ch in s)

    content = (
        "BT /F1 12 Tf "
        # right-hand column, top of page, downward glyph run
        f"1 0 0 1 400 700 Tm <{hexs('VERT')}> Tj "
        # TJ: kerning numbers move along the vertical axis between glyphs
        f"1 0 0 1 400 620 Tm [<{hexs('KE')}> -500 <{hexs('RN')}>] TJ "
        # left-hand column via Td line step
        f"1 0 0 1 340 700 Tm <{hexs('COL')}> Tj "
        "0 -60 Td "
        f"<{hexs('TWO')}> Tj "
        "ET"
    ).encode()
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 {font_num} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


def make_rtl_pdf() -> bytes:
    """Mixed-direction fixture: codes ToUnicode-mapped to Hebrew letters
    around ASCII numerals and a Latin word — exercises the full bidi
    algorithm (reference build/pdf.worker.js:32557).  Expected text is
    locked against the live reference run in tests."""
    tou = (b"/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
           b"1 begincodespacerange <00> <FF> endcodespacerange "
           b"6 beginbfchar "
           b"<41> <05D0> <42> <05D1> <43> <05D2> "
           b"<44> <05D3> <45> <05D4> <46> <05D5> "
           b"endbfchar endcmap end end")
    b = PDFBuilder()
    tou_num = b.add_stream(b"", tou, "flate")
    font_num = b.add(f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding /ToUnicode {tou_num} 0 R >>".encode())
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (AB 123 CD) Tj "
               b"1 0 0 1 72 680 Tm (EF latin 45) Tj ET")
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 {font_num} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


# ---------------------------------------------------------------------------
# minimal CFF (Type1C) builder — symbolic-CFF-no-ToUnicode fixture: the
# reference recovers text from the CFF Charset+Encoding glyph names
# (CFFFont._createBuiltInEncoding + adjustType1ToUnicode)
# ---------------------------------------------------------------------------

def _cff_index(entries: list[bytes]) -> bytes:
    if not entries:
        return (0).to_bytes(2, "big")
    total = sum(len(e) for e in entries) + 1
    off_size = 1 if total < 256 else 2 if total < 65536 else 3
    out = bytearray(len(entries).to_bytes(2, "big") + bytes([off_size]))
    off = 1
    for e in entries:
        out += off.to_bytes(off_size, "big")
        off += len(e)
    out += off.to_bytes(off_size, "big")
    for e in entries:
        out += e
    return bytes(out)


def make_minimal_cff(glyph_specs: list[tuple[int, str]],
                     font_name: bytes = b"SynthCFF") -> bytes:
    """A spec-valid CFF: custom format-0 Charset + Encoding mapping each
    (charcode, glyphname) to one endchar-only glyph.  Names present in the
    CFF standard strings use their standard SID; others go to the String
    INDEX."""
    from ..pdfkernel.cff import CFF_STANDARD_STRINGS

    custom: list[bytes] = []
    sids = []
    for _, name in glyph_specs:
        try:
            sid = CFF_STANDARD_STRINGS.index(name)
        except ValueError:
            sid = len(CFF_STANDARD_STRINGS) + len(custom)
            custom.append(name.encode("latin-1"))
        sids.append(sid)

    def int29(v: int) -> bytes:
        return bytes([29]) + int(v).to_bytes(4, "big", signed=True)

    def topdict(cs_off: int, enc_off: int, chs_off: int,
                priv_size: int, priv_off: int) -> bytes:
        return (int29(cs_off) + bytes([15])
                + int29(enc_off) + bytes([16])
                + int29(chs_off) + bytes([17])
                + int29(priv_size) + int29(priv_off) + bytes([18]))

    n = len(glyph_specs)
    charstrings = _cff_index([b"\x0e"] * (n + 1))     # .notdef + glyphs
    charset = bytes([0]) + b"".join(s.to_bytes(2, "big") for s in sids)
    encoding = bytes([0, n]) + bytes(code for code, _ in glyph_specs)
    private = (bytes([28]) + (500).to_bytes(2, "big") + bytes([20])
               + bytes([28]) + (500).to_bytes(2, "big") + bytes([21]))

    header = bytes([1, 0, 4, 4])
    name_idx = _cff_index([font_name])
    string_idx = _cff_index(custom)
    gsubr_idx = _cff_index([])
    td_len = len(_cff_index([topdict(0, 0, 0, len(private), 0)]))
    fixed = len(header) + len(name_idx) + td_len + len(string_idx) + len(gsubr_idx)
    cs_off = fixed
    enc_off = cs_off + len(charset)
    chs_off = enc_off + len(encoding)
    priv_off = chs_off + len(charstrings)
    td_idx = _cff_index([topdict(cs_off, enc_off, chs_off, len(private), priv_off)])
    assert len(td_idx) == td_len
    return (header + name_idx + td_idx + string_idx + gsubr_idx
            + charset + encoding + charstrings + private)


def make_cff_builtin_encoding_pdf() -> tuple[bytes, str]:
    """Symbolic embedded CFF (Type1C), NO ToUnicode, NO /Encoding: text is
    recoverable only from the font program's Charset glyph names (standard
    SIDs, a composite-accent name, and a uniXXXX custom string).  Expected
    locked against the live reference run."""
    cff = make_minimal_cff([(0x41, "odieresis"), (0x42, "eacute"),
                            (0x43, "uni0416"), (0x20, "space")])
    b = PDFBuilder(version="1.5")
    ff_num = b.add_stream(b"/Subtype /Type1C ", cff, "flate")
    desc_num = b.add((
        "<< /Type /FontDescriptor /FontName /SynthCFF /Flags 4 "
        "/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 750 /Descent -250 "
        "/CapHeight 700 /StemV 80 "
        f"/FontFile3 {ff_num} 0 R >>").encode())
    widths = " ".join(["500"] * (0x43 - 0x20 + 1))
    font_num = b.add((
        "<< /Type /Font /Subtype /Type1 /BaseFont /SynthCFF "
        f"/FirstChar 32 /LastChar 67 /Widths [{widths}] "
        f"/FontDescriptor {desc_num} 0 R >>").encode())
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (AB C) Tj ET"
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 {font_num} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root), "\n\nöé Ж"


def make_surrogate_pair_pdf() -> bytes:
    """ToUnicode targets OUTSIDE the BMP: bfchar destinations are
    UTF-16BE SURROGATE PAIRS (U+1F600 😀, U+1D49C 𝒜) plus a mixed
    astral+BMP destination — pdf.js decodes the raw UTF-16BE bytes
    (build/pdf.worker.js bfchar path), so a kernel that treats the
    destination as fixed 2-byte units corrupts these.  Expected text is
    locked against the live reference in the differential sweep (no
    hardcoded expectation here: surrogate handling is exactly the kind
    of thing to OBSERVE, not assume)."""
    tou = (b"/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
           b"1 begincodespacerange <00> <FF> endcodespacerange "
           b"3 beginbfchar "
           b"<41> <D83DDE00> "          # U+1F600 grinning face
           b"<42> <D835DC9C> "          # U+1D49C mathematical script A
           b"<43> <0058D83DDE01> "      # 'X' + U+1F601 (mixed BMP+astral)
           b"endbfchar endcmap end end")
    b = PDFBuilder()
    tou_num = b.add_stream(b"", tou, "flate")
    font_num = b.add(
        f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        f"/Encoding /WinAnsiEncoding /ToUnicode {tou_num} 0 R >>".encode())
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (A B C) Tj ET"
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(
        f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
        f"/Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


def make_base_encoding_sweep_pdf(enc_name: str | None,
                                 base_font: str = "Helvetica") -> bytes:
    """Full 0x20-0xFF charcode sweep through a non-embedded simple font.

    ``enc_name`` is the explicit /Encoding name (None = omit, exercising the
    reference's default-table selection — e.g. SymbolSetEncoding for a
    non-embedded /Symbol, ZapfDingbatsEncoding for /ZapfDingbats,
    build/pdf.worker.js:37209-37229).  Each code is its own positioned Tj
    (20 per row) so every table slot, including the missing-file Type1
    empty-name -> space rule (:29779-29786), surfaces in the output.
    Expected text is locked against the live reference in the differential
    sweep."""
    ops = [b"BT /F1 12 Tf"]
    for i, code in enumerate(range(0x20, 0x100)):
        x = 40 + 28 * (i % 20)
        y = 6900 - 20 * (i // 20)
        ops.append(b"1 0 0 1 %d %d Tm (\\%03o) Tj" % (x, y, code))
    content = b" ".join(ops) + b" ET"
    enc_part = f" /Encoding /{enc_name}" if enc_name else ""
    b = PDFBuilder()
    font_num = b.add(
        f"<< /Type /Font /Subtype /Type1 /BaseFont /{base_font}"
        f"{enc_part} >>".encode())
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(
        f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 7000] "
        f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
        f"/Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


def make_number_syntax_pdf() -> bytes:
    """Operand-number syntax torture: scientific e-notation (1e2, 1E+1,
    2.5e-1), double leading minus (--20), a mid-number minus (3-4 parses as
    34), bare '.' (-> 0 via the whitespace-after-sign rule) and a trailing
    lone 'e' — the reference Lexer.getNumber tolerances
    (build/pdf.worker.js Lexer.getNumber).  Each quirk shifts a Td so the
    text layout (space insertion between items) observably encodes the
    parsed values; locked byte-exact vs the live reference in the
    differential sweep."""
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (A) Tj "
               b"1e2 0 Td (B) Tj "
               b"1E+1 0 Td (C) Tj "
               b"2.5e-1 -0 Td (D) Tj "
               b"--20 0 Td (E) Tj "
               b"3-4 0 Td (F) Tj "
               b"1 0 0 1 72 650 Tm (G) Tj "
               b"12e 0 Td (H) Tj ET")
    b = PDFBuilder()
    font_num = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
                     b" /Encoding /WinAnsiEncoding >>")
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(
        f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] "
        f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
        f"/Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


def make_operator_fuzz_pdf(seed: int) -> bytes:
    """Randomized text-operator torture page: interleaved Tm/Td/TD/T*/TL/
    Tc/Tw/Tz/Ts state changes, Tj / TJ-with-kerning / ' / \" show ops,
    multiple BT..ET blocks and occasional high-WinAnsi bytes — the
    span-assembly + TextState surface (M8/M9/M12/M13) under adversarial
    sequencing.  Deterministic per seed; expected text comes from the live
    reference in the differential sweep."""
    rng = random.Random(0xF022 + seed)
    words = ["alpha", "beta", "gamma", "delta", "kappa", "omega",
             "zig", "zag", "quux", "blot", "nine", "ten"]
    hi = "é×÷±µ§¶«»¼½"

    def _s() -> bytes:
        w = rng.choice(words)
        if rng.random() < 0.25:
            w += rng.choice(hi)
        return w.encode("cp1252")

    def _n(lo: float, hi_: float, nd: int = 2) -> bytes:
        return (b"%.*f" % (nd, rng.uniform(lo, hi_))).rstrip(b"0").rstrip(b".") or b"0"

    ops: list[bytes] = []
    y = 720.0
    for _ in range(rng.randint(2, 4)):
        ops.append(b"BT /F1 %s Tf" % _n(8, 16, 1))
        ops.append(b"1 0 0 1 %s %s Tm" % (_n(40, 90), _n(y - 5, y)))
        y -= rng.uniform(40, 90)
        for _ in range(rng.randint(3, 10)):
            r = rng.random()
            if rng.random() < 0.12:
                # junk: unknown ops keep their args for later borrow;
                # wrong-arity ops shed/borrow via nonProcessedArgs
                junk = rng.random()
                if junk < 0.4:
                    ops.append(b"%s %s frobnicate" % (_n(-9, 9), _n(-9, 9)))
                elif junk < 0.7:
                    ops.append(b"%s %s %s Tm" % (_n(0.5, 2), _n(40, 90),
                                                 _n(200, 700)))
                else:
                    ops.append(b"%s Td" % _n(-20, 20))
            if r < 0.18:
                ops.append(b"%s %s Td" % (_n(-30, 120), _n(-25, 5)))
            elif r < 0.28:
                ops.append(b"%s %s TD" % (_n(-30, 120), _n(-25, 5)))
            elif r < 0.36:
                ops.append(b"%s TL" % _n(8, 24, 1))
            elif r < 0.42:
                ops.append(b"T*")
            elif r < 0.50:
                ops.append(b"%s Tc" % _n(-0.4, 2.5))
            elif r < 0.58:
                ops.append(b"%s Tw" % _n(-1, 6))
            elif r < 0.64:
                ops.append(b"%s Tz" % _n(40, 180, 1))
            elif r < 0.70:
                ops.append(b"%s Ts" % _n(-4, 6, 1))
            show = rng.random()
            if show < 0.45:
                ops.append(b"(" + _s() + b") Tj")
            elif show < 0.75:
                parts: list[bytes] = []
                for _ in range(rng.randint(2, 5)):
                    parts.append(b"(" + _s() + b")")
                    if rng.random() < 0.8:
                        parts.append(_n(-900, 400, 1))
                ops.append(b"[" + b" ".join(parts) + b"] TJ")
            elif show < 0.9:
                ops.append(b"(" + _s() + b") '")
            else:
                ops.append(b"%s %s (%s) \"" % (_n(0, 4), _n(-0.3, 1.5),
                                               _s()))
        ops.append(b"ET")
    return _single_page_pdf(b"\n".join(ops))


def make_state_fuzz_pdf(seed: int) -> bytes:
    """Harder randomized torture: q/Q graphics-state nesting with shear/
    translate cm, rotated text matrices, Tr render modes (including
    invisible mode 3 — the reference still extracts it), Tz 0, THREE fonts
    with different base encodings re-selected mid-block, and the page's
    /Contents split across multiple streams (join semantics).
    Deterministic per seed; expected text comes from the live reference in
    the differential sweep."""
    import math

    rng = random.Random(0xBEEF + seed)
    words = ["alpha", "beta", "gamma", "delta", "kap", "om", "zig", "zag"]

    def _s() -> bytes:
        w = rng.choice(words)
        if rng.random() < 0.2:
            w += "é×µ«"[rng.randrange(4)]
        return w.encode("cp1252")

    def _n(lo: float, hi: float, nd: int = 2) -> bytes:
        return (b"%.*f" % (nd, rng.uniform(lo, hi))).rstrip(b"0").rstrip(b".") or b"0"

    fonts = [b"/F1", b"/F2", b"/F3"]
    ops: list[bytes] = []
    depth = 0
    y = 720.0
    streams: list[bytes] = []
    for _ in range(rng.randint(2, 5)):
        r = rng.random()
        if r < 0.25 and depth < 3:
            ops.append(b"q")
            depth += 1
            ops.append(b"%s %s %s %s %s %s cm" % (
                _n(0.7, 1.3), _n(-0.2, 0.2), _n(-0.2, 0.2), _n(0.7, 1.3),
                _n(-20, 20), _n(-20, 20)))
        elif r < 0.35 and depth > 0:
            ops.append(b"Q")
            depth -= 1
        ops.append(b"BT %s %s Tf" % (rng.choice(fonts), _n(7, 15, 1)))
        if rng.random() < 0.3:
            th = rng.uniform(0, 6.283)
            c_, s_ = math.cos(th), math.sin(th)
            ops.append(b"%.3f %.3f %.3f %.3f %s %s Tm" % (
                c_, s_, -s_, c_, _n(100, 400), _n(200, 600)))
        else:
            ops.append(b"1 0 0 1 %s %s Tm" % (_n(40, 90), _n(y - 5, y)))
            y -= rng.uniform(30, 80)
        if rng.random() < 0.35:
            ops.append(b"%d Tr" % rng.choice([0, 1, 2, 3, 7]))
        if rng.random() < 0.1:
            ops.append(b"0 Tz")
        for _ in range(rng.randint(2, 6)):
            rr = rng.random()
            if rr < 0.2:
                ops.append(b"%s %s Td" % (_n(-20, 80), _n(-20, 4)))
            elif rr < 0.3:
                ops.append(b"%s TL" % _n(6, 20, 1))
            elif rr < 0.36:
                ops.append(b"T*")
            elif rr < 0.44:
                ops.append(b"%s Tc" % _n(-0.3, 2))
            elif rr < 0.5:
                ops.append(b"%s Tz" % _n(0, 160, 1))
            if rng.random() < 0.5:
                ops.append(b"(" + _s() + b") Tj")
            else:
                parts: list[bytes] = []
                for _ in range(rng.randint(2, 4)):
                    parts.append(b"(" + _s() + b")")
                    parts.append(_n(-800, 300, 1))
                ops.append(b"[" + b" ".join(parts) + b"] TJ")
        ops.append(b"ET")
        if rng.random() < 0.3:
            streams.append(b"\n".join(ops))
            ops = []
    ops.extend(b"Q" for _ in range(depth))
    streams.append(b"\n".join(ops))
    b = PDFBuilder()
    f1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
               b" /Encoding /WinAnsiEncoding >>")
    f2 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman"
               b" /Encoding /MacRomanEncoding >>")
    f3 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")
    cns = [b.add_stream(b"", c, "flate") for c in streams]
    pages_num = len(b.objects) + 2
    contents = b"[" + b" ".join(b"%d 0 R" % c for c in cns) + b"]"
    pn = b.add((f"<< /Type /Page /Parent {pages_num} 0 R "
                f"/MediaBox [0 0 612 792] /Resources << /Font "
                f"<< /F1 {f1} 0 R /F2 {f2} 0 R /F3 {f3} 0 R >> >> "
                f"/Contents ").encode() + contents + b" >>")
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


def make_objstm_pdf() -> tuple[bytes, str]:
    """Font/page/pages/catalog packed into a /Type /ObjStm object stream,
    addressed by TYPE-2 xref-stream entries (ISO 32000-1 §7.5.7-7.5.8;
    reference ObjStm path: XRef.fetchCompressed) — the modern-writer layout
    the classic builder never produces."""
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>")
    page = (b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 1 0 R >> >> /Contents 6 0 R >>")
    pages = b"<< /Type /Pages /Kids [2 0 R] /Count 1 >>"
    catalog = b"<< /Type /Catalog /Pages 3 0 R >>"
    inner = [(1, font), (2, page), (3, pages), (4, catalog)]
    offsets, body = [], b""
    for num, b_ in inner:
        offsets.append((num, len(body)))
        body += b_ + b"\n"
    header = b" ".join(b"%d %d" % (n, o) for n, o in offsets) + b" "
    stm_data = header + body
    first = len(header)
    objstm_payload = zlib.compress(stm_data)
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (packed in objstm) Tj ET"
    cdata = zlib.compress(content)
    out = bytearray(b"%PDF-1.5\n")
    offs: dict[int, int] = {}

    def emit(num: int, obody: bytes) -> None:
        offs[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + obody + b"\nendobj\n")

    emit(5, b"<< /Type /ObjStm /N 4 /First %d /Filter /FlateDecode"
            b" /Length %d >>\nstream\n" % (first, len(objstm_payload))
            + objstm_payload + b"\nendstream")
    emit(6, b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(cdata)
            + cdata + b"\nendstream")
    xref_pos = len(out)
    rows = bytearray()
    rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
    for n in (1, 2, 3, 4):
        rows += bytes([2]) + (5).to_bytes(4, "big") + (n - 1).to_bytes(2, "big")
    rows += bytes([1]) + offs[5].to_bytes(4, "big") + (0).to_bytes(2, "big")
    rows += bytes([1]) + offs[6].to_bytes(4, "big") + (0).to_bytes(2, "big")
    rows += bytes([1]) + xref_pos.to_bytes(4, "big") + (0).to_bytes(2, "big")
    xdata = zlib.compress(bytes(rows))
    out.extend(b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 4 2] /Index [0 8]"
               b" /Root 4 0 R /Filter /FlateDecode /Length %d >>\nstream\n"
               % len(xdata) + xdata + b"\nendstream\nendobj\n")
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_pos)
    return bytes(out), "\n\npacked in objstm"


def make_incremental_update_pdf() -> tuple[bytes, str]:
    """Classic incremental update: an appended body REPLACES the page's
    content stream, the update xref carries /Prev to the original section
    — newest-section-wins object resolution (ISO 32000-1 §7.5.6)."""
    base, _ = make_text_pdf([["original line one", "original line two"]])
    m = re.search(rb"(\d+) 0 obj\n<< /Type /Page .*?/Contents (\d+) 0 R", base)
    page_num = int(m.group(1))
    parent = int(re.search(rb"/Parent (\d+) 0 R", m.group(0)).group(1))
    font = int(re.search(rb"/F1 (\d+) 0 R", base).group(1))
    size = int(re.search(rb"/Size (\d+)", base).group(1))
    prev_xref = int(re.search(rb"startxref\n(\d+)", base).group(1))
    new_c = size
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (updated content) Tj ET"
    cdata = zlib.compress(content)
    out = bytearray(base)
    offs: dict[int, int] = {}
    offs[new_c] = len(out)
    out.extend(b"%d 0 obj\n<< /Filter /FlateDecode /Length %d >>\nstream\n"
               % (new_c, len(cdata)) + cdata + b"\nendstream\nendobj\n")
    offs[page_num] = len(out)
    out.extend(b"%d 0 obj\n<< /Type /Page /Parent %d 0 R"
               b" /MediaBox [0 0 612 792] /Resources << /Font"
               b" << /F1 %d 0 R >> >> /Contents %d 0 R >>\nendobj\n"
               % (page_num, parent, font, new_c))
    xref_pos = len(out)
    out.extend(b"xref\n0 1\n0000000000 65535 f \n")
    out.extend(b"%d 1\n%010d 00000 n \n" % (page_num, offs[page_num]))
    out.extend(b"%d 1\n%010d 00000 n \n" % (new_c, offs[new_c]))
    root = re.search(rb"/Root (\d+) 0 R", base).group(1)
    out.extend(b"trailer\n<< /Size %d /Root %s 0 R /Prev %d >>\n"
               b"startxref\n%d\n%%%%EOF\n"
               % (new_c + 1, root, prev_xref, xref_pos))
    return bytes(out), "\n\nupdated content"


def make_bad_startxref_pdf() -> tuple[bytes, str]:
    """startxref points past EOF — both engines must recover by scanning
    for object headers (reference: XRef.indexObjects recovery)."""
    base, _ = make_text_pdf([["recover me", "second line"]])
    return (re.sub(rb"startxref\n\d+", b"startxref\n999999", base),
            "\n\nrecover me\nsecond line")


def make_shifted_header_pdf() -> tuple[bytes, str]:
    """Garbage bytes BEFORE %PDF- : every xref offset in the file is now
    stale by the prelude length; the reference tolerates it (stream.start
    rebasing / recovery scan)."""
    base, _ = make_text_pdf([["offset header doc"]])
    return (b"%%junk prelude\n" + b"\x00" * 7 + b"\n" + base,
            "\n\noffset header doc")


def make_tounicode_fuzz_pdf(seed: int) -> bytes:
    """Randomized simple-font ToUnicode CMap: bfchar with 1-3-unit UTF-16
    destinations, bfrange with incrementing (incl. astral base) and
    array-destination forms, mapped + unmapped codes interleaved.
    Deterministic per seed; oracle is the live reference in the sweep."""
    rng = random.Random(0xCAFE + seed)
    entries: list[str] = []
    used: set[int] = set()
    for _ in range(rng.randint(1, 6)):
        c = rng.randint(0x21, 0x7E)
        if c in used:
            continue
        used.add(c)
        k = rng.randint(1, 3)
        dst = "".join(chr(rng.choice(
            [0x41 + rng.randrange(26), 0x3B1 + rng.randrange(20),
             0x4E00 + rng.randrange(100)])) for _ in range(k))
        entries.append(f"<{c:02X}> <{dst.encode('utf-16-be').hex().upper()}>")
    bfchar = (f"{len(entries)} beginbfchar " + " ".join(entries)
              + " endbfchar ") if entries else ""
    ranges: list[str] = []
    for _ in range(rng.randint(1, 3)):
        lo = rng.randint(0x21, 0x70)
        hi = lo + rng.randint(0, 6)
        if any(lo <= u <= hi for u in used):
            continue
        used.update(range(lo, hi + 1))
        if rng.random() < 0.5:
            base = rng.choice([0x61, 0x391, 0x4E00, 0x1F600])
            hexdst = (chr(base).encode("utf-16-be").hex().upper()
                      if base > 0xFFFF else f"{base:04X}")
            ranges.append(f"<{lo:02X}> <{hi:02X}> <{hexdst}>")
        else:
            arr = " ".join(
                "<%s>" % "".join(chr(0x30A0 + rng.randrange(60))
                                 for _ in range(rng.randint(1, 2))
                                 ).encode("utf-16-be").hex().upper()
                for _ in range(hi - lo + 1))
            ranges.append(f"<{lo:02X}> <{hi:02X}> [{arr}]")
    bfrange = (f"{len(ranges)} beginbfrange " + " ".join(ranges)
               + " endbfrange ") if ranges else ""
    tou = ("/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
           "1 begincodespacerange <00> <FF> endcodespacerange "
           + bfchar + bfrange + "endcmap end end").encode()
    codes = sorted(used) + [0x7A, 0x20, 0x41]
    rng.shuffle(codes)
    s = b"".join(b"\\%03o" % c for c in codes[:25])
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (" + s + b") Tj ET"
    b = PDFBuilder()
    tn = b.add_stream(b"", tou, "flate")
    fn = b.add(f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
               f" /Encoding /WinAnsiEncoding /ToUnicode {tn} 0 R >>".encode())
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R"
               f" /MediaBox [0 0 612 792] /Resources << /Font"
               f" << /F1 {fn} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


def make_cid_tounicode_fuzz_pdf(seed: int) -> bytes:
    """Randomized Identity-H composite-font ToUnicode: 2-byte codes, long
    (multi-unit) bfrange destinations exercising the last-code-unit
    increment, CJK/astral destinations.  Oracle: live reference."""
    rng = random.Random(0xD1CE + seed)
    entries: list[str] = []
    used: set[int] = set()
    for _ in range(rng.randint(2, 8)):
        c = rng.randint(0x0021, 0x30FF)
        if c in used:
            continue
        used.add(c)
        k = rng.randint(1, 2)
        dst = "".join(chr(rng.choice([0x41 + rng.randrange(26),
                                      0x4E00 + rng.randrange(500)]))
                      for _ in range(k))
        entries.append(f"<{c:04X}> <{dst.encode('utf-16-be').hex().upper()}>")
    bfchar = (f"{len(entries)} beginbfchar " + " ".join(entries)
              + " endbfchar ")
    ranges: list[str] = []
    for _ in range(rng.randint(1, 3)):
        lo = rng.randint(0x4000, 0x40F0)
        hi = lo + rng.randint(0, 8)
        if any(lo <= u <= hi for u in used):
            continue
        used.update(range(lo, hi + 1))
        if rng.random() < 0.4:
            dst = (chr(0x41 + rng.randrange(20))
                   + chr(0x3042 + rng.randrange(40))
                   ).encode("utf-16-be").hex().upper()
        else:
            dst = f"{rng.choice([0x61, 0x4E00]):04X}"
        ranges.append(f"<{lo:04X}> <{hi:04X}> <{dst}>")
    bfrange = (f"{len(ranges)} beginbfrange " + " ".join(ranges)
               + " endbfrange ") if ranges else ""
    tou = ("/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
           "1 begincodespacerange <0000> <FFFF> endcodespacerange "
           + bfchar + bfrange + "endcmap end end").encode()
    codes = sorted(used)
    rng.shuffle(codes)
    hexstr = "".join(f"{c:04X}" for c in codes[:20])
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm <" + hexstr.encode() + b"> Tj ET"
    b = PDFBuilder()
    tn = b.add_stream(b"", tou, "flate")
    desc = b.add(b"<< /Type /FontDescriptor /FontName /Fake /Flags 4"
                 b" /Ascent 880 /Descent -120 >>")
    cidf = b.add(f"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake"
                 f" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
                 f" /Supplement 0 >> /FontDescriptor {desc} 0 R"
                 f" /DW 1000 >>".encode())
    fn = b.add(f"<< /Type /Font /Subtype /Type0 /BaseFont /Fake"
               f" /Encoding /Identity-H /DescendantFonts [{cidf} 0 R]"
               f" /ToUnicode {tn} 0 R >>".encode())
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R"
               f" /MediaBox [0 0 612 792] /Resources << /Font"
               f" << /F1 {fn} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


def make_inherited_tree_pdf(rotate: int = 0) -> tuple[bytes, str]:
    """Nested page tree with INHERITED attributes: leaf pages carry no
    /Resources or /MediaBox — the intermediate Pages node holds Resources,
    the root Pages holds MediaBox (ISO 32000-1 §7.7.3.4 inheritable
    attributes; reference: Page.getInheritableProperty).  Optional /Rotate
    on the second leaf."""
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>")
    c1 = zlib.compress(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (page one inherits) Tj ET")
    c2 = zlib.compress(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (page two inherits) Tj ET")
    out = bytearray(b"%PDF-1.4\n")
    offs: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offs[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body + b"\nendobj\n")

    emit(1, font)
    emit(2, b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(c1)
            + c1 + b"\nendstream")
    emit(3, b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(c2)
            + c2 + b"\nendstream")
    emit(4, b"<< /Type /Page /Parent 6 0 R /Contents 2 0 R >>")
    rot = (b" /Rotate %d" % rotate) if rotate else b""
    emit(5, b"<< /Type /Page /Parent 6 0 R /Contents 3 0 R" + rot + b" >>")
    emit(6, b"<< /Type /Pages /Parent 7 0 R /Kids [4 0 R 5 0 R] /Count 2"
            b" /Resources << /Font << /F1 1 0 R >> >> >>")
    emit(7, b"<< /Type /Pages /Kids [6 0 R] /Count 2"
            b" /MediaBox [0 0 612 792] >>")
    emit(8, b"<< /Type /Catalog /Pages 7 0 R >>")
    xref_pos = len(out)
    n = 9
    out.extend(b"xref\n0 %d\n0000000000 65535 f \n" % n)
    for i in range(1, n):
        out.extend(b"%010d 00000 n \n" % offs[i])
    out.extend(b"trailer\n<< /Size %d /Root 8 0 R >>\nstartxref\n%d\n%%%%EOF\n"
               % (n, xref_pos))
    return bytes(out), "\n\npage one inherits\n\npage two inherits"


def make_encrypted_objstm_pdf(mode: str) -> tuple[bytes, str]:
    """Encrypted PDF whose page tree lives in an /ObjStm: the object
    stream decrypts with ITS object key, while strings inside it are NOT
    separately decrypted (ISO 32000-1 §7.6.3; reference: the
    suppressEncryption path for ObjStm-contained objects)."""
    enc = PDFEncryptor(mode, user_pw=b"")
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>")
    page = (b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /Font << /F1 1 0 R >> >> /Contents 6 0 R >>")
    pages = b"<< /Type /Pages /Kids [2 0 R] /Count 1 >>"
    catalog = b"<< /Type /Catalog /Pages 3 0 R /Lang (en-US) >>"
    inner = [(1, font), (2, page), (3, pages), (4, catalog)]
    offsets, body = [], b""
    for num, b_ in inner:
        offsets.append((num, len(body)))
        body += b_ + b"\n"
    header = b" ".join(b"%d %d" % (n, o) for n, o in offsets) + b" "
    stm_data = header + body
    first = len(header)
    payload = enc.encrypt_stream(5, 0, zlib.compress(stm_data))
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (encrypted objstm text) Tj ET"
    cdata = enc.encrypt_stream(6, 0, zlib.compress(content))
    out = bytearray(b"%PDF-1.6\n")
    offs: dict[int, int] = {}

    def emit(num: int, obody: bytes) -> None:
        offs[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + obody + b"\nendobj\n")

    emit(5, b"<< /Type /ObjStm /N 4 /First %d /Filter /FlateDecode"
            b" /Length %d >>\nstream\n" % (first, len(payload))
            + payload + b"\nendstream")
    emit(6, b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(cdata)
            + cdata + b"\nendstream")
    emit(8, enc.encrypt_dict_body())
    xref_pos = len(out)
    rows = bytearray()
    rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
    for n in (1, 2, 3, 4):
        rows += bytes([2]) + (5).to_bytes(4, "big") + (n - 1).to_bytes(2, "big")
    rows += bytes([1]) + offs[5].to_bytes(4, "big") + (0).to_bytes(2, "big")
    rows += bytes([1]) + offs[6].to_bytes(4, "big") + (0).to_bytes(2, "big")
    rows += bytes([1]) + xref_pos.to_bytes(4, "big") + (0).to_bytes(2, "big")
    rows += bytes([1]) + offs[8].to_bytes(4, "big") + (0).to_bytes(2, "big")
    xdata = zlib.compress(bytes(rows))
    idhex = enc.id0.hex().encode()
    out.extend(b"7 0 obj\n<< /Type /XRef /Size 9 /W [1 4 2] /Index [0 9]"
               b" /Root 4 0 R /Encrypt 8 0 R /ID [<" + idhex + b"> <"
               + idhex + b">] /Filter /FlateDecode /Length %d >>\nstream\n"
               % len(xdata) + xdata + b"\nendstream\nendobj\n")
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_pos)
    return bytes(out), "\n\nencrypted objstm text"


def make_embedded_cmap_pdf(wmode: int = 0,
                           with_widths: bool = False) -> bytes:
    """Type0 font whose /Encoding is an EMBEDDED CMap stream: mixed 1-byte
    and 2-byte codespace ranges drive variable-length code segmentation
    (readCharCode, build/pdf.worker.js:14488), cidrange maps codes to CIDs
    (CID-keyed /W widths), optional /WMode 1.  Registered external CMaps
    stay unsupported in BOTH engines (no cmap resource files ship).
    Expected text locked vs the live reference in the sweep."""
    cmap = (b"/CIDInit /ProcSet findresource begin\n12 dict begin\n"
            b"begincmap\n/CIDSystemInfo << /Registry (Test) /Ordering"
            b" (Custom) /Supplement 0 >> def\n/CMapName /Test-Custom def\n"
            b"/CMapType 1 def\n"
            + (b"/WMode 1 def\n" if wmode else b"")
            + b"2 begincodespacerange\n<00> <7F>\n<8000> <FFFF>\n"
            b"endcodespacerange\n2 begincidrange\n<41> <5A> 100\n"
            b"<8001> <8005> 500\nendcidrange\nendcmap\n"
            b"CMapName currentdict /CMap defineresource pop\nend\nend")
    tou = (b"/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
           b"2 begincodespacerange <00> <7F> <8000> <FFFF>"
           b" endcodespacerange "
           b"2 beginbfrange <41> <5A> <0061> <8001> <8005> <4E00>"
           b" endbfrange endcmap end end")
    b = PDFBuilder()
    cmn = b.add_stream(b"/Type /CMap /CMapName /Test-Custom /CIDSystemInfo"
                       b" << /Registry (Test) /Ordering (Custom)"
                       b" /Supplement 0 >> ", cmap, "flate")
    tn = b.add_stream(b"", tou, "flate")
    desc = b.add(b"<< /Type /FontDescriptor /FontName /Fake /Flags 4"
                 b" /Ascent 880 /Descent -120 >>")
    w = b" /W [100 [450 460 470] 500 505 600]" if with_widths else b""
    cidf = b.add(b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake"
                 b" /CIDSystemInfo << /Registry (Test) /Ordering (Custom)"
                 b" /Supplement 0 >> /FontDescriptor %d 0 R /DW 1000" % desc
                 + w + b" >>")
    fn = b.add(b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake"
               b" /Encoding %d 0 R /DescendantFonts [%d 0 R]"
               b" /ToUnicode %d 0 R >>" % (cmn, cidf, tn))
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm <414243> Tj"
               b" 1 0 0 1 72 650 Tm <80018002> Tj <4445> Tj ET")
    cn = b.add_stream(b"", content, "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R"
               f" /MediaBox [0 0 612 792] /Resources << /Font"
               f" << /F1 {fn} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


def make_malformed_ops_pdf() -> bytes:
    """Operator-robustness batch: unknown operators with junk operands,
    Tj before any Tf, wrong-arity Tm/Td, odd-nibble hex string, unbalanced
    ET/BT nesting, empty TJ and TJ with stray names — every case verified
    byte-exact vs the live reference (EvaluatorPreprocessor skip/arity
    semantics)."""
    content = (
        b"ET BT /F1 12 Tf 1 0 0 1 72 700 Tm (A) Tj"
        b" 3 7 frobnicate /X zork (B) Tj ET\n"
        b"BT 1 0 0 1 72 650 Tm (orphan) Tj /F1 12 Tf (after) Tj ET\n"
        b"BT /F1 12 Tf 0 0 1 72 600 Tm (C) Tj 5 Td (D) Tj"
        b" 1 0 0 1 72 560 Tm (E) Tj ET\n"
        b"BT /F1 12 Tf 1 0 0 1 72 520 Tm <48454C4C4F2> Tj"
        b" [] TJ [(F) /Name (G) 50 (H)] TJ ET")
    return _single_page_pdf(content)


def make_xmp_metadata_pdf(variant: str = "rich") -> bytes:
    """Catalog /Metadata XMP stream fixtures for the full-surface
    differential (reference: catalog metadata getter + MetadataParser,
    build/pdf.worker.js:42421,39732).  Variants:

    - ``rich``       mixed-case tags (lowercasing), dc:title Alt,
                     dc:creator Seq, dc:subject Bag, entities, CDATA,
                     comments, xpacket PIs, a second rdf:Description,
                     self-closed entry, duplicate key overwrite
    - ``utf16repair`` the octal-escaped UTF-16BE producer bug _repair fixes
    - ``malformed``  unclosed element -> empty map, metadata object kept
    - ``invalid-utf8`` stream bytes not UTF-8 -> metadata null
    - ``direct-dict`` /Metadata not an indirect Ref -> metadata null
    - ``wrong-type`` stream without /Type /Metadata -> metadata null
    """
    if variant == "rich":
        xml = (b'<?xpacket begin="\xef\xbb\xbf" id="W5M0MpCehiHzreSzNTczkc9d"?>\n'
               b'<x:xmpmeta xmlns:x="adobe:ns:meta/">\n'
               b'<!-- a comment -->\n'
               b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">\n'
               b'<rdf:Description rdf:about="" xmlns:dc="http://purl.org/dc/elements/1.1/">\n'
               b'<dc:Title><rdf:Alt><rdf:li xml:lang="x-default">T&amp;T '
               b'&#x41;&#66;</rdf:li></rdf:Alt></dc:Title>\n'
               b'<dc:creator><rdf:Seq><rdf:li>Alpha One</rdf:li>'
               b'<rdf:li> Beta  Two </rdf:li></rdf:Seq></dc:creator>\n'
               b'<dc:subject><rdf:Bag><rdf:li>k1</rdf:li><rdf:li>k2</rdf:li>'
               b'</rdf:Bag></dc:subject>\n'
               b'<dc:format>application/pdf</dc:format>\n'
               b'<pdfaid:Part xmlns:pdfaid="http://www.aiim.org/pdfa/ns/id/"/>\n'
               b'</rdf:Description>\n'
               b'<rdf:Description rdf:about="" xmlns:xmp="http://ns.adobe.com/xap/1.0/">\n'
               b'<xmp:CreateDate><![CDATA[2009-04-01T16:39:25-07:00]]></xmp:CreateDate>\n'
               b'<xmp:CreatorTool>gen &unknown; tool</xmp:CreatorTool>\n'
               b'<dc:format xmlns:dc="http://purl.org/dc/elements/1.1/">overwritten/fmt</dc:format>\n'
               b'</rdf:Description>\n'
               b'</rdf:RDF>\n</x:xmpmeta>\n<?xpacket end="w"?>')
    elif variant == "utf16repair":
        # the legacy bug: an element value serialized as ">\376\377" +
        # backslash-octal UTF-16BE bytes; the raw '<' from "\000<" ABORTS
        # the capture mid-value in both engines (parse error, empty map)
        xml = (b'<x:xmpmeta xmlns:x="adobe:ns:meta/">'
               b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
               b'<rdf:Description xmlns:xmp="http://ns.adobe.com/xap/1.0/">'
               b'<xmp:BadValue>\\376\\377\\000T\\000e\\000<\\000s\\000t\\000&amp;'
               b'\\004\\020</xmp:BadValue>'
               b'</rdf:Description></rdf:RDF></x:xmpmeta>')
    elif variant == "utf16repair-clean":
        # same producer bug, repairable payload: "Te&st" + U+0410 — the
        # _repair path must yield a parsed value (escaped & and non-ASCII
        # entity encoding both exercised)
        xml = (b'<x:xmpmeta xmlns:x="adobe:ns:meta/">'
               b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
               b'<rdf:Description xmlns:xmp="http://ns.adobe.com/xap/1.0/">'
               b'<xmp:BadValue>\\376\\377\\000T\\000e\\000&amp;\\000s\\000t'
               b'\\004\\020</xmp:BadValue>'
               b'</rdf:Description></rdf:RDF></x:xmpmeta>')
    elif variant == "malformed":
        xml = (b'<x:xmpmeta><rdf:RDF>'
               b'<rdf:Description><dc:title>never closed'
               b'</rdf:RDF></x:xmpmeta>')
    elif variant == "invalid-utf8":
        xml = b'<x:xmpmeta>\xff\xfe broken</x:xmpmeta>'
    elif variant in ("direct-dict", "wrong-type"):
        xml = (b'<x:xmpmeta xmlns:x="adobe:ns:meta/">'
               b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
               b'<rdf:Description xmlns:dc="http://purl.org/dc/elements/1.1/">'
               b'<dc:format>application/pdf</dc:format>'
               b'</rdf:Description></rdf:RDF></x:xmpmeta>')
    else:
        raise ValueError(variant)

    b = PDFBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    cn = b.add_stream(b"", b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (xmp fixture) Tj ET", "flate")
    type_entry = (b"/Type /Metadata /Subtype /XML "
                  if variant != "wrong-type" else b"/Subtype /XML ")
    md = b.add(b"<< " + type_entry + b"/Length " + str(len(xml)).encode()
               + b" >>\nstream\n" + xml + b"\nendstream")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 {font} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    if variant == "direct-dict":
        # inline stream objects can't live inside a dict; emulate the
        # non-Ref case with a direct NAME value (still "not a Ref")
        root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R /Metadata /NotARef >>".encode())
    else:
        root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R /Metadata {md} 0 R >>".encode())
    return b.build(root)


def make_split_contents_pdf(variant: str = "midtoken") -> bytes:
    """/Contents arrays exercising StreamsSequenceStream's RAW
    no-separator concatenation (build/pdf.worker.js:7869):

    - ``midtoken``: a string literal AND a number split across stream
      boundaries rejoin seamlessly
    - ``nows``: adjacent operators without trailing whitespace merge
      into one unknown token at the seam ("ETBT")
    - ``broken``: a failing sub-stream (bad Flate bytes) and a non-stream
      array entry are both skipped; surrounding streams still evaluate
      (_onSubStreamError with ignoreErrors=true, :58941)
    """
    if variant == "midtoken":
        streams = [(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (hel", None),
                   (b"lo split) Tj 1 0 0 1 72 6", None),
                   (b"50 Tm (second) Tj ET", None)]
    elif variant == "nows":
        streams = [(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (a) Tj ET", None),
                   (b"BT /F1 12 Tf 1 0 0 1 72 650 Tm (b) Tj ET\n", None),
                   (b"BT /F1 12 Tf 1 0 0 1 72 600 Tm (c) Tj ET", None)]
    elif variant == "broken":
        streams = [(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (before) Tj ET\n", None),
                   ("BROKEN", None),
                   (b"BT /F1 12 Tf 1 0 0 1 72 650 Tm (after) Tj ET", None)]
    else:
        raise ValueError(variant)
    b = PDFBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    cns = []
    for data, _ in streams:
        if data == "BROKEN":
            # declared FlateDecode, garbage bytes -> decode error -> skipped
            cns.append(b.add(b"<< /Filter /FlateDecode /Length 9 >>\nstream\nnotflate!\nendstream"))
        else:
            cns.append(b.add_stream(b"", data, "flate"))
    if variant == "broken":
        # plus a non-stream entry in the /Contents array (skipped too)
        nonstream = b.add(b"<< /NotA /Stream >>")
        cns.insert(2, nonstream)
    pages_num = len(b.objects) + 2
    contents = b"[" + b" ".join(b"%d 0 R" % c for c in cns) + b"]"
    pn = b.add((f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font} 0 R >> >> /Contents ").encode()
               + contents + b" >>")
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


def make_string_syntax_pdf() -> bytes:
    """String-literal / hex-string lexer torture (reference Lexer
    getString/getHexString): octal escapes (1-3 digits, overflow wrap,
    digit-after-escape), backslash line continuations (LF/CR/CRLF), raw
    EOLs inside literals (normalized to \\n), unknown escapes dropping
    the backslash, nested balanced parens, hex strings with interior
    whitespace and an odd trailing nibble.  Expected text comes from the
    live reference in the sweep."""
    content = (
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm "
        b"(\\101\\102\\103 \\12 \\0623 \\377) Tj "          # ABC, \n, 23, y-umlaut-ish byte
        b"1 0 0 1 72 680 Tm (cont\\\ninued c\\\r\\nont2 c\\\ront3) Tj "
        b"1 0 0 1 72 660 Tm (raw\nlf raw\rcr raw\r\ncrlf) Tj "
        b"1 0 0 1 72 640 Tm (unk\\qesc \\(lit\\) (nested (deep)) done) Tj "
        b"1 0 0 1 72 620 Tm <4 86\t56C6C 6\nF2> Tj "        # HelLo-ish with ws + odd nibble
        b"ET")
    return _single_page_pdf(content)


def make_filter_cascade_pdf() -> bytes:
    """Filter pipelines on CONTENT streams: [/ASCII85Decode /FlateDecode]
    cascade, abbreviation names (/AHx /Fl /RL /A85), RunLength, and a
    PNG-predictor /DecodeParms Flate stream — each page one variant; the
    reference's decode chain (build/pdf.worker.js Parser.filter) is the
    oracle."""
    import base64

    def a85(data: bytes) -> bytes:
        return base64.a85encode(data) + b"~>"

    def rle(data: bytes) -> bytes:
        # simple literal-run RunLength encoding (no repeats needed)
        out = bytearray()
        i = 0
        while i < len(data):
            n = min(128, len(data) - i)
            out.append(n - 1)
            out += data[i:i + n]
            i += n
        out.append(128)
        return bytes(out)

    def png_predict(data: bytes, columns: int) -> bytes:
        # PNG Up predictor (filter type 2) rows over the byte stream
        out = bytearray()
        prev = bytes(columns)
        for i in range(0, len(data), columns):
            row = data[i:i + columns]
            row = row + bytes(columns - len(row))  # zero-pad last row
            out.append(2)
            out += bytes((row[j] - prev[j]) & 0xFF for j in range(columns))
            prev = row
        return bytes(out)

    texts = [b"cascade a85+flate", b"abbrev names", b"runlength page",
             b"predictor page"]
    contents = [b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (%s) Tj ET" % t
                for t in texts]
    b = PDFBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    cns = []
    # page 1: [/ASCII85Decode /FlateDecode]
    enc = a85(zlib.compress(contents[0]))
    cns.append(b.add(b"<< /Filter [/ASCII85Decode /FlateDecode] /Length %d >>\nstream\n" % len(enc) + enc + b"\nendstream"))
    # page 2: [/AHx /Fl] abbreviations
    enc = zlib.compress(contents[1]).hex().encode() + b">"
    cns.append(b.add(b"<< /Filter [/AHx /Fl] /Length %d >>\nstream\n" % len(enc) + enc + b"\nendstream"))
    # page 3: [/A85 /RL]
    enc = a85(rle(contents[2]))
    cns.append(b.add(b"<< /Filter [/A85 /RL] /Length %d >>\nstream\n" % len(enc) + enc + b"\nendstream"))
    # page 4: FlateDecode with PNG Up predictor, Columns 16
    cols = 16
    enc = zlib.compress(png_predict(contents[3], cols))
    cns.append(b.add(b"<< /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns %d >> /Length %d >>\nstream\n" % (cols, len(enc)) + enc + b"\nendstream"))
    pages_num = len(b.objects) + len(cns) + 1
    pns = []
    for cn in cns:
        pns.append(b.add((f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] "
                          f"/Resources << /Font << /F1 {font} 0 R >> >> /Contents {cn} 0 R >>").encode()))
    kids = b"[" + b" ".join(b"%d 0 R" % p for p in pns) + b"]"
    pgs = b.add(b"<< /Type /Pages /Kids " + kids + b" /Count %d >>" % len(pns))
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


def make_hybrid_xref_pdf(variant: str = "omitted") -> bytes:
    """Hybrid-reference file (ISO 32000-1 §7.5.8.4): a classic xref table
    whose trailer carries /XRefStm pointing at an xref STREAM holding the
    real offsets for the page+contents objects.

    - ``omitted``: the table's subsections SKIP the hidden objects, so
      the stream's gap-fill entries resolve them (text extracts)
    - ``free-markers``: the table marks them free — and since free
      entries are stored first-writer-wins, they BLOCK the stream's
      offsets (pdf.js readXRefTable :58229): the page comes back empty
      in BOTH engines
    """
    b = PDFBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    cn = b.add_stream(b"", b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (hybrid xref works) Tj ET", "flate")
    pages_num = len(b.objects) + 2
    pn = b.add(f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 {font} 0 R >> >> /Contents {cn} 0 R >>".encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())

    # lay out objects manually: body, xref STREAM (real offsets for the
    # page+contents objects), classic TABLE marking those objects free
    out = bytearray(b"%PDF-1.5\n")
    offs: dict[int, int] = {}
    for i, body in enumerate(b.objects, start=1):
        offs[i] = len(out)
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    n_objs = len(b.objects)
    xstm_num = n_objs + 1
    # xref stream covers 0..xstm_num; hidden objects (cn, pn) get their
    # true offsets here, everything else mirrors the table
    w1, w2, w3 = 1, 4, 2
    rows = bytearray()
    entries = {0: (0, 0, 65535)}
    for i in range(1, n_objs + 1):
        entries[i] = (1, offs[i], 0)
    xstm_off = len(out)
    entries[xstm_num] = (1, xstm_off, 0)
    for i in range(0, xstm_num + 1):
        t, o, g = entries[i]
        rows += bytes([t]) + o.to_bytes(w2, "big") + g.to_bytes(w3, "big")
    xdata = zlib.compress(bytes(rows))
    out += b"%d 0 obj\n" % xstm_num
    out += (b"<< /Type /XRef /Size %d /W [%d %d %d] /Root %d 0 R "
            b"/Filter /FlateDecode /Length %d >>\nstream\n"
            % (xstm_num + 1, w1, w2, w3, len(b.objects), len(xdata)))
    out += xdata + b"\nendstream\nendobj\n"
    # classic table; catalog/pages/font present so table-only readers
    # still see a skeleton
    table_pos = len(out)
    hidden = {cn, pn}
    if variant == "free-markers":
        out += b"xref\n0 %d\n" % (n_objs + 1)
        out += b"0000000000 65535 f \n"
        for i in range(1, n_objs + 1):
            if i in hidden:
                out += b"0000000000 65535 f \n"
            else:
                out += b"%010d 00000 n \n" % offs[i]
    else:  # omitted: contiguous subsections that skip the hidden objects
        out += b"xref\n"
        runs: list[list[int]] = []
        for i in range(0, n_objs + 1):
            if i in hidden:
                continue
            if runs and runs[-1][0] + runs[-1][1] == i:
                runs[-1][1] += 1
            else:
                runs.append([i, 1])
        for start, count in runs:
            out += b"%d %d\n" % (start, count)
            for i in range(start, start + count):
                if i == 0:
                    out += b"0000000000 65535 f \n"
                else:
                    out += b"%010d 00000 n \n" % offs[i]
    out += (b"trailer\n<< /Size %d /Root %d 0 R /XRefStm %d >>\n"
            b"startxref\n%d\n%%%%EOF\n"
            % (n_objs + 1, len(b.objects), xstm_off, table_pos))
    return bytes(out)


def make_knowncmd_pdf() -> bytes:
    """Glued operator runs exercising the Lexer knownCommands boundary
    rule (build/pdf.worker.js:14295-14307 with EvaluatorPreprocessor's
    opMap, :38598): "ETq" lexes as ET + q, "QBT" as Q + BT, "BMCq" as
    BMC + q (the null "BM" intermediate keeps it whole), "falseTj"
    as the keyword false + Tj, "nullTj" as null + Tj, and an over-long
    (>128 chars) junk command aborts the page (FormatError)."""
    content = (
        b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (one) Tj ETq 2 0 0 2 10 10 cm "
        b"QBT /F1 12 Tf 1 0 0 1 72 650 Tm (two) Tj ET "
        b"/Tag BMCq QBT /F1 12 Tf 1 0 0 1 72 600 Tm (three) Tj ET EMC "
        b"BT /F1 12 Tf 1 0 0 1 72 550 Tm falseTj (four) Tj nullTj "
        b"(five) Tj ET")
    return _single_page_pdf(content)


def make_longcmd_pdf() -> bytes:
    """A >128-char command token in page 2's content stream: pdf.js
    throws FormatError ("Command token too long"), failing that page
    while page 1 still extracts (per-page absorb)."""
    b = PDFBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    c1 = b.add_stream(b"", b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (ok page) Tj ET", "flate")
    c2 = b.add_stream(b"", b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (gone) Tj ET "
                      + b"Z" * 140 + b" BT (tail) Tj ET", "flate")
    pages_num = len(b.objects) + 3
    p1 = b.add((f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font} 0 R >> >> /Contents {c1} 0 R >>").encode())
    p2 = b.add((f"<< /Type /Page /Parent {pages_num} 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font} 0 R >> >> /Contents {c2} 0 R >>").encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{p1} 0 R {p2} 0 R] /Count 2 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


def make_linearized_pdf(variant: str = "valid") -> bytes:
    """Linearized ("fast web view") layout exercising pdf.js's
    Linearization.create + the startXRef linearized branch
    (build/pdf.worker.js:14338-14385, :59432-59446, numPages :59501):
    object 1 is the linearization dict, the FIRST-page xref table sits
    right after its ``endobj`` (where the endobj-scan branch lands) and
    resolves the content to "LINEAR FRONT"; the tail ``startxref``
    points at a SECOND table whose entry for the content object picks an
    incremental-update copy saying "LINEAR TAIL".  A linearization-aware
    engine must extract FRONT; any invalid parameter must absorb to
    not-linearized and extract TAIL:

    - ``valid``: /L == stream length, N matches the page tree -> FRONT
    - ``n-overcount``: valid but /N 2 with a 1-page tree -> numpages 2,
      the missing page absorbs to an empty render ("\\n\\n" tail)
    - ``l-mismatch``: /L off by one -> TAIL (create() throws, absorbed)
    - ``bad-hints``: /H has 1 element -> TAIL
    - ``zero``: /Linearized 0 -> TAIL (first-gate null)
    """
    n_pages_decl = 2 if variant == "n-overcount" else 1

    def assemble(lin_l: int, lin_t: int) -> bytes:
        out = bytearray(b"%PDF-1.4\n")
        linz = 0 if variant == "zero" else 1
        hints = b"[35]" if variant == "bad-hints" else b"[35 120]"
        out += (b"1 0 obj\n<< /Linearized %d /L %010d /H %s /O 4 /E 700 "
                b"/N %d /T %010d >>\nendobj\n"
                % (linz, lin_l, hints, n_pages_decl, lin_t))
        front_xref = len(out)
        offs: dict[int, int] = {1: 9}

        def table(entry5: int, all_offs: dict[int, int]) -> bytes:
            t = bytearray(b"xref\n0 7\n0000000000 65535 f \n")
            for i in range(1, 7):
                o = entry5 if i == 5 else all_offs.get(i, 0)
                t += b"%010d 00000 n \n" % o
            t += b"trailer\n<< /Size 7 /Root 2 0 R >>\n"
            return bytes(t)

        # first pass uses zero offsets; the caller loops until stable
        out += table(offs.get(5, 0), offs)
        body = {
            2: b"<< /Type /Catalog /Pages 3 0 R >>",
            3: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
            4: (b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 6 0 R >> >> /Contents 5 0 R >>"),
            5: None,  # content, added below
            6: (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                b"/Encoding /WinAnsiEncoding >>"),
        }
        front = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (LINEAR FRONT) Tj ET"
        tail = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (LINEAR TAIL) Tj ET"
        for num in (2, 3, 4, 5, 6):
            offs[num] = len(out)
            if num == 5:
                out += (b"5 0 obj\n<< /Length %d >>\nstream\n" % len(front)
                        + front + b"\nendstream\nendobj\n")
            else:
                out += b"%d 0 obj\n" % num + body[num] + b"\nendobj\n"
        tail5 = len(out)
        out += (b"5 0 obj\n<< /Length %d >>\nstream\n" % len(tail)
                + tail + b"\nendstream\nendobj\n")
        tail_xref = len(out)
        out += table(tail5, offs)
        out += b"startxref\n%d\n%%%%EOF\n" % tail_xref
        # patch the two xref tables with the real offsets (fixed-width
        # entries keep every position stable)
        final = bytearray(out)
        front_tbl = table(offs[5], offs)
        final[front_xref:front_xref + len(front_tbl)] = front_tbl
        tail_tbl = table(tail5, offs)
        final[tail_xref:tail_xref + len(tail_tbl)] = tail_tbl
        return bytes(final), front_xref, tail_xref

    blob, _, lin_t = assemble(0, 0)
    want_l = len(blob) + (1 if variant == "l-mismatch" else 0)
    blob, _, _ = assemble(want_l, lin_t)
    # re-assembling with real L/T keeps length fixed (fixed-width fields)
    assert len(blob) == want_l - (1 if variant == "l-mismatch" else 0)
    return blob


def make_count_lie_pdf(count: int) -> bytes:
    """Non-linearized page tree whose catalog /Count LIES (pdf.js
    checkLastPage, build/pdf.worker.js:59988-60055): an over-count (> 1)
    fails the last-page fetch and self-heals to the actual tree size via
    getAllPageDicts; /Count 0 is accepted as-is (numPages <= 1 returns
    early) and renders nothing."""
    b = PDFBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                 b"/Encoding /WinAnsiEncoding >>")
    cn = b.add_stream(b"", b"BT /F1 12 Tf 1 0 0 1 72 700 Tm "
                      b"(count lie page) Tj ET", "flate")
    pages_num = len(b.objects) + 2
    pn = b.add((f"<< /Type /Page /Parent {pages_num} 0 R "
                f"/MediaBox [0 0 612 792] /Resources << /Font "
                f"<< /F1 {font} 0 R >> >> /Contents {cn} 0 R >>").encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count {count} >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    return b.build(root)


def make_catalog_version_pdf(catver: str | None) -> bytes:
    """Catalog /Version override probe (pdf.js get version
    :59774-59776 + catalog getter :42369-42378): a Name matching
    /^[1-9]\\.\\d$/ overrides the %PDF header version in
    documentInfo.PDFFormatVersion; anything else keeps the header's."""
    b = PDFBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                 b"/Encoding /WinAnsiEncoding >>")
    cn = b.add_stream(b"", b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (ver) Tj ET",
                      "flate")
    pages_num = len(b.objects) + 2
    pn = b.add((f"<< /Type /Page /Parent {pages_num} 0 R "
                f"/MediaBox [0 0 612 792] /Resources << /Font "
                f"<< /F1 {font} 0 R >> >> /Contents {cn} 0 R >>").encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    extra = f" /Version /{catver}" if catver else ""
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R{extra} >>".encode())
    return b.build(root)


def make_forminfo_pdf(variant: str) -> bytes:
    """documentInfo form/collection flag probes (pdf.js formInfo
    build/pdf.worker.js:59762-59806, _hasOnlyDocumentSignatures
    :59513-59536, collection/acroForm getters requiring NON-EMPTY
    dicts): empty-acroform, fields (text field -> AcroForm true),
    sig-visible (signature with a real /Rect -> AcroForm AND
    Signatures), sig-invisible-only (all-zero /Rect document signature
    -> Signatures true but AcroForm FALSE), xfa-array /
    xfa-empty-array, collection / collection-empty."""
    b = PDFBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                 b"/Encoding /WinAnsiEncoding >>")
    cn = b.add_stream(b"", b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (forms) Tj ET",
                      "flate")
    pages_num = len(b.objects) + 2
    pn = b.add((f"<< /Type /Page /Parent {pages_num} 0 R "
                f"/MediaBox [0 0 612 792] /Resources << /Font "
                f"<< /F1 {font} 0 R >> >> /Contents {cn} 0 R >>").encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    extra = ""
    if variant == "empty-acroform":
        extra = " /AcroForm << >>"
    elif variant == "fields":
        fld = b.add(b"<< /FT /Tx /T (name1) /Rect [0 0 100 20] >>")
        af = b.add(f"<< /Fields [{fld} 0 R] >>".encode())
        extra = f" /AcroForm {af} 0 R"
    elif variant == "sig-visible":
        fld = b.add(b"<< /FT /Sig /T (s1) /Rect [10 10 100 40] >>")
        af = b.add(f"<< /Fields [{fld} 0 R] /SigFlags 3 >>".encode())
        extra = f" /AcroForm {af} 0 R"
    elif variant == "sig-invisible-only":
        fld = b.add(b"<< /FT /Sig /T (s1) /Rect [0 0 0 0] >>")
        af = b.add(f"<< /Fields [{fld} 0 R] /SigFlags 3 >>".encode())
        extra = f" /AcroForm {af} 0 R"
    elif variant == "xfa-array":
        xs = b.add_stream(b"", b"<xdp:xdp/>", "flate")
        af = b.add(f"<< /Fields [] /XFA [(template) {xs} 0 R] >>".encode())
        extra = f" /AcroForm {af} 0 R"
    elif variant == "xfa-empty-array":
        af = b.add(b"<< /Fields [] /XFA [] >>")
        extra = f" /AcroForm {af} 0 R"
    elif variant == "collection":
        extra = " /Collection << /Type /Collection >>"
    elif variant == "collection-empty":
        extra = " /Collection << >>"
    elif variant.startswith("sig-str-"):
        # /SigFlags as a PDF STRING: JS computes `sigFlags & 1` which is
        # ToNumber → ToInt32 — '(0x3)' counts (hex → 3, bit 0 set) while
        # '(inf)' (NaN in JS), '(Infinity)' and '(1e999)' (±inf → 0) do
        # not; a Python int(float(s)) would crash with OverflowError on
        # the infinity spellings (ADVICE r3)
        lit = {"sig-str-inf": "inf", "sig-str-infinity": "Infinity",
               "sig-str-hex": "0x3", "sig-str-1e999": "1e999"}[variant]
        fld = b.add(b"<< /FT /Sig /T (s1) /Rect [10 10 100 40] >>")
        af = b.add(f"<< /Fields [{fld} 0 R] /SigFlags ({lit}) >>".encode())
        extra = f" /AcroForm {af} 0 R"
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R{extra} >>".encode())
    return b.build(root)


FORMINFO_VARIANTS = ("empty-acroform", "fields", "sig-visible",
                     "sig-invisible-only", "xfa-array", "xfa-empty-array",
                     "collection", "collection-empty",
                     "sig-str-inf", "sig-str-infinity", "sig-str-hex",
                     "sig-str-1e999")


def make_broken_kid_pdf() -> bytes:
    """checkLastPage parity probe (ADVICE r3): a nested page tree whose
    interior node carries a truthful /Count but one BROKEN kid (ref to a
    missing object).  pdf.js keeps the declared count of 3 — checkLastPage
    fetches only page index 2, and the /Count skip never touches the
    broken sibling — and renders page 2 as "" (per-page absorb) while
    pages 1 and 3 extract normally.  A full-tree flatten heals the count
    to 2 and mis-maps page 3's text onto page 2."""
    b = PDFBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                 b"/Encoding /WinAnsiEncoding >>")
    c1 = b.add_stream(b"", b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (alpha page) Tj ET",
                      "flate")
    c3 = b.add_stream(b"", b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (gamma page) Tj ET",
                      "flate")
    # forward numbering: p1, p3, interior, root Pages, catalog
    n0 = len(b.objects)
    interior = n0 + 3
    root_pages = n0 + 4
    missing = 90                      # object number never emitted
    p1 = b.add((f"<< /Type /Page /Parent {interior} 0 R "
                f"/MediaBox [0 0 612 792] /Resources << /Font "
                f"<< /F1 {font} 0 R >> >> /Contents {c1} 0 R >>").encode())
    p3 = b.add((f"<< /Type /Page /Parent {root_pages} 0 R "
                f"/MediaBox [0 0 612 792] /Resources << /Font "
                f"<< /F1 {font} 0 R >> >> /Contents {c3} 0 R >>").encode())
    b.add((f"<< /Type /Pages /Parent {root_pages} 0 R "
           f"/Kids [{p1} 0 R {missing} 0 R] /Count 2 >>").encode())
    b.add((f"<< /Type /Pages /Kids [{interior} 0 R {p3} 0 R] "
           f"/Count 3 >>").encode())
    root = b.add(f"<< /Type /Catalog /Pages {root_pages} 0 R >>".encode())
    return b.build(root)


def make_broken_kid_inherited_pdf() -> bytes:
    """make_broken_kid_pdf variant where /Resources and /MediaBox live on
    the ROOT Pages node only: the targeted getPage descent must apply
    tree inheritance for pages 1 and 3 to extract at all (exercises
    _page_dict_at's inherited-attribute accumulation against the live
    reference)."""
    b = PDFBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                 b"/Encoding /WinAnsiEncoding >>")
    c1 = b.add_stream(b"", b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (alpha page) Tj ET",
                      "flate")
    c3 = b.add_stream(b"", b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (gamma page) Tj ET",
                      "flate")
    n0 = len(b.objects)
    interior = n0 + 3
    root_pages = n0 + 4
    missing = 90
    p1 = b.add((f"<< /Type /Page /Parent {interior} 0 R "
                f"/Contents {c1} 0 R >>").encode())
    p3 = b.add((f"<< /Type /Page /Parent {root_pages} 0 R "
                f"/Contents {c3} 0 R >>").encode())
    b.add((f"<< /Type /Pages /Parent {root_pages} 0 R "
           f"/Kids [{p1} 0 R {missing} 0 R] /Count 2 >>").encode())
    b.add((f"<< /Type /Pages /Kids [{interior} 0 R {p3} 0 R] /Count 3 "
           f"/MediaBox [0 0 612 792] /Resources << /Font "
           f"<< /F1 {font} 0 R >> >> >>").encode())
    root = b.add(f"<< /Type /Catalog /Pages {root_pages} 0 R >>".encode())
    return b.build(root)


INFO_TYPED_VARIANTS = {
    "trapped-custom": b"<< /Title (T) /Trapped /True /MyNum 7 /MyReal 2.5 "
                      b"/MyBool true /MyName /NmVal /MyStr (sv) >>",
    "wrongtype-std": b"<< /Title 5 /Author (A) /Subject /NotAString "
                     b"/Producer true >>",
    "trapped-bad": b"<< /Trapped (True) /Trapped2 /Unknown >>",
    "custom-bad": b"<< /Arr [1 2] /Dct << /a 1 >> /Good (ok) >>",
}


def make_info_typed_pdf(variant: str) -> bytes:
    """Info-dictionary type-gate probes (pdf.js documentInfo key loop,
    build/pdf.worker.js:59830-59877): standard keys accept strings ONLY
    (wrong-typed keys skipped, never coerced), /Trapped accepts a Name
    only, custom keys accept string/number/boolean/Name and drop
    arrays/dicts."""
    b = PDFBuilder()
    font = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                 b"/Encoding /WinAnsiEncoding >>")
    cn = b.add_stream(b"", b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (info) Tj ET",
                      "flate")
    pages_num = len(b.objects) + 2
    pn = b.add((f"<< /Type /Page /Parent {pages_num} 0 R "
                f"/MediaBox [0 0 612 792] /Resources << /Font "
                f"<< /F1 {font} 0 R >> >> /Contents {cn} 0 R >>").encode())
    pgs = b.add(f"<< /Type /Pages /Kids [{pn} 0 R] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pgs} 0 R >>".encode())
    inum = b.add(INFO_TYPED_VARIANTS[variant])
    return b.build(root, info_num=inum)
