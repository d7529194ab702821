"""PDF fixtures with embedded image XObjects across the kernel's codec
set: JBIG2Decode (with a JBIG2Globals symbol dictionary), JPXDecode,
DCTDecode, CCITTFaxDecode (G4) and raw FlateDecode samples.  Text
extraction over these must be unaffected (the reference's extractor
skips non-Form XObjects); the m_pdf_images surface decodes them."""

from __future__ import annotations

import numpy as np

from .jbig2gen import build_symbol_text_chunks
from .jpxgen import encode_jpx
from .pdfgen import PDFBuilder, _escape_pdf_text


def make_images_pdf(seed: int = 0) -> tuple[bytes, dict]:
    """Returns (pdf_bytes, expected) where expected maps image resource
    name -> (filter, width, height).  One page, text + five images."""
    rng = np.random.RandomState(seed)
    b = PDFBuilder()

    # JBIG2: symbol dictionary in a separate globals stream
    glyphs = [[[0, 1], [1, 1], [1, 0]], [[1, 1, 1], [0, 1, 0], [0, 1, 0]]]
    placements = [(0, 1, 1), (1, 5, 1), (0, 9, 2), (1, 2, 7)]
    globals_chunk, image_chunk = build_symbol_text_chunks(
        16, 12, glyphs, placements)
    g_num = b.add_stream(b"", globals_chunk, None)
    jbig2_num = b.add_stream(
        b"/Type /XObject /Subtype /Image /Width 16 /Height 12 "
        b"/BitsPerComponent 1 /ColorSpace /DeviceGray "
        b"/Filter /JBIG2Decode "
        + f"/DecodeParms << /JBIG2Globals {g_num} 0 R >> ".encode(),
        image_chunk, None)

    # JPEG2000 raw codestream
    jpx_img = rng.randint(0, 256, (11, 13)).astype(np.uint8)
    jpx_num = b.add_stream(
        b"/Type /XObject /Subtype /Image /Width 13 /Height 11 "
        b"/BitsPerComponent 8 /ColorSpace /DeviceGray /Filter /JPXDecode ",
        encode_jpx(jpx_img, levels=1), None)

    # baseline JPEG
    from .jpeggen import encode_baseline_jpeg

    dct_img = rng.randint(0, 256, (10, 14)).astype(np.uint8)
    dct_num = b.add_stream(
        b"/Type /XObject /Subtype /Image /Width 14 /Height 10 "
        b"/BitsPerComponent 8 /ColorSpace /DeviceGray /Filter /DCTDecode ",
        encode_baseline_jpeg(dct_img), None)

    # CCITT G4
    from .ccittgen import encode_g4

    fax_img = (rng.rand(9, 16) > 0.6).astype(np.uint8)
    fax_num = b.add_stream(
        b"/Type /XObject /Subtype /Image /Width 16 /Height 9 "
        b"/BitsPerComponent 1 /ColorSpace /DeviceGray "
        b"/Filter /CCITTFaxDecode "
        b"/DecodeParms << /K -1 /Columns 16 /Rows 9 >> ",
        encode_g4(fax_img), None)

    # raw gray behind Flate
    raw_img = rng.randint(0, 256, (6, 8)).astype(np.uint8)
    raw_num = b.add_stream(
        b"/Type /XObject /Subtype /Image /Width 8 /Height 6 "
        b"/BitsPerComponent 8 /ColorSpace /DeviceGray ",
        raw_img.tobytes(), "flate")

    text = "Images fixture page with five embedded codecs."
    content = (b"BT /F1 12 Tf 50 700 Td (" + _escape_pdf_text(text)
               + b") Tj ET\n")
    for i, num in enumerate([jbig2_num, jpx_num, dct_num, fax_num, raw_num]):
        content += (f"q 40 0 0 30 {60 + i * 90} 600 cm /Im{i} Do Q\n"
                    .encode())
    content_num = b.add_stream(b"", content, "flate")
    font_num = b.add(b"<< /Type /Font /Subtype /Type1 "
                     b"/BaseFont /Helvetica >>")
    xobj = " ".join(
        f"/Im{i} {num} 0 R" for i, num in
        enumerate([jbig2_num, jpx_num, dct_num, fax_num, raw_num]))
    page_num = b.add(
        (f"<< /Type /Page /Parent PAGES 0 R /MediaBox [0 0 612 792] "
         f"/Contents {content_num} 0 R /Resources << "
         f"/Font << /F1 {font_num} 0 R >> /XObject << {xobj} >> >> >>")
        .encode())
    pages_num = b.add(
        f"<< /Type /Pages /Kids [{page_num} 0 R] /Count 1 >>".encode())
    # patch the parent back-reference
    b.objects[page_num - 1] = b.objects[page_num - 1].replace(
        b"PAGES", str(pages_num).encode())
    root_num = b.add(f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode())
    pdf = b.build(root_num)
    expected = {
        "Im0": ("JBIG2Decode", 16, 12),
        "Im1": ("JPXDecode", 13, 11),
        "Im2": ("DCTDecode", 14, 10),
        "Im3": ("CCITTFaxDecode", 16, 9),
        "Im4": ("raw", 8, 6),
    }
    return pdf, expected
