"""pdfkernel — from-scratch pure-Python PDF text extraction.

Re-implements the *behavior* of the reference pdf-parse-new / pdf.js
extraction stack (see SURVEY.md §2) with no code copied: COS object model,
xref/trailer, stream filters, content-stream interpretation, font decode,
and pdf.js-parity span assembly.
"""

from .api import parse_pdf, parse_doc, probe_numpages, render_page_text, extract_page_texts
from .cos import PDFError
from .document import PDFDocument
from .extract import TextExtractor

__all__ = [
    "parse_pdf", "parse_doc", "probe_numpages", "render_page_text",
    "extract_page_texts", "PDFError", "PDFDocument", "TextExtractor",
]
