"""XMP metadata parity: the parsed Metadata surface of parse_pdf.

Expected values locked against the LIVE reference engine via
tools/differential.py's full-surface runner (every variant verified
exact — parsed map, repaired raw serialization, info, text — at
introduction; the xmp-* cases stay in the rotating sweep).
Reference semantics: catalog metadata getter
build/pdf.worker.js:42421-42446, MetadataParser :39732,
SimpleXMLParser :39655, display Metadata build/pdf.js:14428.
"""

from pdf_parse_new_ray.fixtures import pdfgen
from pdf_parse_new_ray.pdfkernel import parse_pdf
from pdf_parse_new_ray.pdfkernel.xmp import Metadata, parse_xmp


def _meta(variant):
    return parse_pdf(pdfgen.make_xmp_metadata_pdf(variant))["metadata"]


def test_rich_xmp_parses_to_reference_map():
    m = _meta("rich")
    assert isinstance(m, Metadata)
    assert m.get_all() == {
        # lowercased names; entities resolved; unknown entity kept
        "dc:title": "T&T AB",
        "dc:creator": ["Alpha One", "Beta  Two"],   # rdf:Seq array
        "dc:subject": ["k1", "k2"],                 # rdf:Bag array
        "dc:format": "overwritten/fmt",             # later Description wins
        "pdfaid:part": "",                          # self-closed element
        "xmp:createdate": "2009-04-01T16:39:25-07:00",  # CDATA
        "xmp:creatortool": "gen &unknown; tool",
    }
    assert m.get("dc:title") == "T&T AB"
    assert m.get("nope") is None
    assert m.has("dc:subject") and not m.has("dc:Title")  # keys lowercased
    assert "<rdf:RDF" in m.get_raw()


def test_utf16_octal_repair():
    # repairable payload: parsed value decodes the UTF-16BE escapes
    m = _meta("utf16repair-clean")
    assert m.get_all() == {"xmp:badvalue": "Te&stА"}
    # the raw '<' inside the escaped run aborts the capture -> parse
    # error -> EMPTY map but metadata object kept (both engines agree)
    m2 = _meta("utf16repair")
    assert isinstance(m2, Metadata) and m2.get_all() == {}


def test_malformed_and_gate_variants():
    # unclosed element: parse error, empty map, object kept
    m = _meta("malformed")
    assert isinstance(m, Metadata) and m.get_all() == {}
    # invalid UTF-8 stream bytes -> metadata null
    assert _meta("invalid-utf8") is None
    # /Metadata not an indirect Ref -> null
    assert _meta("direct-dict") is None
    # stream without /Type /Metadata -> null
    assert _meta("wrong-type") is None


def test_parse_xmp_unit_edges():
    # entity edges: hex/decimal code points, out-of-range raises at the
    # caller (catalog absorbs); whitespace-only text skipped
    m = parse_xmp(
        'junk-before<rdf:RDF><rdf:Description>'
        "<a:K>&#x2603;&#9731;</a:K>"
        "</rdf:Description></rdf:RDF>")
    assert m.get_all() == {"a:k": "☃☃"}
    assert m.get_raw().startswith("<rdf:RDF")  # leading junk stripped
    # dc:creator without a sequence child -> []
    m2 = parse_xmp("<rdf:RDF><rdf:Description>"
                   "<dc:creator>plain</dc:creator>"
                   "</rdf:Description></rdf:RDF>")
    assert m2.get_all() == {"dc:creator": []}


def test_incremental_update_info_not_merged():
    """Trailer keys never merge across /Prev: the update trailer has no
    /Info, so Title/Producer vanish even though the ORIGINAL trailer had
    them (pdf.js topDict rule; caught by the full-surface sweep)."""
    pdf, _ = pdfgen.make_incremental_update_pdf()
    info = parse_pdf(pdf)["info"]
    assert "Title" not in info and "Producer" not in info
