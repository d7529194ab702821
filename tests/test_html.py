"""HTML boilerplate-strip surface (north_rule: "HTML boilerplate strip
... DOM heuristics"): kernel unit behavior, the generator-truth
differential, and full interleaved-pipeline span-sequence equality over
a mixed pdf+html corpus on both join paths."""

import pyarrow.parquet as pq

from pdf_parse_new_ray.fixtures.htmlgen import make_seeded_html
from pdf_parse_new_ray.htmlkernel import (
    HtmlDocument, classify_blocks, extract_main_text, looks_like_html,
    tokenize_into_blocks,
)


def test_kernel_strips_boilerplate_keeps_content():
    html, expected, title = make_seeded_html(7)
    r = extract_main_text(html)
    assert r.text == expected
    assert r.title == title
    assert "Log in" not in r.text
    assert "cookies" not in r.text
    assert "Example Corp" not in r.text          # © footer dropped
    assert "fake" not in r.text                  # script payload dropped


def test_kernel_generator_differential_many_seeds():
    for seed in range(60):
        html, expected, title = make_seeded_html(seed)
        r = extract_main_text(html)
        assert r.text == expected, seed
        assert r.title == title, seed


def test_kernel_tolerates_malformed_markup():
    # unclosed tags, bare '<', rawtext to EOF, stray quotes in attrs
    cases = [
        b"<html><body><p>text with a bare < sign and more words "
        b"of the usual kind that we keep writing here",
        b"<html><body><p>abc<script>never closed",
        b"<html><body><div title='it\"s'>quoted <p>tail",
        b"<html>",
        b"",
        b"<html><body>" + b"<p>x" * 5000,
    ]
    for c in cases:
        HtmlDocument(c)  # must never raise


def test_kernel_entities_and_charset():
    html = ("<html><head><meta charset='utf-8'><title>T</title></head>"
            "<body><p>café &amp; t&eacute;l&#233;phone &#x41;</p>"
            "</body></html>").encode("utf-8")
    blocks, title = tokenize_into_blocks(html.decode("utf-8"))
    assert blocks[0].text == "café & téléphone A"


def test_kernel_br_pair_splits_blocks():
    blocks, _ = tokenize_into_blocks(
        "<body>first line<br>same block<br><br>second block</body>")
    texts = [b.text for b in blocks]
    assert texts == ["first line same block", "second block"]


def test_short_between_goods_promotes_cookie_banner_does_not():
    html, expected, _ = make_seeded_html(3, n_paras=4)
    doc = HtmlDocument(html)
    classes = {b.text: b.final_class for b in doc.blocks}
    assert classes.get("We use cookies.", "bad") == "bad"
    assert doc.main_text == expected


def test_sniff_routing():
    assert looks_like_html(b"  <!DOCTYPE HTML><html>")
    assert looks_like_html(b"<HTML lang='en'>")
    assert not looks_like_html(b"%PDF-1.7\n...")
    # a pdf header anywhere in the first KB wins even if markup precedes
    assert not looks_like_html(b"<junk>" + b" " * 100 + b"%PDF-1.4")
    assert not looks_like_html(b"plain text file")
    assert not looks_like_html(b"<svg><rect/></svg>")


def _oracle(base):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in r["spans"]]
        for r in pq.read_table(f"{base}/oracle_docs").to_pylist()
    }


def _check(docs, oracle):
    assert len(docs) == len(oracle)
    for d in docs:
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in d["spans"]]
        assert got == oracle[d["doc_id"]], d["doc_id"]


def test_mixed_corpus_broadcast_path(ray_session, html_corpus):
    from pdf_parse_new_ray.pipelines.extraction import extract_documents

    docs = extract_documents(
        f"{html_corpus}/documents_interleaved", f"{html_corpus}/media",
        out_dir=None, n_partitions=8,
    ).take_all()
    oracle = _oracle(html_corpus)
    _check(docs, oracle)
    # the corpus really is mixed: both html and pdf media spans present
    kinds = {s["kind"] for d in docs for s in d["spans"]}
    assert {"text", "pdf", "html"} <= kinds


def test_mixed_corpus_hash_join_path(ray_session, html_corpus):
    from pdf_parse_new_ray.pipelines.extraction import extract_documents

    docs = extract_documents(
        f"{html_corpus}/documents_interleaved", f"{html_corpus}/media",
        out_dir=None, n_partitions=8, join_strategy="hash",
    ).take_all()
    _check(docs, _oracle(html_corpus))
