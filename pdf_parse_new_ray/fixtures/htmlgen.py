"""Deterministic HTML page generator with generator-computed ground truth.

Produces web-like pages — nav menus, login header, sidebar link lists,
cookie banner, script/style payloads, © footer — around planted main
content (headings + paragraphs).  The expected main text is computed BY
CONSTRUCTION (the generator plants blocks whose jusText classification
is unambiguous and asserts the margin numerically), never by running the
extraction kernel, so tests that compare kernel output to this truth are
a real oracle (same discipline as fixtures/pdfgen.py's expected text).

Planted-block contract (see htmlkernel thresholds):
  good paragraph: >220 collapsed chars, stopword density >= 0.40, 0 links
  heading: 2-4 plain words directly above a good paragraph (short →
           promoted via the heading/neighbour rules)
  bridge: one short plain sentence BETWEEN two good paragraphs
          (short with a good neighbour → good)
  boilerplate: link lists (link density 1.0), © footer, cookie banner
          surrounded by bad blocks, script/style payloads with fake tags
"""

from __future__ import annotations

import random
from typing import List, Tuple

from ..htmlkernel import LENGTH_HIGH, STOPWORDS, STOPWORDS_HIGH

_CONTENT_WORDS = [
    "pipeline", "dataset", "stream", "compression", "cluster", "window",
    "schema", "partition", "throughput", "vector", "battery", "garden",
    "harbor", "journey", "market", "mirror", "mountain", "notebook",
    "orchard", "puzzle", "river", "signal", "telescope", "village",
    "whisper", "yardstick", "zeppelin", "lantern", "compass", "meadow",
]

_STOP_SAMPLE = sorted(STOPWORDS)

_NAV_WORDS = ["Home", "About", "Products", "Pricing", "Blog", "Careers",
              "Support", "Contact", "Docs", "Status", "Legal", "Press"]


def _good_paragraph(rng: random.Random) -> str:
    """A paragraph guaranteed good: alternate stopwords and content words
    so density lands well above STOPWORDS_HIGH, length above LENGTH_HIGH."""
    words: List[str] = []
    while len(" ".join(words)) <= LENGTH_HIGH + 40:
        # pattern: stop stop content stop content  → density 0.6
        words.append(rng.choice(_STOP_SAMPLE))
        words.append(rng.choice(_STOP_SAMPLE))
        words.append(rng.choice(_CONTENT_WORDS))
        words.append(rng.choice(_STOP_SAMPLE))
        words.append(rng.choice(_CONTENT_WORDS))
    text = " ".join(words)
    text = text[0].upper() + text[1:] + "."
    # numeric margin assert (keeps the truth honest if lists ever change)
    toks = text.split(" ")
    dens = sum(1 for w in toks if w.strip(".,;:!?").lower() in STOPWORDS) / len(toks)
    assert dens >= STOPWORDS_HIGH + 0.05, dens
    assert len(text) > LENGTH_HIGH + 20
    return text


def _heading(rng: random.Random) -> str:
    return " ".join(rng.choice(_CONTENT_WORDS).capitalize()
                    for _ in range(rng.randint(2, 4)))


def _bridge(rng: random.Random) -> str:
    return ("Figure %d shows the %s."
            % (rng.randint(1, 99), rng.choice(_CONTENT_WORDS)))


def _nav(rng: random.Random) -> str:
    items = rng.sample(_NAV_WORDS, rng.randint(4, 8))
    lis = "".join('<li><a href="/%s">%s</a></li>' % (w.lower(), w) for w in items)
    return "<nav><ul>%s</ul></nav>" % lis


def _sidebar(rng: random.Random) -> str:
    items = rng.sample(_NAV_WORDS, rng.randint(3, 6))
    return "<aside>%s</aside>" % " ".join(
        '<a href="/t/%s">%s</a>' % (w.lower(), w) for w in items)


def make_seeded_html(seed: int, n_paras: int | None = None) -> Tuple[bytes, str, str]:
    """Returns (html_bytes, expected_main_text, title)."""
    rng = random.Random(seed)
    if n_paras is None:
        n_paras = rng.randint(2, 5)
    title = "%s %s — Example Site" % (_heading(rng), rng.randint(100, 999))

    expected_parts: List[str] = []
    body_parts: List[str] = []
    body_parts.append(_nav(rng))
    body_parts.append('<header><a href="/login">Log in</a> | '
                      '<a href="/signup">Sign up</a></header>')
    if rng.random() < 0.5:
        # cookie banner: short, neighboured by bad blocks on both sides
        body_parts.append("<div class='cookie'>We use cookies.</div>")
    body_parts.append('<script>var page = "<p>fake</p>"; /* <div> */</script>')
    body_parts.append("<style>p { margin: 0 } /* </p> */</style>")
    body_parts.append("<main>")
    for i in range(n_paras):
        if rng.random() < 0.6:
            h = _heading(rng)
            tag = rng.choice(["h1", "h2", "h3"])
            body_parts.append("<%s>%s</%s>" % (tag, h, tag))
            expected_parts.append(h)
        p = _good_paragraph(rng)
        # scatter a couple of entities through a raw copy; the expected
        # text carries the decoded characters
        raw = p.replace(" and ", " &amp; ", 1) if rng.random() < 0.4 else p
        exp = raw.replace("&amp;", "&")
        body_parts.append("<p>%s</p>" % raw)
        expected_parts.append(exp)
        if i + 1 < n_paras and rng.random() < 0.35:
            b = _bridge(rng)
            body_parts.append("<p>%s</p>" % b)
            expected_parts.append(b)   # short between goods → promoted
    body_parts.append("</main>")
    body_parts.append(_sidebar(rng))
    body_parts.append("<footer>&copy; 2026 Example Corp. "
                      "All rights reserved.</footer>")

    html = ("<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\">"
            "<title>%s</title></head>\n<body>\n%s\n</body></html>"
            % (title, "\n".join(body_parts)))
    return html.encode("utf-8"), "\n\n".join(expected_parts), title
