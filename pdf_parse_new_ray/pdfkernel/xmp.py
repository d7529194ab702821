"""XMP metadata parsing — parity with the reference's MetadataParser.

The reference parses the catalog's /Metadata XML stream with a
forgiving hand-rolled XML scanner (SimpleXMLParser, lowercased node
names), repairs a legacy producer bug (octal-escaped UTF-16BE values),
and exposes a Metadata object with get/getAll/has/getRaw
(build/pdf.worker.js:39335 XMLParserBase, :39540 SimpleDOMNode,
:39655 SimpleXMLParser, :39732 MetadataParser; display Metadata class
build/pdf.js:14428).  This module mirrors those exact semantics,
including the error edges: malformed elements abort the parse (empty
map), exceptions from entity resolution or unclosed-element sibling
walks propagate (the catalog getter absorbs them to a null metadata),
and closing-tag names are never validated.
"""

from __future__ import annotations

import re
from typing import Any, Optional

_WS = " \n\r\t"


def _is_ws_string(s: str) -> bool:
    return all(c in _WS for c in s)


def _js_parse_int(s: str, base: int) -> Optional[int]:
    """JS parseInt: optional sign, leading valid digits, trailing junk
    ignored; None (NaN) when no digit parses."""
    i = 0
    n = len(s)
    while i < n and s[i] in _WS:
        i += 1
    sign = 1
    if i < n and s[i] in "+-":
        sign = -1 if s[i] == "-" else 1
        i += 1
    digits = ""
    alphabet = "0123456789abcdefghijklmnopqrstuvwxyz"[:base]
    while i < n and s[i].lower() in alphabet:
        digits += s[i]
        i += 1
    if not digits:
        return None
    return sign * int(digits, base)


def _from_code_point(cp: Optional[int]) -> str:
    """String.fromCodePoint semantics: RangeError (here ValueError) on
    NaN / negative / > 0x10FFFF — the caller's catalog-level absorb turns
    that into a null metadata, exactly like the reference."""
    if cp is None or cp < 0 or cp > 0x10FFFF:
        raise ValueError("invalid code point")
    return chr(cp)


_ENTITY_RE = re.compile(r"&([^;]+);")


def _resolve_entities(s: str) -> str:
    def sub(m: "re.Match[str]") -> str:
        entity = m.group(1)
        if entity[:2] == "#x":
            return _from_code_point(_js_parse_int(entity[2:], 16))
        if entity[:1] == "#":
            return _from_code_point(_js_parse_int(entity[1:], 10))
        return {"lt": "<", "gt": ">", "amp": "&",
                "quot": '"', "apos": "'"}.get(entity, f"&{entity};")

    return _ENTITY_RE.sub(sub, s)


class SimpleDOMNode:
    __slots__ = ("node_name", "node_value", "child_nodes", "parent_node",
                 "attributes")

    def __init__(self, node_name: str, node_value: Optional[str] = None):
        self.node_name = node_name
        self.node_value = node_value
        self.child_nodes: Optional[list["SimpleDOMNode"]] = None
        self.parent_node: Optional["SimpleDOMNode"] = None
        self.attributes: Optional[list] = None

    @property
    def first_child(self) -> Optional["SimpleDOMNode"]:
        return self.child_nodes[0] if self.child_nodes else None

    @property
    def next_sibling(self) -> Optional["SimpleDOMNode"]:
        # parity: parent_node is only assigned when the enclosing element
        # CLOSES; walking siblings of a never-closed element raises, and
        # the catalog-level absorb nulls the metadata (JS: null.childNodes
        # TypeError)
        siblings = self.parent_node.child_nodes  # type: ignore[union-attr]
        if not siblings:
            return None
        try:
            idx = siblings.index(self)
        except ValueError:
            return None
        return siblings[idx + 1] if idx + 1 < len(siblings) else None

    @property
    def text_content(self) -> str:
        if self.child_nodes is None:
            return self.node_value or ""
        return "".join(c.text_content for c in self.child_nodes)

    def has_child_nodes(self) -> bool:
        return bool(self.child_nodes)


class _ParseError(Exception):
    """Internal: any onError code — parseFromString returns None."""


class SimpleXMLParser:
    """The reference's forgiving scanner with lowerCaseName=True (the
    only mode MetadataParser uses).  Attributes are parsed (malformed
    attributes abort) but not retained."""

    def parse_from_string(self, data: str) -> Optional[SimpleDOMNode]:
        self._fragment: list[SimpleDOMNode] = []
        self._stack: list[list[SimpleDOMNode]] = []
        try:
            self._parse_xml(data)
        except _ParseError:
            return None
        if not self._fragment:
            return None
        return self._fragment[0]  # documentElement

    # -- element callbacks -------------------------------------------
    def _on_text(self, text: str) -> None:
        if _is_ws_string(text):
            return
        self._fragment.append(SimpleDOMNode("#text", text))

    def _on_cdata(self, text: str) -> None:
        self._fragment.append(SimpleDOMNode("#text", text))

    def _on_begin(self, name: str, is_empty: bool) -> None:
        node = SimpleDOMNode(name.lower())
        node.child_nodes = []
        self._fragment.append(node)
        if not is_empty:
            self._stack.append(self._fragment)
            self._fragment = node.child_nodes

    def _on_end(self, _name: str) -> None:
        # closing-tag NAME IS IGNORED by the reference
        self._fragment = self._stack.pop() if self._stack else []
        if not self._fragment:
            return
        last = self._fragment[-1]
        if last.child_nodes:
            for child in last.child_nodes:
                child.parent_node = last

    # -- scanner ------------------------------------------------------
    def _parse_content(self, s: str, start: int):
        """Returns (name, parsed_len) or None on malformed attributes."""
        pos = start
        n = len(s)

        def skip_ws() -> None:
            nonlocal pos
            while pos < n and s[pos] in _WS:
                pos += 1

        while pos < n and s[pos] not in _WS and s[pos] != ">" and s[pos] != "/":
            pos += 1
        name = s[start:pos]
        skip_ws()
        while pos < n and s[pos] != ">" and s[pos] != "/" and s[pos] != "?":
            skip_ws()
            while pos < n and s[pos] not in _WS and s[pos] != "=":
                pos += 1
            skip_ws()
            if pos >= n or s[pos] != "=":
                return None
            pos += 1
            skip_ws()
            if pos >= n or s[pos] not in "\"'":
                return None
            quote = s[pos]
            pos += 1
            end = s.find(quote, pos)
            if end < 0:
                return None
            _resolve_entities(s[pos:end])  # may raise (parity)
            pos = end + 1
            skip_ws()
        return name, pos - start

    def _parse_pi(self, s: str, start: int) -> int:
        pos = start
        n = len(s)
        while (pos < n and s[pos] not in _WS and s[pos] != ">"
               and s[pos] != "?" and s[pos] != "/"):
            pos += 1
        while pos < n and not (s[pos] == "?" and pos + 1 < n
                               and s[pos + 1] == ">"):
            pos += 1
        return pos - start

    def _parse_xml(self, s: str) -> None:
        i = 0
        n = len(s)
        while i < n:
            ch = s[i]
            j = i
            if ch == "<":
                j += 1
                ch2 = s[j] if j < n else ""
                if ch2 == "/":
                    j += 1
                    q = s.find(">", j)
                    if q < 0:
                        raise _ParseError("UnterminatedElement")
                    self._on_end(s[j:q])
                    j = q + 1
                elif ch2 == "?":
                    j += 1
                    parsed = self._parse_pi(s, j)
                    if s[j + parsed:j + parsed + 2] != "?>":
                        raise _ParseError("UnterminatedXmlDeclaration")
                    j += parsed + 2
                elif ch2 == "!":
                    if s[j + 1:j + 3] == "--":
                        q = s.find("-->", j + 3)
                        if q < 0:
                            raise _ParseError("UnterminatedComment")
                        j = q + 3
                    elif s[j + 1:j + 8] == "[CDATA[":
                        q = s.find("]]>", j + 8)
                        if q < 0:
                            raise _ParseError("UnterminatedCdat")
                        self._on_cdata(s[j + 8:q])
                        j = q + 3
                    elif s[j + 1:j + 8] == "DOCTYPE":
                        q2 = s.find("[", j + 8)
                        complex_dt = False
                        q = s.find(">", j + 8)
                        if q < 0:
                            raise _ParseError("UnterminatedDoctype")
                        if q2 > 0 and q > q2:
                            q = s.find("]>", j + 8)
                            if q < 0:
                                raise _ParseError("UnterminatedDoctype")
                            complex_dt = True
                        j = q + (2 if complex_dt else 1)
                    else:
                        raise _ParseError("MalformedElement")
                else:
                    content = self._parse_content(s, j)
                    if content is None:
                        raise _ParseError("MalformedElement")
                    name, parsed = content
                    is_closed = False
                    if s[j + parsed:j + parsed + 2] == "/>":
                        is_closed = True
                    elif s[j + parsed:j + parsed + 1] != ">":
                        raise _ParseError("UnterminatedElement")
                    self._on_begin(name, is_closed)
                    j += parsed + (2 if is_closed else 1)
            else:
                while j < n and s[j] != "<":
                    j += 1
                self._on_text(_resolve_entities(s[i:j]))
            i = j


# ---------------------------------------------------------------------------
# repair + rdf walk (MetadataParser, build/pdf.worker.js:39732)
# ---------------------------------------------------------------------------

_OCTAL_RE = re.compile(r"\\([0-3])([0-7])([0-7])")
_U16_RE = re.compile(r">\\376\\377([^<]+)")
_REPAIR_ENT_RE = re.compile(r"&(amp|apos|gt|lt|quot);")


def _repair(data: str) -> str:
    data = re.sub(r"^[^<]+", "", data, count=1)

    def fix(m: "re.Match[str]") -> str:
        codes = m.group(1)
        codes = _OCTAL_RE.sub(
            lambda c: chr(int(c.group(1)) * 64 + int(c.group(2)) * 8
                          + int(c.group(3))), codes)
        codes = _REPAIR_ENT_RE.sub(
            lambda e: {"amp": "&", "apos": "'", "gt": ">",
                       "lt": "<", "quot": '"'}[e.group(1)], codes)
        buf = [">"]
        for i in range(0, len(codes), 2):
            if i + 1 >= len(codes):
                # JS NaN arithmetic edge: charCodeAt OOB -> NaN ->
                # "&#x" + "NaN".substring(1) + ";"
                buf.append("&#xaN;")
                continue
            code = ord(codes[i]) * 256 + ord(codes[i + 1])
            if 32 <= code < 127 and code not in (60, 62, 38):
                buf.append(chr(code))
            else:
                buf.append("&#x%04x;" % code)
        return "".join(buf)

    return _U16_RE.sub(fix, data)


class Metadata:
    """Parity with the display-layer Metadata (build/pdf.js:14428):
    get/getAll/has over the parsed map plus getRaw for the REPAIRED
    serialization.  snake_case aliases provided for Python callers."""

    def __init__(self, parsed: dict, raw: str):
        self._map = parsed
        self._data = raw

    def get(self, name: str) -> Any:
        return self._map.get(name)

    def get_all(self) -> dict:
        return dict(self._map)

    def has(self, name: str) -> bool:
        return name in self._map

    def get_raw(self) -> str:
        return self._data

    # JS-style aliases
    getAll = get_all
    getRaw = get_raw

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Metadata({self._map!r})"


def parse_xmp(data: str) -> Metadata:
    """MetadataParser: repair, scan, walk rdf:rdf/rdf:description.
    Raises on the same edges the reference throws on (the caller's
    catalog getter absorbs to None)."""
    data = _repair(data)
    doc = SimpleXMLParser().parse_from_string(data)
    meta: dict[str, Any] = {}
    if doc is not None:
        _walk_rdf(doc, meta)
    return Metadata(meta, data)


def _get_sequence(entry: SimpleDOMNode) -> Optional[list[SimpleDOMNode]]:
    if entry.node_name not in ("rdf:bag", "rdf:seq", "rdf:alt"):
        return None
    return [n for n in (entry.child_nodes or []) if n.node_name == "rdf:li"]


def _walk_rdf(doc: SimpleDOMNode, out: dict) -> None:
    rdf: Optional[SimpleDOMNode] = doc
    if rdf.node_name != "rdf:rdf":
        rdf = rdf.first_child
        while rdf is not None and rdf.node_name != "rdf:rdf":
            rdf = rdf.next_sibling  # may raise on unclosed parents (parity)
    if rdf is None or rdf.node_name != "rdf:rdf" or not rdf.has_child_nodes():
        return
    for desc in rdf.child_nodes or []:
        if desc.node_name != "rdf:description":
            continue
        for entry in desc.child_nodes or []:
            name = entry.node_name
            if name == "#text":
                continue
            if name in ("dc:creator", "dc:subject"):
                if not entry.has_child_nodes():
                    continue
                seq = _get_sequence((entry.child_nodes or [None])[0]) or []
                out[name] = [n.text_content.strip() for n in seq]
                continue
            out[name] = entry.text_content.strip()
