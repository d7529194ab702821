"""COS (Carousel Object System) layer: PDF tokenizer + object parser.

From-scratch implementation of the PDF object model per the PDF 1.7 spec
(ISO 32000-1 §7.2-7.3).  Behavior-parity targets in the reference:
`Lexer` (reference build/pdf.worker.js:13943) and `Parser`
(build/pdf.worker.js:13343) — we match *what* they accept, not how.
"""

from __future__ import annotations

from typing import Any, Optional

# PDF character classes (ISO 32000-1 Table 1/2)
WHITESPACE = b"\x00\t\n\x0c\r "
DELIMITERS = b"()<>[]{}/%"


class PDFError(Exception):
    """Raised on unrecoverable malformed-PDF conditions (reference: whole-doc
    parse rejection, test/03-invalid-default.js)."""


class FormatError(PDFError):
    """pdf.js FormatError analogue for lexer-level structural violations
    (e.g. a >128-char command token, build/pdf.worker.js:14301-14303).
    Subclasses PDFError so document-parse recovery paths absorb it like
    the reference's generic readXRef catch; the content-stream operator
    loop converts it to a page abort instead of a quiet stop."""


class Name(str):
    """A PDF name object (/Foo).  Subclasses str for ergonomic dict keys."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return f"/{str.__str__(self)}"


class Ref:
    """Indirect object reference `num gen R`."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Ref) and other.num == self.num and other.gen == self.gen

    def __hash__(self) -> int:
        return hash((self.num, self.gen))

    def __repr__(self) -> str:  # pragma: no cover
        return f"Ref({self.num},{self.gen})"


class StreamObj:
    """A PDF stream: dict + raw (still-encoded) bytes.

    ``get_data(doc)`` applies the /Filter chain (see filters.py); doc is
    needed to resolve indirect /Length or filter params.  ``crypt`` (armed
    by the security handler for encrypted documents) decrypts the raw bytes
    BEFORE the filter chain — decrypt-then-decode per ISO 32000-1 §7.6.2.
    """

    __slots__ = ("dict", "raw", "crypt", "_decoded")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw
        self.crypt = None
        self._decoded: Optional[bytes] = None

    def get_data(self, resolve=None) -> bytes:
        if self._decoded is None:
            from .filters import decode_stream

            raw = self.crypt(self.raw) if self.crypt is not None else self.raw
            self._decoded = decode_stream(self.dict, raw, resolve)
        return self._decoded


class Token:
    __slots__ = ("kind", "value")

    def __init__(self, kind: str, value: Any = None):
        self.kind = kind  # num|int|str|name|op|dict_open|dict_close|arr_open|arr_close|eof
        self.value = value

    def __repr__(self) -> str:  # pragma: no cover
        return f"Token({self.kind},{self.value!r})"


class Lexer:
    """Tokenizer over a bytes buffer.

    Handles: numbers (incl. leading +/- and bare '.'), literal strings with
    escapes & balanced parens, hex strings, names with #xx, comments,
    delimiters, keyword/operator tokens.
    """

    def __init__(self, data: bytes, pos: int = 0, known_commands=None):
        self.data = data
        self.pos = pos
        # content-stream op set (pdf.js Lexer knownCommands, passed only
        # by EvaluatorPreprocessor — build/pdf.worker.js:38598); None for
        # object/xref/cmap lexing, exactly like the reference
        self.known_commands = known_commands

    def _kw_end(self, data: bytes, start: int, end: int) -> int:
        """pdf.js Lexer.getObj command-token boundary rules
        (build/pdf.worker.js:14287-14307): a non-printable first byte
        followed by a printable one is a lone 1-byte command; with
        knownCommands the token stops at the first offset where the
        accumulated string IS a known command and its one-char extension
        is NOT (opMap's explicit null intermediates — BM/BD/true/fa…/
        nu… — count as known via the `!== undefined` test, :38590-38594);
        a command longer than 128 chars is a FormatError."""
        c = data[start]
        if (c < 0x20 or c > 0x7F) and start + 1 < len(data):
            if 0x20 <= data[start + 1] <= 0x7F:
                return start + 1
        kc = self.known_commands
        if kc is not None and data[start:end] not in kc:
            known = data[start:start + 1] in kc
            i = start + 1
            while i < end:
                if known and data[start:i + 1] not in kc:
                    return i
                i += 1
                known = data[start:i] in kc
        if end - start > 128:
            raise FormatError(f"Command token too long: {end - start}")
        return end

    def _skip_ws(self) -> None:
        data, n = self.data, len(self.data)
        pos = self.pos
        while pos < n:
            c = data[pos]
            if c in WHITESPACE:
                pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while pos < n and data[pos] not in b"\r\n":
                    pos += 1
            else:
                break
        self.pos = pos

    def next_token(self) -> Token:
        self._skip_ws()
        data, n = self.data, len(self.data)
        pos = self.pos
        if pos >= n:
            return Token("eof")
        c = data[pos]
        if c == 0x2F:  # /
            return self._read_name()
        if 0x30 <= c <= 0x39 or c in b"+-.":
            return self._read_number()
        if c == 0x28:  # (
            return self._read_literal_string()
        if c == 0x3C:  # <
            if pos + 1 < n and data[pos + 1] == 0x3C:
                self.pos = pos + 2
                return Token("dict_open")
            return self._read_hex_string()
        if c == 0x3E:  # >
            if pos + 1 < n and data[pos + 1] == 0x3E:
                self.pos = pos + 2
                return Token("dict_close")
            self.pos = pos + 1
            return Token("op", ">")
        if c == 0x5B:
            self.pos = pos + 1
            return Token("arr_open")
        if c == 0x5D:
            self.pos = pos + 1
            return Token("arr_close")
        if c == 0x7B:
            self.pos = pos + 1
            return Token("op", "{")
        if c == 0x7D:
            self.pos = pos + 1
            return Token("op", "}")
        if c == 0x29:  # stray ')'
            self.pos = pos + 1
            return Token("op", ")")
        # keyword / operator: run of regular characters
        start = pos
        while pos < n and data[pos] not in WHITESPACE and data[pos] not in DELIMITERS:
            pos += 1
        if pos == start:  # defensive: lone delimiter byte
            pos += 1
        else:
            pos = self._kw_end(data, start, pos)
        self.pos = pos
        kw = data[start:pos].decode("latin-1")
        if kw == "true":
            return Token("bool", True)
        if kw == "false":
            return Token("bool", False)
        if kw == "null":
            return Token("null", None)
        return Token("op", kw)

    def _read_number(self) -> Token:
        # exact port of the reference lexer's number semantics
        # (lib/pdf.js build/pdf.worker.js Lexer.getNumber): tolerated
        # double leading minus, CR/LF skipped after the sign, mid-number
        # minus IGNORED (not a terminator), scientific e-notation with
        # signed exponent, whitespace/EOF after a bare sign -> 0, any
        # other non-digit start -> parse error
        data, n = self.data, len(self.data)
        pos = self.pos
        sign = 1
        ch = data[pos] if pos < n else -1
        if ch == 0x2D:
            sign = -1
            pos += 1
            if pos < n and data[pos] == 0x2D:  # double minus tolerated
                pos += 1
        elif ch == 0x2B:
            pos += 1
        while pos < n and data[pos] in (0x0A, 0x0D):
            pos += 1
        divide_by = 0
        if pos < n and data[pos] == 0x2E:
            divide_by = 10
            pos += 1
        ch = data[pos] if pos < n else -1
        if ch < 0x30 or ch > 0x39:
            if ch == -1 or ch in WHITESPACE:
                self.pos = pos
                return Token("int", 0)
            raise PDFError(f"invalid number start: {ch}")
        base = ch - 0x30
        pos += 1
        power = 0
        power_sign = 1
        e_notation = False
        while pos < n:
            c = data[pos]
            if 0x30 <= c <= 0x39:
                if e_notation:
                    power = power * 10 + (c - 0x30)
                else:
                    if divide_by != 0:
                        divide_by *= 10
                    base = base * 10 + (c - 0x30)
            elif c == 0x2E:
                if divide_by == 0:
                    divide_by = 1
                else:
                    break
            elif c == 0x2D:
                pass  # badly formatted minus in the middle: ignored
            elif c in (0x45, 0x65):  # E / e
                nxt = data[pos + 1] if pos + 1 < n else -1
                if nxt in (0x2B, 0x2D):
                    power_sign = -1 if nxt == 0x2D else 1
                    pos += 1
                elif nxt < 0x30 or nxt > 0x39:
                    pos += 1  # lone trailing e: consumed, ends the number
                    break
                e_notation = True
            else:
                break
            pos += 1
        self.pos = pos
        if divide_by == 0 and not e_notation:
            return Token("int", sign * base)
        value = float(base)
        if divide_by != 0:
            value /= divide_by
        if e_notation:
            value *= 10.0 ** (power_sign * power)
        return Token("num", sign * value)

    def _read_name(self) -> Token:
        data, n = self.data, len(self.data)
        pos = self.pos + 1
        out = bytearray()
        while pos < n:
            c = data[pos]
            if c in WHITESPACE or c in DELIMITERS:
                break
            if c == 0x23 and pos + 2 < n:  # #xx hex escape
                try:
                    out.append(int(data[pos + 1 : pos + 3], 16))
                    pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            pos += 1
        self.pos = pos
        return Token("name", Name(out.decode("latin-1")))

    def _read_literal_string(self) -> Token:
        data, n = self.data, len(self.data)
        pos = self.pos + 1
        # fast path: no escape or nesting before the closing ')' — one
        # C-speed scan + slice (same bytes the loop below would emit)
        m = _STR_SPECIAL_RE.search(data, pos)
        if m is not None and data[m.start()] == 0x29:
            end = m.start()
            self.pos = end + 1
            return Token("str", data[pos:end])
        out = bytearray()
        depth = 1
        while pos < n:
            c = data[pos]
            if c == 0x5C:  # backslash escape
                pos += 1
                if pos >= n:
                    break
                e = data[pos]
                if e == 0x6E:
                    out.append(0x0A)
                elif e == 0x72:
                    out.append(0x0D)
                elif e == 0x74:
                    out.append(0x09)
                elif e == 0x62:
                    out.append(0x08)
                elif e == 0x66:
                    out.append(0x0C)
                elif e in b"()\\":
                    out.append(e)
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    val = e - 0x30
                    for _ in range(2):
                        if pos + 1 < n and 0x30 <= data[pos + 1] <= 0x37:
                            pos += 1
                            val = val * 8 + (data[pos] - 0x30)
                        else:
                            break
                    out.append(val & 0xFF)
                elif e == 0x0A:
                    pass  # line continuation
                elif e == 0x0D:
                    if pos + 1 < n and data[pos + 1] == 0x0A:
                        pos += 1
                else:
                    out.append(e)
                pos += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    pos += 1
                    break
            out.append(c)
            pos += 1
        self.pos = pos
        return Token("str", bytes(out))

    def _read_hex_string(self) -> Token:
        data, n = self.data, len(self.data)
        pos = self.pos + 1
        digits = []
        while pos < n:
            c = data[pos]
            if c == 0x3E:
                pos += 1
                break
            ch = chr(c)
            if ch in "0123456789abcdefABCDEF":
                digits.append(ch)
            pos += 1
        self.pos = pos
        if len(digits) % 2:
            # dangling nibble is DROPPED, not zero-padded: pdf.js
            # getHexString only flushes complete digit pairs
            digits.pop()
        return Token("str", bytes.fromhex("".join(digits)))


import re as _re

# fast-lexer token patterns: accept sets identical to the byte loops above
_STR_SPECIAL_RE = _re.compile(rb"[\\()]")
_SKIP_RE = _re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)+")
_NUM_RE = _re.compile(rb"[0-9+\-.][0-9.+\-]*")
_NAME_RE = _re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]*")
_KW_RE = _re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")

_TOK_DICT_OPEN = Token("dict_open")
_TOK_DICT_CLOSE = Token("dict_close")
_TOK_ARR_OPEN = Token("arr_open")
_TOK_ARR_CLOSE = Token("arr_close")
_TOK_EOF = Token("eof")

# Tokens are immutable after construction, so repeated operators (Tj, Td,
# TJ … once per text op) and resource names (/F1 …) intern to one shared
# Token — content streams allocate one object per DISTINCT op/name, not
# per occurrence (bounded; process-wide, like the glyph caches)
_OP_TOKEN_CACHE: dict = {}
_NAME_TOKEN_CACHE: dict = {}
_INT_TOKEN_CACHE: dict = {}


class FastLexer(Lexer):
    """Regex-dispatch tokenizer with byte-loop fallbacks.

    Behaviorally identical to ``Lexer``: every pattern's accept set equals
    the corresponding byte loop's, and any input the fast path can't settle
    exactly (name #xx escapes, malformed numbers) is re-scanned by the
    inherited slow method from the same position.  Used for content streams,
    where token volume dominates (SURVEY M8 dispatch loop)."""

    def next_token(self) -> Token:
        data = self.data
        n = len(data)
        pos = self.pos
        m = _SKIP_RE.match(data, pos)
        if m is not None:
            pos = m.end()
        if pos >= n:
            self.pos = pos
            return _TOK_EOF
        c = data[pos]
        if 0x30 <= c <= 0x39 or c == 0x2B or c == 0x2D or c == 0x2E:
            txt = _NUM_RE.match(data, pos).group()
            end = pos + len(txt)
            if end < n and data[end] in (0x45, 0x65):
                # adjacent e/E: scientific notation — exact slow path
                self.pos = pos
                return self._read_number()
            self.pos = end
            try:
                v = int(txt)
                if -1024 <= v <= 4096:  # TJ kerning / object numbers repeat
                    tok = _INT_TOKEN_CACHE.get(v)
                    if tok is None:
                        tok = _INT_TOKEN_CACHE[v] = Token("int", v)
                    return tok
                return Token("int", v)
            except ValueError:
                try:
                    return Token("num", float(txt))
                except ValueError:
                    self.pos = pos
                    return self._read_number()
        if c == 0x2F:  # /
            name = _NAME_RE.match(data, pos + 1).group()
            if 0x23 in name:  # '#': delegate hex-escape handling
                self.pos = pos
                return self._read_name()
            self.pos = pos + 1 + len(name)
            tok = _NAME_TOKEN_CACHE.get(name)
            if tok is None:
                tok = Token("name", Name(name.decode("latin-1")))
                if len(_NAME_TOKEN_CACHE) < 4096:
                    _NAME_TOKEN_CACHE[name] = tok
            return tok
        if c == 0x28:  # (
            self.pos = pos
            return self._read_literal_string()
        if c == 0x3C:  # <
            if pos + 1 < n and data[pos + 1] == 0x3C:
                self.pos = pos + 2
                return _TOK_DICT_OPEN
            self.pos = pos
            return self._read_hex_string()
        if c == 0x3E:  # >
            if pos + 1 < n and data[pos + 1] == 0x3E:
                self.pos = pos + 2
                return _TOK_DICT_CLOSE
            self.pos = pos + 1
            return Token("op", ">")
        if c == 0x5B:
            self.pos = pos + 1
            return _TOK_ARR_OPEN
        if c == 0x5D:
            self.pos = pos + 1
            return _TOK_ARR_CLOSE
        if c == 0x7B:
            self.pos = pos + 1
            return Token("op", "{")
        if c == 0x7D:
            self.pos = pos + 1
            return Token("op", "}")
        if c == 0x29:  # stray ')'
            self.pos = pos + 1
            return Token("op", ")")
        m = _KW_RE.match(data, pos)
        if m is None:  # defensive: lone delimiter byte (parity with Lexer)
            self.pos = pos + 1
            return Token("op", data[pos:pos + 1].decode("latin-1"))
        raw = m.group()
        end = m.end()
        kc = self.known_commands
        if ((kc is not None and raw not in kc)
                or len(raw) > 128 or c < 0x20 or c > 0x7F):
            end = self._kw_end(data, pos, end)
            raw = data[pos:end]
        self.pos = end
        tok = _OP_TOKEN_CACHE.get(raw)
        if tok is not None:
            return tok
        kw = raw.decode("latin-1")
        if kw == "true":
            tok = Token("bool", True)
        elif kw == "false":
            tok = Token("bool", False)
        elif kw == "null":
            tok = Token("null", None)
        else:
            tok = Token("op", kw)
        if len(_OP_TOKEN_CACHE) < 4096:
            _OP_TOKEN_CACHE[raw] = tok
        return tok


class Parser:
    """Object parser with 2-token lookahead for `num gen R` / `num gen obj`.

    ``strict`` mirrors the reference's behavior of rejecting malformed
    top-level structures while absorbing in-content oddities.
    ``fast=True`` swaps in the regex-dispatch FastLexer (same behavior)."""

    def __init__(self, data: bytes, pos: int = 0, resolve=None, fast: bool = False,
                 known_commands=None):
        self.lexer = (FastLexer if fast else Lexer)(data, pos, known_commands)
        self.resolve = resolve
        # 2-slot lookahead (never more is needed for `num gen R|obj`);
        # slot attributes avoid per-token list append/pop churn in the
        # content-stream hot loop
        self._t0: Optional[Token] = None
        self._t1: Optional[Token] = None

    @property
    def pos(self) -> int:
        return self.lexer.pos  # approximate when lookahead is buffered

    def drop_lookahead(self) -> None:
        """Discard buffered lookahead after the caller repositions the
        lexer directly (inline-image EI skip, stream payload skip)."""
        self._t0 = self._t1 = None

    def _next(self) -> Token:
        t = self._t0
        if t is None:
            return self.lexer.next_token()
        self._t0 = self._t1
        self._t1 = None
        return t

    def _peek(self, k: int = 0) -> Token:
        if self._t0 is None:
            self._t0 = self.lexer.next_token()
        if k == 0:
            return self._t0
        if self._t1 is None:
            self._t1 = self.lexer.next_token()
        return self._t1

    def parse_object(self) -> Any:
        tok = self._next()
        return self._parse_from(tok)

    def _parse_from(self, tok: Token) -> Any:
        kind = tok.kind
        if kind == "int":
            # possible reference: int int R
            if self._peek(0).kind == "int":
                t1 = self._peek(1)
                if t1.kind == "op" and t1.value == "R":
                    gen = self._next().value
                    self._next()
                    return Ref(tok.value, gen)
            return tok.value
        if kind in ("num", "str", "name", "bool", "null"):
            return tok.value
        if kind == "arr_open":
            arr = []
            while True:
                t = self._peek(0)
                if t.kind == "arr_close":
                    self._next()
                    return arr
                if t.kind == "eof":
                    raise PDFError("unterminated array")
                arr.append(self.parse_object())
        if kind == "dict_open":
            d: dict = {}
            while True:
                t = self._next()
                if t.kind == "dict_close":
                    break
                if t.kind == "eof":
                    raise PDFError("unterminated dict")
                if t.kind != "name":
                    # skip garbage key
                    continue
                d[str(t.value)] = self.parse_object()
            # check for stream keyword
            t = self._peek(0)
            if t.kind == "op" and t.value == "stream":
                self._next()
                return self._read_stream(d)
            return d
        if kind == "eof":
            raise PDFError("unexpected EOF")
        return tok  # operator token — caller (content interpreter) handles

    def _read_stream(self, d: dict) -> StreamObj:
        data = self.lexer.data
        pos = self.lexer.pos
        # after 'stream' keyword: CRLF or LF
        if pos < len(data) and data[pos] == 0x0D:
            pos += 1
        if pos < len(data) and data[pos] == 0x0A:
            pos += 1
        length = d.get("Length")
        if isinstance(length, Ref) and self.resolve is not None:
            length = self.resolve(length)
        raw = None
        if isinstance(length, int) and length >= 0 and pos + length <= len(data):
            raw = data[pos : pos + length]
            # validate endstream within a small window (reference Parser does
            # a similar check and falls back to scanning)
            tail = data[pos + length : pos + length + 20]
            if b"endstream" not in tail:
                idx = data.find(b"endstream", pos)
                if idx != -1:
                    raw = data[pos:idx]
                    # strip trailing EOL
                    raw = raw.rstrip(b"\r\n") if len(raw) - length > 2 else raw
        if raw is None:
            idx = data.find(b"endstream", pos)
            if idx == -1:
                raise PDFError("unterminated stream")
            raw = data[pos:idx]
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                raw = raw[:-1]
        end = data.find(b"endstream", pos + len(raw))
        self.lexer.pos = (end + 9) if end != -1 else pos + len(raw)
        self._t0 = self._t1 = None  # lexer repositioned: drop lookahead
        return StreamObj(d, raw)
