"""Content-stream interpreter + text-span assembly.

This is the kernel's core: a from-scratch Python re-implementation of the
*behavior* of pdf.js `PartialEvaluator.getTextContent`
(reference build/pdf.worker.js:36326-37141) — operator dispatch (:36825-37121),
TextState (:38133-38188), spacing/EOL heuristics with the exact constants
(:36387-36392: TRACKING 0.102 / NOT_A_SPACE 0.03 / NEGATIVE −0.2 /
SPACE_IN_FLOW [0.102, 0.6] / VERTICAL_SHIFT 0.25), fake spaces
(:36759-36782), whitespace ring buffer (:36371-36386), Unicode
normalization (:5303-5310), viewport clipping (:36530-36536) and Form
XObject recursion (:36946-37034).
"""

from __future__ import annotations

import math
import re
import unicodedata
from typing import Any, Callable, Optional

from .cos import FormatError, Name, Parser, PDFError, Ref, StreamObj, Token
from .fonts import FONT_IDENTITY_MATRIX, Font, Glyph

IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)

TRACKING_SPACE_FACTOR = 0.102
NOT_A_SPACE_FACTOR = 0.03
NEGATIVE_SPACE_FACTOR = -0.2
SPACE_IN_FLOW_MIN_FACTOR = 0.102
SPACE_IN_FLOW_MAX_FACTOR = 0.6
VERTICAL_SHIFT_RATIO = 0.25


def mat_mul(m1, m2):
    """pdf.js Util.transform(m1, m2)."""
    return (
        m1[0] * m2[0] + m1[2] * m2[1],
        m1[1] * m2[0] + m1[3] * m2[1],
        m1[0] * m2[2] + m1[2] * m2[3],
        m1[1] * m2[2] + m1[3] * m2[3],
        m1[0] * m2[4] + m1[2] * m2[5] + m1[4],
        m1[1] * m2[4] + m1[3] * m2[5] + m1[5],
    )


# normalizeUnicode (build/pdf.worker.js:5303-5310): NFKC over ligature /
# presentation-form ranges only, plus the ﬅ→ſt special case.
_NORM_RE = re.compile(
    "([\u00a0\u00b5\u037e\u0eb3\u2000-\u200a\u202f\u2126"
    "\ufb00-\ufb04\ufb06\ufb20-\ufb36\ufb38-\ufb3c\ufb3e\ufb40-\ufb41"
    "\ufb43-\ufb44\ufb46-\ufba1\ufba4-\ufba9\ufbae-\ufbb1\ufbd3-\ufbdc"
    "\ufbde-\ufbe7\ufbea-\ufbf8\ufbfc-\ufbfd\ufc00-\ufc5d\ufc64-\ufcf1"
    "\ufcf5-\ufd3d\ufd88\ufdf4\ufdfa-\ufdfb\ufe71\ufe77\ufe79\ufe7b\ufe7d]+)"
    "|(\ufb05+)"
)


def normalize_unicode(s: str) -> str:
    def rep(m: "re.Match[str]") -> str:
        if m.group(1):
            return unicodedata.normalize("NFKC", m.group(1))
        return "ſt" * len(m.group(2))

    return _NORM_RE.sub(rep, s)


import unicodedata as _ud

# precomputed Latin-1 bidi classes: the hot path (every extracted char
# goes through _bidi_char_type) is a tuple index instead of a
# unicodedata call + module lookup
_BIDI_LOW = tuple(_ud.bidirectional(chr(i)) for i in range(256))


def _bidi_char_type(code: int) -> str:
    """Character class exactly as the reference assigns it (bidi,
    build/pdf.worker.js:32557-32582): Unicode bidi class for <=0xFF and
    the Arabic block (both verified identical to Python's unicodedata,
    except U+061D which the reference leaves untyped), fixed classes for
    the other RTL ranges, 'L' for everything else (including Hebrew
    presentation forms FB1D-FB4F \u2014 reference quirk kept for parity)."""
    if code <= 0xFF:
        return _BIDI_LOW[code]
    if 0x0590 <= code <= 0x05F4:
        return "R"
    if 0x0600 <= code <= 0x06FF:
        return "" if code == 0x061D else _ud.bidirectional(chr(code))
    if 0x0700 <= code <= 0x08AC or 0xFB50 <= code <= 0xFDFF \
            or 0xFE70 <= code <= 0xFEFF:
        return "AL"
    return "L"


def bidi_text(s: str, vertical: bool) -> tuple[str, str]:
    """Full reference bidi algorithm (build/pdf.worker.js:32557-32750):
    the pdf.js UBA subset \u2014 NSM/EN/AL resolution, ES/CS/ET neutralization,
    neutral-run resolution, level assignment and run reversal \u2014 so
    mixed-direction text (Arabic/Hebrew with numerals or Latin) orders
    exactly as the reference renders it."""
    if vertical or not s:
        return s, "ttb" if vertical else "ltr"
    if s.isascii():
        # ASCII has no R/AL/AN bidi classes, so num_bidi is 0 by
        # construction and the algorithm below returns (s, "ltr") —
        # skip the per-char classification (C-speed check)
        return s, "ltr"
    n = len(s)
    types = [_bidi_char_type(ord(ch)) for ch in s]
    num_bidi = sum(1 for t in types if t in ("R", "AL", "AN"))
    if num_bidi == 0:
        return s, "ltr"
    if num_bidi / n < 0.3 and n > 4:
        is_ltr, start_level = True, 0
    else:
        is_ltr, start_level = False, 1
    levels = [start_level] * n
    e = "R" if (start_level & 1) else "L"
    sor = eor = e
    # W1: NSM takes the type of the previous character
    last = sor
    for i in range(n):
        if types[i] == "NSM":
            types[i] = last
        else:
            last = types[i]
    # W2: EN after AL becomes AN
    last = sor
    for i in range(n):
        t = types[i]
        if t == "EN":
            types[i] = "AN" if last == "AL" else "EN"
        elif t in ("R", "L", "AL"):
            last = t
    # W3: AL becomes R
    for i in range(n):
        if types[i] == "AL":
            types[i] = "R"
    # W4: single ES between EN becomes EN; CS between same numbers joins
    for i in range(1, n - 1):
        if types[i] == "ES" and types[i - 1] == "EN" and types[i + 1] == "EN":
            types[i] = "EN"
        if types[i] == "CS" and types[i - 1] in ("EN", "AN") \
                and types[i + 1] == types[i - 1]:
            types[i] = types[i - 1]
    # W5: ET adjacent to EN becomes EN
    for i in range(n):
        if types[i] == "EN":
            j = i - 1
            while j >= 0 and types[j] == "ET":
                types[j] = "EN"
                j -= 1
            j = i + 1
            while j < n and types[j] == "ET":
                types[j] = "EN"
                j += 1
    # W6: remaining separators/terminators become ON
    for i in range(n):
        if types[i] in ("WS", "ES", "ET", "CS"):
            types[i] = "ON"
    # W7: EN after L becomes L
    last = sor
    for i in range(n):
        t = types[i]
        if t == "EN":
            types[i] = "L" if last == "L" else "EN"
        elif t in ("R", "L"):
            last = t
    # N1: neutral runs take the surrounding direction when it agrees
    i = 0
    while i < n:
        if types[i] == "ON":
            end = i + 1
            while end < n and types[end] == "ON":
                end += 1
            end -= 1
            before = types[i - 1] if i > 0 else sor
            after = types[end + 1] if end + 1 < n else eor
            if before != "L":
                before = "R"
            if after != "L":
                after = "R"
            if before == after:
                for j in range(i, end + 1):
                    types[j] = before
            i = end
        i += 1
    # N2: remaining neutrals take the embedding direction
    for i in range(n):
        if types[i] == "ON":
            types[i] = e
    # I1/I2: resolve levels
    for i in range(n):
        t = types[i]
        if (levels[i] & 1) == 0:
            if t == "R":
                levels[i] += 1
            elif t in ("AN", "EN"):
                levels[i] += 2
        elif t in ("L", "AN", "EN"):
            levels[i] += 1
    # L2: reverse runs from highest level down to lowest odd level
    highest = max(levels)
    lowest_odd = min((lv for lv in levels if lv & 1), default=99)
    chars = list(s)
    for level in range(highest, lowest_odd - 1, -1):
        start = -1
        for i in range(n):
            if levels[i] < level:
                if start >= 0:
                    chars[start:i] = chars[start:i][::-1]
                    start = -1
            elif start < 0:
                start = i
        if start >= 0:
            chars[start:n] = chars[start:n][::-1]
    out = "".join("" if ch in "<>" else ch for ch in chars)
    return out, ("ltr" if is_ltr else "rtl")


# kept as an alias for older call sites/tests
bidi_lite = bidi_text


class TextState:
    """Parity with pdf.js TextState (build/pdf.worker.js:38133-38188)."""

    __slots__ = (
        "ctm", "font_name", "font_size", "loaded_name", "font", "font_matrix",
        "text_matrix", "text_line_matrix", "char_spacing", "word_spacing",
        "leading", "text_h_scale", "text_rise", "nan_risk",
    )

    def __init__(self) -> None:
        self.ctm = IDENTITY
        self.font_name: Optional[str] = None
        self.font_size = 0.0
        self.loaded_name: Optional[str] = None
        self.font: Optional[Font] = None
        self.font_matrix = FONT_IDENTITY_MATRIX
        self.text_matrix = list(IDENTITY)
        self.text_line_matrix = list(IDENTITY)
        self.char_spacing = 0.0
        self.word_spacing = 0.0
        self.leading = 0.0
        self.text_h_scale = 1.0
        self.text_rise = 0.0
        self.nan_risk = False

    def refresh_nan_risk(self) -> None:
        """Sticky flag routing the transform math to the exact (cross-term
        + always-outer-ctm) formulas when any state value is non-finite.
        Refreshed after every state-mutating operator; a finite state with
        finite per-glyph increments stays finite within a run, so the hot
        paths only test the flag.  (A finite overflow of this SUM flags
        risk spuriously — the exact path is then merely slower, never
        wrong.)"""
        m = self.text_matrix
        l = self.text_line_matrix
        c = self.ctm
        s = (m[0] + m[1] + m[2] + m[3] + m[4] + m[5]
             + l[0] + l[1] + l[2] + l[3] + l[4] + l[5]
             + c[0] + c[1] + c[2] + c[3] + c[4] + c[5]
             + self.font_size + self.char_spacing + self.word_spacing
             + self.leading + self.text_h_scale + self.text_rise
             + self.font_matrix[0])
        self.nan_risk = (s - s) != 0.0

    def set_text_matrix(self, a, b, c, d, e, f) -> None:
        self.text_matrix = [a, b, c, d, e, f]

    def set_text_line_matrix(self, a, b, c, d, e, f) -> None:
        self.text_line_matrix = [a, b, c, d, e, f]

    def translate_text_matrix(self, x, y) -> None:
        m = self.text_matrix
        m[4] = m[0] * x + m[2] * y + m[4]
        m[5] = m[1] * x + m[3] * y + m[5]

    def translate_text_line_matrix(self, x, y) -> None:
        m = self.text_line_matrix
        m[4] = m[0] * x + m[2] * y + m[4]
        m[5] = m[1] * x + m[3] * y + m[5]

    def carriage_return(self) -> None:
        self.translate_text_line_matrix(0, -self.leading)
        self.text_matrix = list(self.text_line_matrix)

    def clone(self) -> "TextState":
        c = TextState.__new__(TextState)
        for s in TextState.__slots__:
            setattr(c, s, getattr(self, s))
        c.text_matrix = list(self.text_matrix)
        c.text_line_matrix = list(self.text_line_matrix)
        return c


class _FallbackFont(Font):
    """Stand-in when a font fails to load (pdf.js falls back similarly)."""

    def __init__(self, loaded_name: str):  # noqa: super-init-not-called
        self.loaded_name = loaded_name
        self.subtype = "Type1"
        self.vertical = False
        self.is_type3 = False
        self.font_matrix = FONT_IDENTITY_MATRIX
        self.base_font = "Helvetica"
        self.fallback_name = "sans-serif"
        self.ascent, self.descent = 0.75, -0.25
        self.composite = False
        self.symbolic = False
        self._glyph_cache = {}
        self.widths = {}
        self.default_width = 500.0
        self.to_unicode = None
        from .encodings import encoding_names, encoding_table

        self._enc_table = list(encoding_table("StandardEncoding"))
        self._diff_names = {}
        self._enc_names_resolved = list(encoding_names("StandardEncoding"))
        self._has_encoding = False
        self.missing_file = True


class TextExtractor:
    """Per-document text extractor with warm font caches (SURVEY §2.3 T1-T2)."""

    def __init__(self, doc) -> None:
        self.doc = doc
        self._font_cache: dict[Any, Font] = {}
        self._font_ctr = 0

    # -- font loading (cached per doc) ----------------------------------
    def load_font(self, font_name: Optional[str], font_ref, resources: dict) -> Font:
        r = self.doc.resolve
        key = None
        font_obj = None
        if font_ref is not None:
            key = ("ref", font_ref.num, font_ref.gen) if isinstance(font_ref, Ref) else ("obj", id(font_ref))
            if key in self._font_cache:
                return self._font_cache[key]
            font_obj = r(font_ref)
        else:
            fonts = r(resources.get("Font")) or {}
            raw = fonts.get(font_name)
            if isinstance(raw, Ref):
                key = ("ref", raw.num, raw.gen)
            else:
                key = ("name", id(fonts), font_name)
            if key in self._font_cache:
                return self._font_cache[key]
            font_obj = r(raw)
        self._font_ctr += 1
        loaded = f"g_f{self._font_ctr}"
        if not isinstance(font_obj, dict):
            font = _FallbackFont(loaded)
        else:
            try:
                font = Font(self.doc, font_obj, loaded)
            except (PDFError, ValueError, TypeError, OverflowError):
                font = _FallbackFont(loaded)
        self._font_cache[key] = font
        return font

    # -- main entry ------------------------------------------------------
    def get_text_content(self, page: dict, include_marked_content: bool = False,
                         disable_normalization: bool = False,
                         keep_white_space: bool = False) -> dict:
        view_box = self.doc.page_view(page)
        content = self.doc.page_content(page)
        resources = self.doc.resolve(page.get("Resources")) or {}
        items: list[dict] = []
        styles: dict[str, dict] = {}
        self._run(content, resources, TextState(), items, styles, view_box,
                  include_marked_content, disable_normalization, keep_white_space,
                  depth=0, seen_styles=set(), marked_level=[0])
        return {"items": items, "styles": styles}

    # -- interpreter -----------------------------------------------------
    def _run(self, content: bytes, resources: dict, initial_state: TextState,
             items: list, styles: dict, view_box, include_marked_content: bool,
             disable_normalization: bool, keep_white_space: bool, depth: int,
             seen_styles: set, marked_level: list) -> None:
        doc = self.doc
        r = doc.resolve
        state_stack: list[TextState] = []
        ts = initial_state

        # --- textContentItem state (mirrors the reference's closure) ----
        tci: dict[str, Any] = {
            "initialized": False, "str": [], "totalWidth": 0.0, "totalHeight": 0.0,
            "width": 0.0, "height": 0.0, "vertical": False, "prevTransform": None,
            "textAdvanceScale": 0.0, "spaceInFlowMin": 0.0, "spaceInFlowMax": 0.0,
            "trackingSpaceMin": math.inf, "negativeSpaceMax": -math.inf,
            "notASpace": -math.inf, "transform": None, "fontName": None, "hasEOL": False,
        }
        two_last = [" ", " "]
        two_pos = [0]

        def save_last_char(ch: str) -> bool:
            next_pos = (two_pos[0] + 1) % 2
            ret = two_last[two_pos[0]] != " " and two_last[next_pos] == " "
            two_last[two_pos[0]] = ch
            two_pos[0] = next_pos
            return (not keep_white_space) and ret

        def should_add_whitespace() -> bool:
            return (not keep_white_space) and two_last[two_pos[0]] != " " and two_last[(two_pos[0] + 1) % 2] == " "

        def reset_last_chars() -> None:
            two_last[0] = two_last[1] = " "
            two_pos[0] = 0

        def get_current_text_transform():
            # specialised mat_mul(ctm, mat_mul(text_matrix, tsm)) with
            # tsm = (fs*hscale, 0, 0, fs, 0, rise); the ±0.0 cross terms
            # are KEPT (as precomputed m*0.0 products) so a NaN/Inf text
            # matrix poisons every output slot exactly as the reference's
            # full Util.transform does; identity-ctm fast path retained.
            # (Type3 bbox scaling: glyph bbox data not tracked; rare.)
            tm = ts.text_matrix
            fs = ts.font_size
            w = fs * ts.text_h_scale
            rise = ts.text_rise
            c = ts.ctm
            if not ts.nan_risk:
                p0 = tm[0] * w
                p1 = tm[1] * w
                p2 = tm[2] * fs
                p3 = tm[3] * fs
                p4 = tm[2] * rise + tm[4]
                p5 = tm[3] * rise + tm[5]
                if c is IDENTITY:
                    return (p0, p1, p2, p3, p4, p5)
            else:
                # exact slow path: keep the ±0.0 cross terms AND the outer
                # ctm multiply (even identity) so a NaN/Inf matrix poisons
                # every slot exactly like the reference's Util.transform
                z0, z1, z2, z3 = (tm[0] * 0.0, tm[1] * 0.0,
                                  tm[2] * 0.0, tm[3] * 0.0)
                p0 = tm[0] * w + z2
                p1 = tm[1] * w + z3
                p2 = z0 + tm[2] * fs
                p3 = z1 + tm[3] * fs
                p4 = z0 + tm[2] * rise + tm[4]
                p5 = z1 + tm[3] * rise + tm[5]
            return (
                c[0] * p0 + c[2] * p1, c[1] * p0 + c[3] * p1,
                c[0] * p2 + c[2] * p3, c[1] * p2 + c[3] * p3,
                c[0] * p4 + c[2] * p5 + c[4], c[1] * p4 + c[3] * p5 + c[5],
            )

        def push_whitespace(width=0.0, height=0.0, transform=None, font_name=None):
            items.append({
                "str": " ", "dir": "ltr", "width": width, "height": height,
                "transform": transform if transform is not None else tci["prevTransform"],
                "fontName": font_name if font_name is not None else tci["fontName"],
                "hasEOL": False,
            })

        def ensure_tci():
            if tci["initialized"]:
                return tci
            loaded = ts.loaded_name
            font = ts.font
            if loaded not in seen_styles and font is not None:
                seen_styles.add(loaded)
                styles[loaded] = {
                    "fontFamily": font.fallback_name, "ascent": font.ascent,
                    "descent": font.descent, "vertical": font.vertical,
                }
            tci["fontName"] = loaded
            trm = get_current_text_transform()
            tci["transform"] = trm
            if font is None or not font.vertical:
                tci["width"] = tci["totalWidth"] = 0.0
                tci["height"] = tci["totalHeight"] = math.hypot(trm[2], trm[3])
                tci["vertical"] = False
            else:
                tci["width"] = tci["totalWidth"] = math.hypot(trm[0], trm[1])
                tci["height"] = tci["totalHeight"] = 0.0
                tci["vertical"] = True
            scale_line_x = math.hypot(ts.text_line_matrix[0], ts.text_line_matrix[1])
            scale_ctm_x = math.hypot(ts.ctm[0], ts.ctm[1])
            tci["textAdvanceScale"] = scale_ctm_x * scale_line_x
            fs = ts.font_size
            tci["trackingSpaceMin"] = fs * TRACKING_SPACE_FACTOR
            tci["notASpace"] = fs * NOT_A_SPACE_FACTOR
            tci["negativeSpaceMax"] = fs * NEGATIVE_SPACE_FACTOR
            tci["spaceInFlowMin"] = fs * SPACE_IN_FLOW_MIN_FACTOR
            tci["spaceInFlowMax"] = fs * SPACE_IN_FLOW_MAX_FACTOR
            tci["hasEOL"] = False
            tci["initialized"] = True
            return tci

        def update_advance_scale():
            if not tci["initialized"]:
                return
            scale_line_x = math.hypot(ts.text_line_matrix[0], ts.text_line_matrix[1])
            scale_ctm_x = math.hypot(ts.ctm[0], ts.ctm[1])
            factor = scale_ctm_x * scale_line_x
            if factor == tci["textAdvanceScale"]:
                return
            if not tci["vertical"]:
                tci["totalWidth"] += tci["width"] * tci["textAdvanceScale"]
                tci["width"] = 0.0
            else:
                tci["totalHeight"] += tci["height"] * tci["textAdvanceScale"]
                tci["height"] = 0.0
            tci["textAdvanceScale"] = factor

        def run_bidi(chunk) -> dict:
            text = "".join(chunk["str"])
            if not disable_normalization:
                text = normalize_unicode(text)
            s, direction = bidi_lite(text, chunk["vertical"])
            return {
                "str": s, "dir": direction, "width": abs(chunk["totalWidth"]),
                "height": abs(chunk["totalHeight"]), "transform": chunk["transform"],
                "fontName": chunk["fontName"], "hasEOL": chunk["hasEOL"],
            }

        def flush_tci():
            if not tci["initialized"]:
                return
            if not tci["vertical"]:
                tci["totalWidth"] += tci["width"] * tci["textAdvanceScale"]
            else:
                tci["totalHeight"] += tci["height"] * tci["textAdvanceScale"]
            items.append(run_bidi(tci))
            tci["initialized"] = False
            tci["str"] = []

        def append_eol():
            reset_last_chars()
            if tci["initialized"]:
                tci["hasEOL"] = True
                flush_tci()
            else:
                items.append({
                    "str": "", "dir": "ltr", "width": 0.0, "height": 0.0,
                    "transform": get_current_text_transform(),
                    "fontName": ts.loaded_name, "hasEOL": True,
                })

        def add_fake_spaces(width, transf, orientation) -> bool:
            if orientation * tci["spaceInFlowMin"] <= width <= orientation * tci["spaceInFlowMax"]:
                if tci["initialized"]:
                    reset_last_chars()
                    tci["str"].append(" ")
                return False
            font_name = tci["fontName"]
            height = 0.0
            if tci["vertical"]:
                height = width
                width = 0.0
            flush_tci()
            reset_last_chars()
            push_whitespace(width=abs(width), height=abs(height),
                            transform=transf if transf is not None else get_current_text_transform(),
                            font_name=font_name)
            return True

        def apply_inverse_rotation(x, y, m):
            scale = math.hypot(m[0], m[1])
            if scale == 0:
                return 0.0, 0.0
            return (m[0] * x + m[1] * y) / scale, (m[2] * x + m[3] * y) / scale

        # Per-run hoisted transform state: within one build_text_content_item
        # run only text_matrix slots 4/5 mutate (glyph advances); tm[0..3],
        # font size/h-scale/rise, ctm, nan_risk and font are fixed until the
        # next operator.  The run-constant half of the per-glyph transform
        # (p0..p3, the ctm products c0..c3, the rise cross-terms, the rotate
        # classification) is computed ONCE here with the exact expressions
        # the per-glyph formula used — same operands, same order, so results
        # stay bit-identical while the hot path does 4 multiply-adds per
        # glyph instead of 12.
        run_h = [None] * 10

        def _hoist_run() -> None:
            tm = ts.text_matrix
            fs = ts.font_size
            w_ = fs * ts.text_h_scale
            rise = ts.text_rise
            c = ts.ctm
            if not ts.nan_risk:
                p0 = tm[0] * w_
                p1 = tm[1] * w_
                p2 = tm[2] * fs
                p3 = tm[3] * fs
                k4 = tm[2] * rise  # p4 = k4 + tm[4], identical op order
                k5 = tm[3] * rise
                if c is IDENTITY:
                    c0, c1, c2, c3 = p0, p1, p2, p3
                    cm = None
                else:
                    c0 = c[0] * p0 + c[2] * p1
                    c1 = c[1] * p0 + c[3] * p1
                    c2 = c[0] * p2 + c[2] * p3
                    c3 = c[1] * p2 + c[3] * p3
                    cm = c
            else:
                # non-finite state takes the exact formula — ±0.0 cross
                # terms + the always-applied outer multiply, so NaN poisons
                # every slot like the reference's Util.transform
                zz0, zz1, zz2, zz3 = (tm[0] * 0.0, tm[1] * 0.0,
                                      tm[2] * 0.0, tm[3] * 0.0)
                p0 = tm[0] * w_ + zz2
                p1 = tm[1] * w_ + zz3
                p2 = zz0 + tm[2] * fs
                p3 = zz1 + tm[3] * fs
                k4 = zz0 + tm[2] * rise  # (zz0 + tm2*rise) + tm4 ≡ original
                k5 = zz1 + tm[3] * rise
                c0 = c[0] * p0 + c[2] * p1
                c1 = c[1] * p0 + c[3] * p1
                c2 = c[0] * p2 + c[2] * p3
                c3 = c[1] * p2 + c[3] * p3
                cm = c
            rot = -1
            if c0 and c1 == 0 and c2 == 0:
                rot = 0 if c0 > 0 else 180
            elif c1 and c0 == 0 and c3 == 0:
                rot = 90 if c1 > 0 else 270
            run_h[0] = tm
            run_h[1] = cm
            run_h[2] = c0
            run_h[3] = c1
            run_h[4] = c2
            run_h[5] = c3
            run_h[6] = k4
            run_h[7] = k5
            run_h[8] = rot
            run_h[9] = ts.font

        def compare_with_last_position(glyph_width) -> bool:
            tm, cm, c0, c1, c2, c3, k4, k5, rotate, font = run_h
            p4 = k4 + tm[4]
            p5 = k5 + tm[5]
            if cm is None:
                pos_x, pos_y = p4, p5
            else:
                pos_x = cm[0] * p4 + cm[2] * p5 + cm[4]
                pos_y = cm[1] * p4 + cm[3] * p5 + cm[5]
            if font is not None and font.vertical:
                if (pos_x < view_box[0] or pos_x > view_box[2]
                        or pos_y + glyph_width < view_box[1] or pos_y > view_box[3]):
                    return False
            else:
                if (pos_x + glyph_width < view_box[0] or pos_x > view_box[2]
                        or pos_y < view_box[1] or pos_y > view_box[3]):
                    return False
            if font is None or tci["prevTransform"] is None:
                return True
            prev = tci["prevTransform"]
            if prev[4] == pos_x and prev[5] == pos_y:
                return True
            return cwlp_tail(pos_x, pos_y, prev)

        def cwlp_tail(pos_x, pos_y, prev) -> bool:
            # slow tail of compare_with_last_position: everything after the
            # same-position early return.  Split out so the glyph loop can
            # inline the cheap head (position + viewport + same-pos check,
            # ~80% of calls end there) without a frame for this part.
            c0, c1, c2, c3, rotate, font = (run_h[2], run_h[3], run_h[4],
                                            run_h[5], run_h[8], run_h[9])
            last_x, last_y = prev[4], prev[5]
            if rotate == 90:
                pos_x, pos_y = pos_y, pos_x
                last_x, last_y = last_y, last_x
            elif rotate == 180:
                pos_x, pos_y, last_x, last_y = -pos_x, -pos_y, -last_x, -last_y
            elif rotate == 270:
                pos_x, pos_y = -pos_y, -pos_x
                last_x, last_y = -last_y, -last_x
            elif rotate == -1:
                pos_x, pos_y = apply_inverse_rotation(pos_x, pos_y, (c0, c1, c2, c3))
                last_x, last_y = apply_inverse_rotation(last_x, last_y, prev)
            if font.vertical:
                advance_y = (last_y - pos_y) / tci["textAdvanceScale"]
                advance_x = pos_x - last_x
                orientation = _sign(tci["height"])
                if advance_y < orientation * tci["negativeSpaceMax"]:
                    if abs(advance_x) > 0.5 * tci["width"]:
                        append_eol()
                        return True
                    reset_last_chars()
                    flush_tci()
                    return True
                if abs(advance_x) > tci["width"]:
                    append_eol()
                    return True
                if advance_y <= orientation * tci["notASpace"]:
                    reset_last_chars()
                if advance_y <= orientation * tci["trackingSpaceMin"]:
                    if should_add_whitespace():
                        reset_last_chars()
                        flush_tci()
                        push_whitespace(height=abs(advance_y))
                    else:
                        tci["height"] += advance_y
                elif not add_fake_spaces(advance_y, tci["prevTransform"], orientation):
                    if len(tci["str"]) == 0:
                        reset_last_chars()
                        push_whitespace(height=abs(advance_y))
                    else:
                        tci["height"] += advance_y
                if abs(advance_x) > tci["width"] * VERTICAL_SHIFT_RATIO:
                    flush_tci()
                return True
            advance_x = (pos_x - last_x) / tci["textAdvanceScale"]
            advance_y = pos_y - last_y
            orientation = _sign(tci["width"])
            if advance_x < orientation * tci["negativeSpaceMax"]:
                if abs(advance_y) > 0.5 * tci["height"]:
                    append_eol()
                    return True
                reset_last_chars()
                flush_tci()
                return True
            if abs(advance_y) > tci["height"]:
                append_eol()
                return True
            if advance_x <= orientation * tci["notASpace"]:
                reset_last_chars()
            if advance_x <= orientation * tci["trackingSpaceMin"]:
                if should_add_whitespace():
                    reset_last_chars()
                    flush_tci()
                    push_whitespace(width=abs(advance_x))
                else:
                    tci["width"] += advance_x
            elif not add_fake_spaces(advance_x, tci["prevTransform"], orientation):
                if len(tci["str"]) == 0:
                    reset_last_chars()
                    push_whitespace(width=abs(advance_x))
                else:
                    tci["width"] += advance_x
            if abs(advance_y) > tci["height"] * VERTICAL_SHIFT_RATIO:
                flush_tci()
            return True

        def build_text_content_item(chars: Optional[bytes], extra_spacing: float) -> None:
            font = ts.font
            _hoist_run()
            if not chars:
                char_spacing = ts.char_spacing + extra_spacing
                if char_spacing:
                    if not font.vertical:
                        ts.translate_text_matrix(char_spacing * ts.text_h_scale, 0)
                    else:
                        ts.translate_text_matrix(0, -char_spacing)
                if keep_white_space:
                    compare_with_last_position(0)
                return
            glyphs = font.chars_to_glyphs(chars)
            scale = ts.font_matrix[0] * ts.font_size
            n = len(glyphs)
            # hot loop: bind per-run-constant state as locals (ts cannot be
            # rebound mid-run; font/spacing/hscale are fixed for the run),
            # and inline translate_text_matrix / save_last_char — one call
            # per glyph each was ~10% of kernel CPU.  tm is only MUTATED
            # (slots 4/5) inside the loop, never rebound, so the axis
            # update m[4] += m[0]*dx; m[5] += m[1]*dx equals the full
            # m[0]*x + m[2]*0 + m[4] expression bit-for-bit (±0.0 adds).
            tm = ts.text_matrix
            vertical = font.vertical
            base_char_spacing = ts.char_spacing
            word_spacing = ts.word_spacing
            h_scale = ts.text_h_scale
            # the full translate is m[4] = m0*x + m2*y + m4 with one of
            # x/y zero; the dropped cross term is ±0.0 for finite matrices
            # but NaN for a poisoned one — precompute it so NaN/Inf
            # matrices propagate exactly as the reference's full formula
            z4h, z5h = tm[2] * 0.0, tm[3] * 0.0  # horizontal: y == 0
            z4v, z5v = tm[0] * 0.0, tm[1] * 0.0  # vertical:  x == 0
            # _run_transform inlined below (per-glyph prevTransform tuple):
            # bind the hoisted run constants as loop locals
            r_cm = run_h[1]
            r_c0, r_c1, r_c2, r_c3 = run_h[2], run_h[3], run_h[4], run_h[5]
            r_k4, r_k5 = run_h[6], run_h[7]
            vb0, vb1, vb2, vb3 = view_box
            for i, glyph in enumerate(glyphs):
                if glyph.is_format_mark:
                    continue
                char_spacing = base_char_spacing + (extra_spacing if i + 1 == n else 0.0)
                glyph_width = glyph.width
                if vertical:
                    glyph_width = -glyph_width  # vmetrics not tracked
                scaled_dim = glyph_width * scale
                if not keep_white_space and glyph.is_space:
                    if not vertical:
                        char_spacing += scaled_dim + word_spacing
                        dx = char_spacing * h_scale
                        tm[4] = tm[0] * dx + z4h + tm[4]
                        tm[5] = tm[1] * dx + z5h + tm[5]
                    else:
                        char_spacing += -scaled_dim + word_spacing
                        dy = -char_spacing
                        tm[4] = z4v + tm[2] * dy + tm[4]
                        tm[5] = z5v + tm[3] * dy + tm[5]
                    # save_last_char(" ") inlined
                    p = two_pos[0]
                    np_ = (p + 1) % 2
                    two_last[p] = " "
                    two_pos[0] = np_
                    continue
                if not glyph.is_diacritic:
                    # compare_with_last_position's cheap head inlined
                    # (position from the hoisted run constants + viewport
                    # test + same-position early accept — ~80% of the 1.7M
                    # per-glyph calls end here); cwlp_tail for the rest
                    p4 = r_k4 + tm[4]
                    p5 = r_k5 + tm[5]
                    if r_cm is None:
                        pos_x = p4
                        pos_y = p5
                    else:
                        pos_x = r_cm[0] * p4 + r_cm[2] * p5 + r_cm[4]
                        pos_y = r_cm[1] * p4 + r_cm[3] * p5 + r_cm[5]
                    if vertical:
                        ok = not (pos_x < vb0 or pos_x > vb2
                                  or pos_y + scaled_dim < vb1 or pos_y > vb3)
                    else:
                        ok = not (pos_x + scaled_dim < vb0 or pos_x > vb2
                                  or pos_y < vb1 or pos_y > vb3)
                    if ok:
                        prev = tci["prevTransform"]
                        if prev is not None and (prev[4] != pos_x
                                                 or prev[5] != pos_y):
                            ok = cwlp_tail(pos_x, pos_y, prev)
                    if not ok:
                        if not vertical:
                            dx = scaled_dim * h_scale
                            tm[4] = tm[0] * dx + z4h + tm[4]
                            tm[5] = tm[1] * dx + z5h + tm[5]
                        else:
                            tm[4] = z4v + tm[2] * scaled_dim + tm[4]
                            tm[5] = z5v + tm[3] * scaled_dim + tm[5]
                        continue
                chunk = tci if tci["initialized"] else ensure_tci()
                if glyph.is_diacritic:
                    scaled_dim = 0.0
                if not vertical:
                    scaled_dim *= h_scale
                    tm[4] = tm[0] * scaled_dim + z4h + tm[4]
                    tm[5] = tm[1] * scaled_dim + z5h + tm[5]
                    chunk["width"] += scaled_dim
                else:
                    tm[4] = z4v + tm[2] * scaled_dim + tm[4]
                    tm[5] = z5v + tm[3] * scaled_dim + tm[5]
                    scaled_dim = abs(scaled_dim)
                    chunk["height"] += scaled_dim
                if scaled_dim:
                    # _run_transform() inlined (same expressions)
                    p4 = r_k4 + tm[4]
                    p5 = r_k5 + tm[5]
                    if r_cm is None:
                        chunk["prevTransform"] = (r_c0, r_c1, r_c2, r_c3, p4, p5)
                    else:
                        chunk["prevTransform"] = (
                            r_c0, r_c1, r_c2, r_c3,
                            r_cm[0] * p4 + r_cm[2] * p5 + r_cm[4],
                            r_cm[1] * p4 + r_cm[3] * p5 + r_cm[5])
                gu = glyph.unicode
                # save_last_char(gu) inlined
                p = two_pos[0]
                np_ = (p + 1) % 2
                was_break = two_last[p] != " " and two_last[np_] == " "
                two_last[p] = gu
                two_pos[0] = np_
                if not keep_white_space and was_break:
                    chunk["str"].append(" ")
                chunk["str"].append(gu)
                if char_spacing:
                    if not vertical:
                        dx = char_spacing * h_scale
                        tm[4] = tm[0] * dx + z4h + tm[4]
                        tm[5] = tm[1] * dx + z5h + tm[5]
                    else:
                        dy = -char_spacing
                        tm[4] = z4v + tm[2] * dy + tm[4]
                        tm[5] = z5v + tm[3] * dy + tm[5]

        # --- operator loop ----------------------------------------------
        # argument machinery == EvaluatorPreprocessor.read
        # (pdf.worker.js:38609-38658): surplus args shift off the FRONT
        # into a persistent nonProcessedArgs buffer; a later arg-deficient
        # op borrows them back (pop → unshift); still-deficient ops are
        # skipped; an UNKNOWN command keeps its args accumulating; pushing
        # a 34th arg aborts the whole page (FormatError).
        parser = Parser(content, 0, resolve=r, fast=True,
                        known_commands=_KNOWN_COMMANDS)
        args: list = []
        non_processed: list = []
        xobjs = None
        aborted = False
        spec_get = _OP_SPEC.get
        while not aborted:
            try:
                obj = parser.parse_object()
            except FormatError as e:
                # pdf.js FormatError (>128-char command) fails the PAGE,
                # not just this stream's tail
                raise _FormatAbort(str(e)) from None
            except PDFError:
                break
            if isinstance(obj, Token):
                if obj.kind == "eof":
                    break
                op = obj.value
                spec = spec_get(op)
                if spec is None:
                    continue  # unknown command: args stay (":38616-38618")
                num_args, variable = spec
                if not variable:
                    if len(args) != num_args:
                        while len(args) > num_args:
                            non_processed.append(args.pop(0))
                        while len(args) < num_args and non_processed:
                            args.insert(0, non_processed.pop())
                    if len(args) < num_args:
                        args = []
                        continue  # skip arg-deficient op (":38642-38651")
            else:
                args.append(obj)
                if len(args) > 33:
                    # pdf.js throws FormatError("Too many arguments"),
                    # which stops the WHOLE evaluation (all nesting
                    # levels) but keeps the items already emitted
                    aborted = True
                    break
                continue
            try:
                prev_state = ts

                if op == "Tf" and len(args) >= 2:
                    fname = str(args[0]) if isinstance(args[0], (Name, str)) else None
                    fsize = float(args[1]) if isinstance(args[1], (int, float)) else 0.0
                    if not (ts.font is not None and fname == ts.font_name and fsize == ts.font_size):
                        flush_tci()
                        ts.font_name = fname
                        ts.font_size = fsize
                        font = self.load_font(fname, None, resources)
                        ts.loaded_name = font.loaded_name
                        ts.font = font
                        ts.font_matrix = font.font_matrix or FONT_IDENTITY_MATRIX
                elif op == "Ts" and args:
                    ts.text_rise = _num(args[-1])
                elif op == "Tz" and args:
                    ts.text_h_scale = _num(args[-1]) / 100.0
                elif op == "TL" and args:
                    ts.leading = _num(args[-1])
                elif op == "Td" and len(args) >= 2:
                    ts.translate_text_line_matrix(_num(args[-2]), _num(args[-1]))
                    ts.text_matrix = list(ts.text_line_matrix)
                elif op == "TD" and len(args) >= 2:
                    ts.leading = -_num(args[-1])
                    ts.translate_text_line_matrix(_num(args[-2]), _num(args[-1]))
                    ts.text_matrix = list(ts.text_line_matrix)
                elif op == "T*":
                    ts.carriage_return()
                elif op == "Tm" and len(args) >= 6:
                    a, b, c, d, e, f = (_num(v) for v in args[-6:])
                    ts.set_text_matrix(a, b, c, d, e, f)
                    ts.set_text_line_matrix(a, b, c, d, e, f)
                    update_advance_scale()
                elif op == "Tc" and args:
                    ts.char_spacing = _num(args[-1])
                elif op == "Tw" and args:
                    ts.word_spacing = _num(args[-1])
                elif op == "BT":
                    ts.text_matrix = list(IDENTITY)
                    ts.text_line_matrix = list(IDENTITY)
                elif op == "TJ" and args:
                    if ts.font is None:
                        args = []
                        continue
                    space_factor = (1 if ts.font.vertical else -1) * ts.font_size / 1000.0
                    buf: list[bytes] = []
                    elements = args[-1] if isinstance(args[-1], list) else []
                    for el in elements:
                        if isinstance(el, bytes):
                            buf.append(el)
                        elif isinstance(el, (int, float)) and el != 0:
                            s = b"".join(buf)
                            buf = []
                            build_text_content_item(s, el * space_factor)
                    if buf:
                        build_text_content_item(b"".join(buf), 0.0)
                elif op == "Tj" and args:
                    if ts.font is None:
                        args = []
                        continue
                    build_text_content_item(args[-1] if isinstance(args[-1], bytes) else b"", 0.0)
                elif op == "'" and args:
                    if ts.font is None:
                        args = []
                        continue
                    ts.carriage_return()
                    build_text_content_item(args[-1] if isinstance(args[-1], bytes) else b"", 0.0)
                elif op == '"' and len(args) >= 3:
                    if ts.font is None:
                        args = []
                        continue
                    ts.word_spacing = _num(args[-3])
                    ts.char_spacing = _num(args[-2])
                    ts.carriage_return()
                    build_text_content_item(args[-1] if isinstance(args[-1], bytes) else b"", 0.0)
                elif op == "q":
                    state_stack.append(ts.clone())
                elif op == "Q":
                    if state_stack:
                        new_ts = state_stack.pop()
                        if (prev_state.font is not new_ts.font
                                or prev_state.font_size != new_ts.font_size
                                or prev_state.font_name != new_ts.font_name):
                            flush_tci()
                        ts = new_ts
                elif op == "cm" and len(args) >= 6:
                    m = tuple(_num(v) for v in args[-6:])
                    ts.ctm = mat_mul(ts.ctm, m)
                elif op == "Do" and args:
                    flush_tci()
                    if xobjs is None:
                        xobjs = r(resources.get("XObject")) or {}
                    xname = args[-1]
                    if isinstance(xname, (Name, str)) and depth < 16:
                        try:
                            xobj = r(xobjs.get(str(xname)))
                        except PDFError:
                            xobj = None
                        if isinstance(xobj, StreamObj) and str(r(xobj.dict.get("Subtype", ""))) == "Form":
                            sub_state = ts.clone()
                            matrix = r(xobj.dict.get("Matrix"))
                            if isinstance(matrix, list) and len(matrix) == 6:
                                sub_state.ctm = mat_mul(sub_state.ctm, tuple(_num(r(v)) for v in matrix))
                                sub_state.refresh_nan_risk()
                            sub_res = r(xobj.dict.get("Resources")) or resources
                            try:
                                self._run(xobj.get_data(r), sub_res, sub_state, items,
                                          styles, view_box, include_marked_content,
                                          disable_normalization, keep_white_space,
                                          depth + 1, seen_styles, marked_level)
                            except _FormatAbort:
                                aborted = True  # stops every nesting level
                            except PDFError:
                                pass
                elif op == "gs" and args:
                    gname = args[-1]
                    if isinstance(gname, (Name, str)):
                        try:
                            ext = r(resources.get("ExtGState"))
                            gstate = r(ext.get(str(gname))) if isinstance(ext, dict) else None
                            gfont = r(gstate.get("Font")) if isinstance(gstate, dict) else None
                        except PDFError:
                            gfont = None
                        if isinstance(gfont, list) and len(gfont) >= 2:
                            flush_tci()
                            ts.font_name = None
                            ts.font_size = _num(r(gfont[1]))
                            font = self.load_font(None, gfont[0], resources)
                            ts.loaded_name = font.loaded_name
                            ts.font = font
                            ts.font_matrix = font.font_matrix or FONT_IDENTITY_MATRIX
                elif op == "BI":
                    # inline image (reference: makeInlineImage + EI scan,
                    # build/pdf.worker.js:13387,13449): consume the param
                    # dict up to ID, then raw-scan past the binary payload
                    # to a ws-delimited EI so image bytes can never be
                    # misread as text operators
                    while True:
                        t = parser.parse_object()
                        if isinstance(t, Token) and (
                                t.kind == "eof" or (t.kind == "op" and t.value == "ID")):
                            break
                    data_bytes = parser.lexer.data
                    scan = parser.lexer.pos + 1  # one ws byte after ID
                    end_n = len(data_bytes)
                    while True:
                        idx = data_bytes.find(b"EI", scan)
                        if idx == -1:
                            parser.lexer.pos = end_n
                            break
                        before_ok = idx == 0 or data_bytes[idx - 1] in b"\x00\t\n\x0c\r "
                        nxt = data_bytes[idx + 2: idx + 3]
                        after_ok = nxt == b"" or nxt[0] in b"\x00\t\n\x0c\r ()<>[]{}/%"
                        if before_ok and after_ok:
                            parser.lexer.pos = idx + 2
                            break
                        scan = idx + 2
                    parser.drop_lookahead()
                elif op in ("BMC", "BDC"):
                    flush_tci()
                    if include_marked_content:
                        marked_level[0] += 1
                        item = {"type": "beginMarkedContent" if op == "BMC" else "beginMarkedContentProps",
                                "tag": str(args[0]) if args and isinstance(args[0], (Name, str)) else None}
                        if op == "BDC":
                            mcid = None
                            if len(args) >= 2 and isinstance(args[1], dict):
                                mcid = r(args[1].get("MCID"))
                            item["id"] = f"p_mc{mcid}" if isinstance(mcid, int) else None
                        items.append(item)
                elif op == "EMC":
                    flush_tci()
                    if include_marked_content and marked_level[0] > 0:
                        marked_level[0] -= 1
                        items.append({"type": "endMarkedContent"})
            except (PDFError, ValueError, TypeError, IndexError, OverflowError, ZeroDivisionError):
                pass  # absorb per-operator errors (pdf.js ignoreErrors analogue)
            if op in _STATE_NAN_OPS:
                ts.refresh_nan_risk()
            args = []

        flush_tci()
        if aborted and depth > 0:
            raise _FormatAbort("Too many arguments")


def _sign(x: float) -> int:
    return (x > 0) - (x < 0)


class _FormatAbort(Exception):
    """FormatError analogue that must fail the PAGE: deliberately NOT a
    PDFError so neither the per-operator absorb nor the Do-recursion
    absorb swallows it — only the per-page absorb in api.parse_doc does
    (matching pdf.js getTextContent rejecting on FormatError)."""


# EvaluatorPreprocessor.opMap (pdf.worker.js:38530-38594): op →
# (numArgs, variableArgs) for every known content-stream command — needed
# even for non-text ops, because their surplus/deficit arg handling feeds
# the shared nonProcessedArgs buffer.
_OP_SPEC: dict[str, tuple[int, bool]] = {
    "w": (1, False), "J": (1, False), "j": (1, False), "M": (1, False),
    "d": (2, False), "ri": (1, False), "i": (1, False), "gs": (1, False),
    "q": (0, False), "Q": (0, False), "cm": (6, False), "m": (2, False),
    "l": (2, False), "c": (6, False), "v": (4, False), "y": (4, False),
    "h": (0, False), "re": (4, False), "S": (0, False), "s": (0, False),
    "f": (0, False), "F": (0, False), "f*": (0, False), "B": (0, False),
    "B*": (0, False), "b": (0, False), "b*": (0, False), "n": (0, False),
    "W": (0, False), "W*": (0, False), "BT": (0, False), "ET": (0, False),
    "Tc": (1, False), "Tw": (1, False), "Tz": (1, False), "TL": (1, False),
    "Tf": (2, False), "Tr": (1, False), "Ts": (1, False), "Td": (2, False),
    "TD": (2, False), "Tm": (6, False), "T*": (0, False), "Tj": (1, False),
    "TJ": (1, False), "'": (1, False), '"': (3, False), "d0": (2, False),
    "d1": (6, False), "CS": (1, False), "cs": (1, False), "SC": (4, True),
    "SCN": (33, True), "sc": (4, True), "scn": (33, True), "G": (1, False),
    "g": (1, False), "RG": (3, False), "rg": (3, False), "K": (4, False),
    "k": (4, False), "sh": (1, False), "BI": (0, False), "ID": (0, False),
    "EI": (1, False), "Do": (1, False), "MP": (1, False), "DP": (2, False),
    "BMC": (1, False), "BDC": (2, False), "EMC": (0, False),
    "BX": (0, False), "EX": (0, False),
}

# Lexer knownCommands for content streams (pdf.worker.js:38598): the
# opMap keys PLUS its explicit null intermediates (:38590-38594) that
# keep BMC/BDC (prefix B known) and the false/null keywords (prefixes
# f/n known) from splitting at a shorter known command
_KNOWN_COMMANDS = frozenset(k.encode("latin-1") for k in _OP_SPEC) | frozenset(
    (b"BM", b"BD", b"true", b"fa", b"fal", b"fals", b"false",
     b"nu", b"nul", b"null"))

# operators whose handlers write TextState numeric fields — the sticky
# nan_risk flag refreshes here, once per op, instead of per glyph / per
# transform call
_STATE_NAN_OPS = frozenset(
    ("Tf", "Ts", "Tz", "TL", "Td", "TD", "T*", "Tm", "Tc", "Tw",
     "BT", "'", '\"', "cm", "gs")
)

_JS_NUMERIC_RE = re.compile(
    r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?\Z")


def _num(v: Any) -> float:
    """JS arithmetic coercion for operator args: numbers pass, null → 0,
    a PDF string converts per Number(str) (trimmed; '' → 0; decimal/hex/
    Infinity forms; else NaN), anything else (Name, dict, Ref) → NaN —
    matching what pdf.js handler arithmetic does to a borrowed or
    misplaced operand."""
    if isinstance(v, (int, float)):
        return float(v)
    if v is None:
        return 0.0
    if isinstance(v, bytes):
        s = v.decode("latin-1").strip(" \t\n\r\f\v")
        if not s:
            return 0.0
        if _JS_NUMERIC_RE.match(s):
            return float(s)
        try:
            if s[:2] in ("0x", "0X"):
                return float(int(s, 16))
        except ValueError:
            return math.nan
        if s in ("Infinity", "+Infinity"):
            return math.inf
        if s == "-Infinity":
            return -math.inf
        return math.nan
    return math.nan
