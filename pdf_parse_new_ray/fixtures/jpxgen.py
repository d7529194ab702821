"""Deterministic JPEG2000 encoder for fixtures (ITU-T T.800, lossless).

The mirror image of pdfkernel/jpx.py: reversible 5/3 forward DWT, EBCOT
T1 bitplane encoding on the shared MQ coder, tag-tree packet headers,
LRCP codestreams with optional multi-tile grids (DWT-aligned) and
multiple quality layers, reversible color transform and a JP2 container
wrapper.  Streams from here are decoded by BOTH our
decoder and the reference's openjpeg wasm (tools/jpx_ref.py) and must
produce identical samples — conformance of the pair is established by
that three-way agreement.
"""

from __future__ import annotations

import struct

import numpy as np

from ..pdfkernel.jpx import (T1Block, _sizes_per_level, _CTX_RL,
                             _CTX_UNIFORM, t1_initial_contexts,
                             _CBSTYLE_RESET, _CBSTYLE_TERMALL,
                             _CBSTYLE_VSC, _CBSTYLE_SEGSYM,
                             _CBSTYLE_BYPASS, _pass_is_raw,
                             _terminates_after)
from .jbig2gen import MQEncoder


class RawEncoder:
    """Raw (bypass) bit writer, D.6.2 — MSB-first with the stuffed
    zero MSB after every 0xFF byte; mirror of jpx._RawDecoder."""

    def __init__(self):
        self.out = bytearray()
        self.c = 0
        self.ct = 8
        self.width = 8

    def encode_bit(self, bit: int) -> None:
        self.ct -= 1
        self.c |= bit << self.ct
        if self.ct == 0:
            self.out.append(self.c)
            self.width = 7 if self.c == 0xFF else 8
            self.c = 0
            self.ct = self.width

    def finish(self) -> bytes:
        if self.ct < self.width:
            self.out.append(self.c)  # zero-padded tail bits
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)  # a segment may not end on 0xFF
        return bytes(self.out)


# ---------------------------------------------------------------------------
# forward reversible 5/3 DWT (T.800 F.4)
# ---------------------------------------------------------------------------

def _fdwt_1d(x: np.ndarray, axis: int):
    if axis == 0:
        x = x.T
    n = x.shape[1]
    if n == 1:
        out = x.copy()
        return (out, np.zeros((x.shape[0], 0), dtype=np.int64)) \
            if axis == 1 else (out.T, np.zeros((0, x.shape[0]),
                                               dtype=np.int64))
    n_hi = n >> 1
    n_lo = n - n_hi
    even = x[:, 0::2].astype(np.int64)
    odd = x[:, 1::2].astype(np.int64)
    # H[k] = x[2k+1] - floor((x[2k] + x[2k+2]) / 2), x[n] = x[n-2]
    epad = np.empty((x.shape[0], n_hi + 1), dtype=np.int64)
    epad[:, :n_lo] = even
    if n_hi + 1 > n_lo:
        epad[:, -1] = even[:, -1]
    high = odd - ((epad[:, :n_hi] + epad[:, 1:n_hi + 1]) >> 1)
    # L[k] = x[2k] + floor((H[k-1] + H[k] + 2) / 4), symmetric ext
    hpad = np.empty((x.shape[0], n_hi + 2), dtype=np.int64)
    hpad[:, 1:-1] = high
    hpad[:, 0] = high[:, 0]
    hpad[:, -1] = high[:, -1]
    low = even + ((hpad[:, :n_lo] + hpad[:, 1:n_lo + 1] + 2) >> 2)
    if axis == 0:
        return low.T, high.T
    return low, high


def fdwt53(img: np.ndarray, levels: int):
    """Returns (ll, [(hl, lh, hh)] coarsest-first) matching idwt53."""
    cur = img.astype(np.int64)
    bands = []
    for _ in range(levels):
        top, bot = _fdwt_1d(cur, axis=0)      # columns: L rows / H rows
        ll, hl = _fdwt_1d(top, axis=1)
        lh, hh = _fdwt_1d(bot, axis=1)
        bands.append((hl, lh, hh))
        cur = ll
    bands.reverse()
    return cur, bands


def forward_rct(r: np.ndarray, g: np.ndarray, b: np.ndarray):
    y = (r + 2 * g + b) >> 2
    u = b - g
    v = r - g
    return y, u, v


# ---------------------------------------------------------------------------
# forward irreversible 9/7 DWT (T.800 F.4.8.1) + ICT — the lossy-path
# mirror of pdfkernel.jpx.idwt97/inverse_ict, used by the perfect-
# reconstruction unit tests and by lossy fixture generation
# (encode_jpx(lossy=True)).
# ---------------------------------------------------------------------------

def _fdwt97_1d(x: np.ndarray, axis: int):
    from ..pdfkernel.jpx import (_DWT_ALPHA, _DWT_BETA, _DWT_GAMMA,
                                 _DWT_DELTA, _DWT_K, _lift_even, _lift_odd)
    if axis == 0:
        x = x.T
    n = x.shape[1]
    if n == 1:
        out = x.astype(np.float32)
        return (out, np.zeros((x.shape[0], 0), dtype=np.float32)) \
            if axis == 1 else (out.T, np.zeros((0, x.shape[0]),
                                               dtype=np.float32))
    even = np.ascontiguousarray(x[:, 0::2], dtype=np.float32)
    odd = np.ascontiguousarray(x[:, 1::2], dtype=np.float32)
    _lift_odd(odd, even, _DWT_ALPHA)
    _lift_even(even, odd, _DWT_BETA)
    _lift_odd(odd, even, _DWT_GAMMA)
    _lift_even(even, odd, _DWT_DELTA)
    low = (even * np.float32(1.0 / _DWT_K)).astype(np.float32)
    high = (odd * _DWT_K).astype(np.float32)
    if axis == 0:
        return low.T, high.T
    return low, high


def fdwt97(img: np.ndarray, levels: int):
    """Returns (ll, [(hl, lh, hh)] coarsest-first) matching idwt97."""
    cur = np.asarray(img, dtype=np.float32)
    bands = []
    for _ in range(levels):
        top, bot = _fdwt97_1d(cur, axis=0)
        ll, hl = _fdwt97_1d(top, axis=1)
        lh, hh = _fdwt97_1d(bot, axis=1)
        bands.append((hl, lh, hh))
        cur = ll
    bands.reverse()
    return cur, bands


def forward_ict(r: np.ndarray, g: np.ndarray, b: np.ndarray):
    r = np.asarray(r, np.float32)
    g = np.asarray(g, np.float32)
    b = np.asarray(b, np.float32)
    y = np.float32(0.299) * r + np.float32(0.587) * g + np.float32(0.114) * b
    cb = np.float32(-0.168736) * r - np.float32(0.331264) * g \
        + np.float32(0.5) * b
    cr = np.float32(0.5) * r - np.float32(0.418688) * g \
        - np.float32(0.081312) * b
    return y, cb, cr


# ---------------------------------------------------------------------------
# T1 encoder — mirrors pdfkernel.jpx pass structure bit for bit
# ---------------------------------------------------------------------------

def t1_encode_block(coeffs: np.ndarray, band: str, mb: int,
                    flags: int = 0):
    """Encode one codeblock.  Returns (data, zero_bp, num_passes,
    pieces) — pieces is the [(n_passes, byte_length)] list of
    terminated segments in data (a single entry when no termination
    style is active) — or None when the block is all-zero (not
    included).  flags: SPcod codeblock-style bits (BYPASS / RESET /
    TERMALL / VSC / SEGSYM), mirroring t1_decode_block."""
    h, w = coeffs.shape
    mags = np.abs(coeffs).astype(np.int64)
    negs = coeffs < 0
    max_mag = int(mags.max()) if mags.size else 0
    if max_mag == 0:
        return None
    msb = max_mag.bit_length()
    if msb > mb:
        raise ValueError(f"magnitude needs {msb} bitplanes > Mb={mb}")
    zero_bp = mb - msb
    st = T1Block(w, h, band, vsc=bool(flags & _CBSTYLE_VSC))
    mq = MQEncoder()
    raw = None  # active RawEncoder during bypass SPP/MRP passes
    cx = t1_initial_contexts()

    def emit(cxa, ctx, bit):
        mq.encode(cxa, ctx, bit)

    def spp(p, rawmode):
        st.visited[:] = 0
        for y0 in range(0, h, 4):
            y1 = min(y0 + 4, h)
            for x in range(w):
                for y in range(y0, y1):
                    if st.sig[y + 1, x + 1] or \
                            not st.has_sig_neighbor(x, y):
                        continue
                    st.visited[y, x] = 1
                    bit = int((mags[y, x] >> p) & 1)
                    if rawmode:  # D.6.1: raw bit + raw sign, no ctx
                        raw.encode_bit(bit)
                        if bit:
                            raw.encode_bit(int(negs[y, x]))
                            st.set_significant(x, y, bool(negs[y, x]), p)
                        continue
                    emit(cx, st.zc_context(x, y), bit)
                    if bit:
                        ctx, xor = st.sc_context(x, y)
                        emit(cx, ctx, int(negs[y, x]) ^ xor)
                        st.set_significant(x, y, bool(negs[y, x]), p)

    def mrp(p, rawmode):
        for y0 in range(0, h, 4):
            y1 = min(y0 + 4, h)
            for x in range(w):
                for y in range(y0, y1):
                    if not st.sig[y + 1, x + 1] or st.visited[y, x]:
                        continue
                    bit = int((mags[y, x] >> p) & 1)
                    if rawmode:
                        raw.encode_bit(bit)
                    else:
                        emit(cx, st.mr_context(x, y), bit)
                    st.refined[y, x] = 1

    def cup(p, rawmode):
        for y0 in range(0, h, 4):
            y1 = min(y0 + 4, h)
            full = (y1 - y0) == 4
            for x in range(w):
                y = y0
                if full:
                    run_ok = True
                    for yy in range(y0, y1):
                        if st.sig[yy + 1, x + 1] or st.visited[yy, x] or \
                                st.has_sig_neighbor(x, yy):
                            run_ok = False
                            break
                    if run_ok:
                        bits = [int((mags[yy, x] >> p) & 1)
                                for yy in range(y0, y1)]
                        if not any(bits):
                            emit(cx, _CTX_RL, 0)
                            continue
                        emit(cx, _CTX_RL, 1)
                        first = bits.index(1)
                        emit(cx, _CTX_UNIFORM, (first >> 1) & 1)
                        emit(cx, _CTX_UNIFORM, first & 1)
                        y = y0 + first
                        ctx, xor = st.sc_context(x, y)
                        emit(cx, ctx, int(negs[y, x]) ^ xor)
                        st.set_significant(x, y, bool(negs[y, x]), p)
                        y += 1
                while y < y1:
                    if not st.sig[y + 1, x + 1] and not st.visited[y, x]:
                        bit = int((mags[y, x] >> p) & 1)
                        emit(cx, st.zc_context(x, y), bit)
                        if bit:
                            ctx, xor = st.sc_context(x, y)
                            emit(cx, ctx, int(negs[y, x]) ^ xor)
                            st.set_significant(x, y, bool(negs[y, x]), p)
                    y += 1
        st.visited[:] = 0

    schedule = [(cup, msb - 1)]
    for p in range(msb - 2, -1, -1):
        schedule += [(spp, p), (mrp, p), (cup, p)]
    num_passes = 3 * msb - 2
    segments = []
    pieces = []
    pending = 0
    for idx, (fn, p) in enumerate(schedule):
        rawmode = _pass_is_raw(idx, flags)
        if rawmode and raw is None:
            raw = RawEncoder()
        fn(p, rawmode)
        if fn is cup and flags & _CBSTYLE_SEGSYM:
            for b in (1, 0, 1, 0):  # segmentation symbol (D.4.2)
                emit(cx, _CTX_UNIFORM, b)
        pending += 1
        if _terminates_after(idx, flags) or idx == num_passes - 1:
            seg = raw.finish() if rawmode else mq.finish_raw()
            segments.append(seg)
            pieces.append((pending, len(seg)))
            pending = 0
            if rawmode:
                raw = None
            else:
                mq = MQEncoder()
        if flags & _CBSTYLE_RESET:
            cx[:] = t1_initial_contexts()
    return b"".join(segments), zero_bp, num_passes, pieces


# ---------------------------------------------------------------------------
# tag-tree encoder + packet-header bit writer
# ---------------------------------------------------------------------------

class TagTreeEncoder:
    def __init__(self, values: np.ndarray):
        h, w = values.shape
        self.levels = [values.astype(np.int32)]
        while w > 1 or h > 1:
            prev = self.levels[-1]
            w = (w + 1) >> 1
            h = (h + 1) >> 1
            nxt = np.full((h, w), 2 ** 30, dtype=np.int32)
            for yy in range(prev.shape[0]):
                for xx in range(prev.shape[1]):
                    nxt[yy >> 1, xx >> 1] = min(nxt[yy >> 1, xx >> 1],
                                                prev[yy, xx])
            self.levels.append(nxt)
        self.low = [np.zeros_like(v) for v in self.levels]
        self.known = [np.zeros(v.shape, dtype=bool) for v in self.levels]

    def encode(self, x: int, y: int, threshold: int, write_bit) -> None:
        low = 0
        for lvl in range(len(self.levels) - 1, -1, -1):
            cx, cy = x >> lvl, y >> lvl
            if self.low[lvl][cy, cx] < low:
                self.low[lvl][cy, cx] = low
            value = self.levels[lvl][cy, cx]
            while not self.known[lvl][cy, cx] and \
                    self.low[lvl][cy, cx] < threshold:
                if self.low[lvl][cy, cx] < value:
                    write_bit(0)
                    self.low[lvl][cy, cx] += 1
                else:
                    write_bit(1)
                    self.known[lvl][cy, cx] = True
            low = self.low[lvl][cy, cx]
            if not self.known[lvl][cy, cx]:
                return
    def encode_until_known(self, x: int, y: int, write_bit) -> None:
        t = 1
        while not (self.known[0][y, x]
                   and self.low[0][y, x] < t):
            self.encode(x, y, t, write_bit)
            t += 1


class _BitWriter:
    """MSB-first with 0xFF stuffing; align() guarantees the header does
    not end on 0xFF (mirrors pdfkernel.jpx._BitReader)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, bit: int) -> None:
        width = 7 if self.out and self.out[-1] == 0xFF else 8
        self.acc = (self.acc << 1) | bit
        self.nbits += 1
        if self.nbits == width:
            self.out.append(self.acc)
            self.acc = 0
            self.nbits = 0

    def write_bits(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.write((value >> i) & 1)

    def finish(self) -> bytes:
        if self.nbits:
            width = 7 if self.out and self.out[-1] == 0xFF else 8
            self.out.append(self.acc << (width - self.nbits))
            self.acc = 0
            self.nbits = 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)
        return bytes(self.out)


def _write_passes(bw: _BitWriter, n: int) -> None:
    if n == 1:
        bw.write(0)
    elif n == 2:
        bw.write(1)
        bw.write(0)
    elif n <= 5:
        bw.write(1)
        bw.write(1)
        bw.write_bits(n - 3, 2)
    elif n <= 36:
        bw.write(1)
        bw.write(1)
        bw.write_bits(3, 2)
        bw.write_bits(n - 6, 5)
    else:
        bw.write(1)
        bw.write(1)
        bw.write_bits(3, 2)
        bw.write_bits(31, 5)
        bw.write_bits(n - 37, 7)


# ---------------------------------------------------------------------------
# codestream assembly
# ---------------------------------------------------------------------------

_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}


def encode_jpx(img: np.ndarray, levels: int = 2, cb_exp: int = 6,
               rct: bool = True, layers: int = 1,
               tiles: tuple[int, int] = (1, 1), lossy: bool = False,
               quant_mant: int = 0,
               qcc_mants: dict[int, int] | None = None,
               coc_cbs: dict[int, int] | None = None,
               subsampling: dict[int, tuple[int, int]] | None = None,
               cb_style: int = 0, depth: int = 8,
               precincts=None, prog: int = 0,
               sop: bool = False, eph: bool = False,
               roi_rect: tuple[int, int, int, int] | None = None,
               roi_shift: int | None = None,
               poc: list | None = None,
               ppm: bool = False, ppt: bool = False,
               tile_parts: int = 1, signed: bool = False,
               comp_depths: dict[int, int] | None = None,
               comp_signed: dict[int, bool] | None = None) -> bytes:
    """img: (h, w) or (h, w, 3) uint8 → raw JPEG2000 codestream
    (LRCP; lossless 5/3 by default).  layers=2 assigns each codeblock
    wholly to a quality layer (alternating) to exercise multi-layer
    packet headers; tiles=(tx, ty) splits the image into a tile grid
    aligned to the DWT levels.  lossy=True switches to the irreversible
    9/7 transform + ICT with scalar-expounded quantization (QCD style
    2), εb = Rb so Δb = 1 + quant_mant/2048 — near-lossless at mant 0,
    visibly coarser as the mantissa grows.  qcc_mants (comp → mantissa)
    emits per-component QCC overrides; coc_cbs (comp → codeblock exp)
    emits per-component COC codeblock-size overrides; cb_style sets
    the SPcod codeblock-style bits (BYPASS 0x01 / RESET 0x02 /
    TERMALL 0x04 / VSC 0x08 / PTERM 0x10 / SEGSYM 0x20 — PTERM is
    accepted but segments use the standard flush, which conformant
    decoders accept).  subsampling
    (comp → (dx, dy)) decimates components on the reference grid (the
    4:2:0-style chroma layout); requires a single tile and no
    inter-component transform (rct=False)."""
    if img.ndim == 2:
        mct = 0
        n_comp = 1
    elif img.shape[2] == 3:
        mct = 1 if rct else 0
        n_comp = 3
    else:
        raise ValueError("1- or 3-component images only")
    h, w = img.shape[:2]
    if cb_style & ~0x3F:
        raise ValueError("unsupported codeblock-style bits")
    if precincts is not None:  # normalize to [(ppx, ppy)] per res
        if isinstance(precincts, int):
            precincts = [precincts] * (levels + 1)
        precincts = [(p, p) if isinstance(p, int) else tuple(p)
                     for p in precincts]
        if len(precincts) != levels + 1:
            raise ValueError("need one precinct size per resolution")
        for r, (px, py) in enumerate(precincts):
            if not (0 <= px <= 15 and 0 <= py <= 15) or \
                    (r > 0 and (px == 0 or py == 0)):
                raise ValueError("invalid precinct exponent")
    if subsampling:
        if tiles != (1, 1):
            raise ValueError("subsampling requires a single tile")
        if mct:
            raise ValueError("subsampling requires rct=False (no MCT)")
    n_tx, n_ty = tiles
    align = 1 << levels
    if n_tx > 1:
        xt = max(align, ((w + n_tx - 1) // n_tx + align - 1)
                 // align * align)
    else:
        xt = max(w, 1)
    if n_ty > 1:
        yt = max(align, ((h + n_ty - 1) // n_ty + align - 1)
                 // align * align)
    else:
        yt = max(h, 1)
    n_tx = (w + xt - 1) // xt
    n_ty = (h + yt - 1) // yt
    # per-component depth/signedness (SIZ Ssiz varies per component);
    # comp_depths / comp_signed override the uniform depth / signed
    depths = [(comp_depths or {}).get(c, depth) for c in range(n_comp)]
    signs = [bool((comp_signed or {}).get(c, signed))
             for c in range(n_comp)]
    for d_c in depths:
        if not 1 <= d_c <= 16:
            raise ValueError("depth must be 1..16")
    if any(signs):
        # signed components (SIZ Ssiz bit 7): samples are already
        # centered — NO DC level shift (B.1.4 applies only to unsigned)
        if lossy:
            raise ValueError("signed lossy encode not supported")
        if img.dtype.kind != "i":
            raise ValueError("signed components need a signed "
                             "integer image")
    halfs = [0 if sg else 1 << (d_c - 1)
             for d_c, sg in zip(depths, signs)]
    # per-tile transforms first so guard bits cover every tile
    tile_planes = []
    for ty in range(n_ty):
        for tx in range(n_tx):
            sub = img[ty * yt:(ty + 1) * yt, tx * xt:(tx + 1) * xt]
            chans = [sub] if sub.ndim == 2 \
                else [sub[..., i] for i in range(3)]
            if lossy:
                planes = [ch.astype(np.float32) - np.float32(halfs[i])
                          for i, ch in enumerate(chans)]
                if len(planes) == 3 and rct:
                    planes = list(forward_ict(*planes))
            else:
                planes = [ch.astype(np.int64) - halfs[i]
                          for i, ch in enumerate(chans)]
                if len(planes) == 3 and rct:
                    planes = list(forward_rct(*planes))
            def _quant(a: np.ndarray, mant: int) -> np.ndarray:
                # deadzone scalar quantizer (E.1): sign·floor(|c|/Δb)
                d = np.float32(1.0 + mant / 2048.0)
                return (np.sign(a)
                        * np.floor(np.abs(a) / d)).astype(np.int64)

            comp_bands = []
            for ci, plane in enumerate(planes):
                dx, dy = (subsampling or {}).get(ci, (1, 1))
                if dx != 1 or dy != 1:
                    plane = plane[::dy, ::dx]
                m_c = (qcc_mants or {}).get(ci, quant_mant)
                if lossy:
                    ll, chain = fdwt97(plane, levels)
                    bands = {(0, "LL"): _quant(ll, m_c)}
                    for r_i, (hl, lh, hh) in enumerate(chain):
                        bands[(r_i + 1, "HL")] = _quant(hl, m_c)
                        bands[(r_i + 1, "LH")] = _quant(lh, m_c)
                        bands[(r_i + 1, "HH")] = _quant(hh, m_c)
                else:
                    ll, chain = fdwt53(plane, levels)
                    bands = {(0, "LL"): ll}
                    for r_i, (hl, lh, hh) in enumerate(chain):
                        bands[(r_i + 1, "HL")] = hl
                        bands[(r_i + 1, "LH")] = lh
                        bands[(r_i + 1, "HH")] = hh
                comp_bands.append(bands)
            tile_planes.append(comp_bands)
    guard = 2
    for comp_bands in tile_planes:
        for ci, bands in enumerate(comp_bands):
            for (res, name), arr in bands.items():
                if arr.size == 0:
                    continue
                msb = int(np.abs(arr).max()).bit_length()
                guard = max(guard, msb - (depths[ci] + _GAIN[name]) + 1)
    if guard > 7:
        # G is a 3-bit field; silently clamping would corrupt Mb
        # (possible only with extreme mixed-depth MCT combinations)
        raise ValueError(f"required guard bits {guard} exceed 7")
    # maxshift ROI (T.800 Annex H / E.1.2): scale the quantized ROI
    # coefficients up by 2^SPrgn, with SPrgn at least the background's
    # magnitude bitplane count so the decoder can separate the two by
    # threshold alone.  The per-band mask is the image rect scaled to
    # subband coordinates.  Mb gains SPrgn (H.2: Mb = G + eps_b - 1 +
    # SPrgn) — carried into the T1 encode via roi_shifts, NOT the QCD
    # exponents.
    roi_shifts = [0] * n_comp
    if roi_rect is not None:
        rx0, ry0, rx1, ry1 = roi_rect
        # +1: the reference decoder thresholds its t1-scale values
        # (2·mag+1), so the background separates only when
        # 2·max_bg+1 < 2^s — one bit more than coefficient-scale
        # maxshift would need
        s_auto = 2
        for comp_bands in tile_planes:
            for bands in comp_bands:
                for (res, name), arr in bands.items():
                    if arr.size:
                        s_auto = max(
                            s_auto,
                            int(np.abs(arr).max()).bit_length() + 1)
        s = s_auto if roi_shift is None else roi_shift
        if s < s_auto:
            raise ValueError(f"roi_shift {s} below background "
                             f"bitplanes {s_auto}")
        roi_shifts = [s] * n_comp
        for ti, comp_bands in enumerate(tile_planes):
            tx0 = (ti % n_tx) * xt
            ty0 = (ti // n_tx) * yt
            for ci, bands in enumerate(comp_bands):
                dx_, dy_ = (subsampling or {}).get(ci, (1, 1))
                for (res, name), arr in bands.items():
                    if arr.size == 0:
                        continue
                    lvl = levels if res == 0 else levels - res + 1
                    # band-local rect: image coords → component coords
                    # → subband coords at this level, tile-relative
                    bx0 = max(0, (rx0 // dx_ >> lvl) - (tx0 // dx_ >> lvl))
                    by0 = max(0, (ry0 // dy_ >> lvl) - (ty0 // dy_ >> lvl))
                    bx1 = max(0, (-(-rx1 // dx_) + (1 << lvl) - 1 >> lvl)
                              - (tx0 // dx_ >> lvl))
                    by1 = max(0, (-(-ry1 // dy_) + (1 << lvl) - 1 >> lvl)
                              - (ty0 // dy_ >> lvl))
                    arr[by0:by1, bx0:bx1] <<= s
    # markers
    out = bytearray(b"\xff\x4f")  # SOC
    siz = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, xt, yt, 0, 0, n_comp)
    siz += b"".join(
        struct.pack(">BBB", (depths[c] - 1) | (0x80 if signs[c] else 0),
                    *(subsampling or {}).get(c, (1, 1)))
        for c in range(n_comp))
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    prec_bytes = b"" if precincts is None else bytes(
        px | (py << 4) for (px, py) in precincts)
    if not 0 <= prog <= 4:
        raise ValueError("progression order must be 0..4")
    scod = (1 if precincts else 0) | (2 if sop else 0) | (4 if eph else 0)
    cod = struct.pack(">BBHBBBBBB", scod, prog, layers,
                      mct, levels, cb_exp - 2, cb_exp - 2, cb_style,
                      0 if lossy else 1) + prec_bytes
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    if poc:  # A.6.6: (RSpoc, CSpoc, LYEpoc, REpoc, CEpoc, Ppoc) each
        pb = b"".join(struct.pack(">BBHBBB", rs, cs_, lye, re_, ce, pp)
                      for rs, cs_, lye, re_, ce, pp in poc)
        out += b"\xff\x5f" + struct.pack(">H", len(pb) + 2) + pb
    for ci, ce in sorted((coc_cbs or {}).items()):
        spcoc = struct.pack(">BBBBBBB", ci, 1 if precincts else 0,
                            levels, ce - 2, ce - 2,
                            cb_style, 0 if lossy else 1) + prec_bytes
        out += b"\xff\x53" + struct.pack(">H", len(spcoc) + 2) + spcoc
    if lossy:  # scalar expounded: 16-bit (εb<<11 | μb) per subband
        qcd = bytes([(guard << 5) | 2]) + b"".join(
            struct.pack(">H", ((depths[0] + g) << 11) | quant_mant)
            for g in _qcd_gains(levels))
    else:
        qcd = bytes([guard << 5]) + bytes(
            ((depths[0] + g) << 3) for g in _qcd_gains(levels))
    out += b"\xff\x5c" + struct.pack(">H", len(qcd) + 2) + qcd
    # per-component quantization overrides: explicit mantissas (lossy)
    # and/or exponents for components whose depth differs from comp 0
    # (εb tracks the component's own Rb = depth + gain)
    qcc_set = {c for c in range(n_comp) if depths[c] != depths[0]}
    if lossy:
        qcc_set |= set(qcc_mants or {})
    for ci in sorted(qcc_set):
        if lossy:
            m = (qcc_mants or {}).get(ci, quant_mant)
            qb = bytes([ci, (guard << 5) | 2]) + b"".join(
                struct.pack(">H", ((depths[ci] + g) << 11) | m)
                for g in _qcd_gains(levels))
        else:
            qb = bytes([ci, guard << 5]) + bytes(
                ((depths[ci] + g) << 3) for g in _qcd_gains(levels))
        out += b"\xff\x5d" + struct.pack(">H", len(qb) + 2) + qb
    for ci, s in enumerate(roi_shifts):
        if s:  # RGN (A.6.3): Crgn, Srgn=0 (implicit/maxshift), SPrgn
            out += b"\xff\x5e" + struct.pack(">HBBB", 5, ci, 0, s)
    if ppm and ppt:
        raise ValueError("PPM and PPT are mutually exclusive")
    if tile_parts < 1:
        raise ValueError("tile_parts must be >= 1")
    # per tile: packet pieces split into `tile_parts` runs at packet
    # boundaries (B.8) — the layout rate-allocated encoders emit (one
    # tile-part per layer); each run becomes its own SOT..SOD segment
    # with TPsot/TNsot set
    parts_out = []  # [(isot, tpsot, tnsot, body, hdrs_or_None)]
    for isot, comp_bands in enumerate(tile_planes):
        tx0 = (isot % n_tx) * xt
        ty0 = (isot // n_tx) * yt
        cbs = [1 << (coc_cbs or {}).get(c, cb_exp)
               for c in range(n_comp)]
        pkts, hdrs = _encode_tile_body(
            comp_bands, levels, cbs, depths, guard, layers, tx0, ty0,
            cb_style, precincts, prog=prog,
            sub=[(subsampling or {}).get(c, (1, 1))
                 for c in range(n_comp)],
            sop=sop, eph=eph, roi_shifts=roi_shifts,
            poc=poc, packed_headers=ppm or ppt)
        n_tp = min(tile_parts, max(1, len(pkts)))
        bounds = [len(pkts) * k // n_tp for k in range(n_tp + 1)]
        for k in range(n_tp):
            lo, hi = bounds[k], bounds[k + 1]
            parts_out.append((
                isot, k, n_tp, b"".join(pkts[lo:hi]),
                b"".join(hdrs[lo:hi]) if hdrs is not None else None))
    if ppm:  # A.7.4: Zppm, then per tile-part Nppm(4) + packed headers
        pb = b"".join(struct.pack(">I", len(h)) + h
                      for (_, _, _, _, h) in parts_out)
        if len(pb) + 3 > 0xFFFF:
            raise ValueError("PPM payload exceeds one marker segment")
        out += b"\xff\x60" + struct.pack(">HB", len(pb) + 3, 0) + pb
    for isot, tpsot, tnsot, body, hdrs in parts_out:
        ppt_seg = b""
        if ppt:  # A.7.5: Zppt + this tile-part's packed headers
            if len(hdrs) + 3 > 0xFFFF:
                raise ValueError("PPT payload exceeds one marker segment")
            ppt_seg = b"\xff\x61" \
                + struct.pack(">HB", len(hdrs) + 3, tpsot) + hdrs
        psot = 12 + len(ppt_seg) + 2 + len(body)
        out += b"\xff\x90" + struct.pack(">HHIBB", 10, isot, psot,
                                         tpsot, tnsot)
        out += ppt_seg + b"\xff\x93" + body
    out += b"\xff\xd9"  # EOC
    return bytes(out)


def _encode_tile_body(comp_bands: list, levels: int, cb_sizes: list,
                      depths: list, guard: int, layers: int,
                      tx0: int = 0, ty0: int = 0,
                      cb_style: int = 0,
                      precincts: list | None = None,
                      prog: int = 0,
                      sub: list | None = None,
                      sop: bool = False, eph: bool = False,
                      roi_shifts: list | None = None,
                      poc: list | None = None,
                      packed_headers: bool = False):
    """All packets of one tile in the COD progression's order (shared
    B.12 iterator with the decoder — jpx.packet_order): one packet per
    (layer, res, comp, precinct).  With layers=2, codeblock (bx+by+res)
    parity picks the layer; tag-tree state (PER PRECINCT, B.6) persists
    across the layer packets exactly as the decoder replays it.
    Codeblock grids anchor at GLOBAL subband coordinates (tile origin
    >> level) and clamp to the precinct size per B.7."""
    from ..pdfkernel.jpx import codeblock_grid, packet_order

    n_comp = len(comp_bands)
    prec = precincts or [(15, 15)] * (levels + 1)
    # per (component, res, band): per-precinct codeblock encodings +
    # persistent packet state; per (component, res): precinct grid
    state: dict = {}
    prec_info: dict = {}
    for c in range(n_comp):
        for res in range(levels + 1):
            ppx, ppy = prec[res]
            pw, ph = 1 << ppx, 1 << ppy
            lvl = levels if res == 0 else levels - res + 1
            ox, oy = tx0 >> lvl, ty0 >> lvl
            names = ("LL",) if res == 0 else ("HL", "LH", "HH")
            # resolution-grid dims for the precinct count
            if res == 0:
                h_r, w_r = comp_bands[c][(0, "LL")].shape
                pwis, phis = pw, ph
            else:
                lo_y, hi_x = comp_bands[c][(res, "HL")].shape
                hi_y, lo_x = comp_bands[c][(res, "LH")].shape
                w_r, h_r = lo_x + hi_x, lo_y + hi_y
                pwis, phis = pw >> 1, ph >> 1
            s = levels - res
            o_rx, o_ry = tx0 >> s, ty0 >> s
            n_px = len(codeblock_grid(o_rx, w_r, pw))
            n_py = len(codeblock_grid(o_ry, h_r, ph))
            dx, dy = (sub or [(1, 1)] * n_comp)[c]
            prec_info[(c, res)] = {
                "n_px": n_px, "n_py": n_py,
                "c0x": o_rx // pw, "c0y": o_ry // ph,
                "pw": pw, "ph": ph, "o_rx": o_rx, "o_ry": o_ry,
                "dx": dx, "dy": dy}
            cbw = min(cb_sizes[c], pwis)
            cbh = min(cb_sizes[c], phis)
            for name in names:
                arr = comp_bands[c][(res, name)]
                bh, bw = arr.shape
                if bw == 0 or bh == 0:
                    state[(c, res, name)] = {}
                    continue
                gx = codeblock_grid(ox, bw, cbw)
                gy = codeblock_grid(oy, bh, cbh)
                n_x, n_y = len(gx), len(gy)
                mb = depths[c] + _GAIN[name] + guard - 1 + \
                    (roi_shifts or [0] * n_comp)[c]
                blocks = {}
                layer_of = np.zeros((n_y, n_x), dtype=np.int32)
                for by, (y0, bh_) in enumerate(gy):
                    for bx, (x0, bw_) in enumerate(gx):
                        block = arr[y0:y0 + bh_, x0:x0 + bw_]
                        blocks[(by, bx)] = t1_encode_block(
                            block, name, mb, flags=cb_style)
                        if layers > 1:
                            layer_of[by, bx] = (bx + by + res) % layers
                # partition into precinct cells (global anchoring)
                cell_x = [(ox + x0) // pwis for (x0, _) in gx]
                cell_y = [(oy + y0) // phis for (y0, _) in gy]
                cells = {}
                for cy in sorted(set(cell_y)):
                    rows = [j for j, v in enumerate(cell_y) if v == cy]
                    for cx in sorted(set(cell_x)):
                        cols = [i for i, v in enumerate(cell_x)
                                if v == cx]
                        loc = [[blocks[(j, i)] for i in cols]
                               for j in rows]
                        p_y, p_x = len(rows), len(cols)
                        # never-included blocks get inclusion value =
                        # layers (>= every threshold)
                        incl_vals = np.array(
                            [[layer_of[rows[yy], cols[xx]]
                              if loc[yy][xx] is not None else layers
                              for xx in range(p_x)] for yy in range(p_y)],
                            dtype=np.int32)
                        zbp_vals = np.array(
                            [[loc[yy][xx][1]
                              if loc[yy][xx] is not None else 0
                              for xx in range(p_x)] for yy in range(p_y)],
                            dtype=np.int32)
                        cells[(cy, cx)] = {
                            "blocks": loc,
                            "layer_of": layer_of[np.ix_(rows, cols)],
                            "incl": TagTreeEncoder(incl_vals),
                            "zbp": TagTreeEncoder(zbp_vals),
                            "lblock": np.full((p_y, p_x), 3, np.int32),
                            "emitted": np.zeros((p_y, p_x), bool),
                        }
                state[(c, res, name)] = cells
    packets = []
    pinfo = [[prec_info[(c, res)] for res in range(levels + 1)]
             for c in range(n_comp)]
    order = packet_order(prog, layers, levels, pinfo, poc=poc)
    if poc:
        # fixture validity: the POC segments must cover every packet —
        # the decode iterators read exactly what they produce
        total = layers * sum(q["n_px"] * q["n_py"]
                             for cp in pinfo for q in cp)
        if len(order) != total:
            raise ValueError(f"POC covers {len(order)} of {total} packets")
    headers = []
    for nsop, (layer, res, c, p) in enumerate(order):
        q = prec_info[(c, res)]
        cell = (q["c0y"] + p // q["n_px"], q["c0x"] + p % q["n_px"])
        hdr, body_ = _emit_packet(state, c, res, layer, cell, eph=eph)
        sop_m = b""
        if sop:  # A.8.1: FF91, Lsop=4, per-tile packet counter mod 2^16
            sop_m = b"\xff\x91\x00\x04" + struct.pack(">H", nsop & 0xFFFF)
        if packed_headers:  # headers to PPM/PPT, SOP+bodies in-stream
            headers.append(hdr)
            packets.append(sop_m + body_)
        else:
            packets.append(sop_m + hdr + body_)
    # per-packet lists: the caller may split them into tile-parts at
    # packet boundaries (B.8 — TPsot/TNsot)
    return packets, (headers if packed_headers else None)


def _emit_packet(state: dict, c: int, res: int, layer: int,
                 cell: tuple[int, int] = (0, 0),
                 eph: bool = False) -> tuple[bytes, bytes]:
    """One packet → (header incl. optional EPH, body bytes); the caller
    interleaves or packs them (PPM/PPT) as the stream layout needs."""
    names = ("LL",) if res == 0 else ("HL", "LH", "HH")
    prs = [state[(c, res, name)].get(cell) for name in names]
    eph_m = b"\xff\x92" if eph else b""
    any_data = any(
        blk is not None and pr["layer_of"][by, bx] == layer
        for pr in prs if pr is not None
        for by, row in enumerate(pr["blocks"])
        for bx, blk in enumerate(row))
    bw_ = _BitWriter()
    if not any_data:
        bw_.write(0)
        return bw_.finish() + eph_m, b""
    bw_.write(1)
    bodies = []
    for pr in prs:
        if pr is None:
            continue
        lo = pr["layer_of"]
        for by, row in enumerate(pr["blocks"]):
            for bx, blk in enumerate(row):
                if pr["emitted"][by, bx]:
                    # included in an earlier layer: whole block was
                    # emitted there, so this layer contributes nothing
                    bw_.write(0)
                    continue
                pr["incl"].encode(bx, by, layer + 1,
                                  lambda b: bw_.write(b))
                if blk is None or lo[by, bx] != layer:
                    continue
                pr["emitted"][by, bx] = True
                data, zero_bp, n_passes, pieces = blk
                pr["zbp"].encode_until_known(bx, by,
                                             lambda b: bw_.write(b))
                _write_passes(bw_, n_passes)
                # one length per terminated piece, Lblock +
                # floor(log2(piece passes)) bits each (B.10.7.5)
                need = max(max(0, ln.bit_length() -
                               (int(pr["lblock"][by, bx]) +
                                k.bit_length() - 1))
                           for k, ln in pieces)
                for _ in range(need):
                    bw_.write(1)
                bw_.write(0)
                pr["lblock"][by, bx] += need
                for k, ln in pieces:
                    bw_.write_bits(ln, int(pr["lblock"][by, bx]) +
                                   k.bit_length() - 1)
                bodies.append(data)
    return bw_.finish() + eph_m, b"".join(bodies)


def _qcd_gains(levels: int):
    gains = [0]
    for _ in range(levels):
        gains.extend([1, 1, 2])
    return gains


def wrap_jp2(codestream: bytes, width: int, height: int,
             n_comp: int) -> bytes:
    """Minimal JP2 container: signature, ftyp, jp2h(ihdr+colr), jp2c."""
    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    sig = box(b"jP  ", b"\r\n\x87\n")
    ftyp = box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    ihdr = box(b"ihdr", struct.pack(">IIHBBBB", height, width, n_comp,
                                    7, 7, 0, 0))
    colr = box(b"colr", bytes([1, 0, 0]) + struct.pack(
        ">I", 17 if n_comp == 1 else 16))
    jp2h = box(b"jp2h", ihdr + colr)
    return sig + ftyp + jp2h + box(b"jp2c", codestream)
