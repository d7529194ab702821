"""Deterministic JPEG2000 encoder for fixtures (ITU-T T.800, lossless).

The mirror image of pdfkernel/jpx.py: reversible 5/3 forward DWT, EBCOT
T1 bitplane encoding on the shared MQ coder, tag-tree packet headers,
single-tile LRCP codestream, optional reversible color transform and a
JP2 container wrapper.  Streams from here are decoded by BOTH our
decoder and the reference's openjpeg wasm (tools/jpx_ref.py) and must
produce identical samples — conformance of the pair is established by
that three-way agreement.
"""

from __future__ import annotations

import struct

import numpy as np

from ..pdfkernel.jpx import (T1Block, _sizes_per_level, _CTX_RL,
                             _CTX_UNIFORM, t1_initial_contexts)
from .jbig2gen import MQEncoder


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
# T1 encoder — mirrors pdfkernel.jpx pass structure bit for bit
# ---------------------------------------------------------------------------

def t1_encode_block(coeffs: np.ndarray, band: str, mb: int):
    """Encode one codeblock.  Returns (data, zero_bp, num_passes) or
    None when the block is all-zero (not included)."""
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
    st = T1Block(w, h, band)
    enc = MQEncoder()
    cx = t1_initial_contexts()

    def spp(p):
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
                    enc.encode(cx, st.zc_context(x, y), bit)
                    if bit:
                        ctx, xor = st.sc_context(x, y)
                        enc.encode(cx, ctx, int(negs[y, x]) ^ xor)
                        st.set_significant(x, y, bool(negs[y, x]), p)

    def mrp(p):
        for y0 in range(0, h, 4):
            y1 = min(y0 + 4, h)
            for x in range(w):
                for y in range(y0, y1):
                    if not st.sig[y + 1, x + 1] or st.visited[y, x]:
                        continue
                    bit = int((mags[y, x] >> p) & 1)
                    enc.encode(cx, st.mr_context(x, y), bit)
                    st.refined[y, x] = 1

    def cup(p):
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
                            enc.encode(cx, _CTX_RL, 0)
                            continue
                        enc.encode(cx, _CTX_RL, 1)
                        first = bits.index(1)
                        enc.encode(cx, _CTX_UNIFORM, (first >> 1) & 1)
                        enc.encode(cx, _CTX_UNIFORM, first & 1)
                        y = y0 + first
                        ctx, xor = st.sc_context(x, y)
                        enc.encode(cx, ctx, int(negs[y, x]) ^ xor)
                        st.set_significant(x, y, bool(negs[y, x]), p)
                        y += 1
                while y < y1:
                    if not st.sig[y + 1, x + 1] and not st.visited[y, x]:
                        bit = int((mags[y, x] >> p) & 1)
                        enc.encode(cx, st.zc_context(x, y), bit)
                        if bit:
                            ctx, xor = st.sc_context(x, y)
                            enc.encode(cx, ctx, int(negs[y, x]) ^ xor)
                            st.set_significant(x, y, bool(negs[y, x]), p)
                    y += 1
        st.visited[:] = 0

    cup(msb - 1)
    for p in range(msb - 2, -1, -1):
        spp(p)
        mrp(p)
        cup(p)
    num_passes = 3 * msb - 2
    return enc.finish_raw(), zero_bp, num_passes


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
               rct: bool = True) -> bytes:
    """img: (h, w) or (h, w, 3) uint8 → raw JPEG2000 codestream
    (lossless 5/3, single tile, one layer, LRCP)."""
    if img.ndim == 2:
        planes = [img.astype(np.int64) - 128]
        mct = 0
    elif img.shape[2] == 3:
        r = img[..., 0].astype(np.int64) - 128
        g = img[..., 1].astype(np.int64) - 128
        b = img[..., 2].astype(np.int64) - 128
        if rct:
            planes = list(forward_rct(r, g, b))
            mct = 1
        else:
            planes = [r, g, b]
            mct = 0
    else:
        raise ValueError("1- or 3-component images only")
    h, w = img.shape[:2]
    cb_w = cb_h = 1 << cb_exp
    n_comp = len(planes)
    # transform + per-band coefficient grids
    comp_bands = []
    for plane in planes:
        ll, chain = fdwt53(plane, levels)
        bands = {(0, "LL"): ll}
        for r_i, (hl, lh, hh) in enumerate(chain):
            res = r_i + 1
            bands[(res, "HL")] = hl
            bands[(res, "LH")] = lh
            bands[(res, "HH")] = hh
        comp_bands.append(bands)
    # choose guard bits so Mb covers the largest magnitude everywhere
    depth = 8
    guard = 2
    for bands in comp_bands:
        for (res, name), arr in bands.items():
            if arr.size == 0:
                continue
            msb = int(np.abs(arr).max()).bit_length()
            eps = depth + _GAIN[name]
            need = msb - eps + 1
            guard = max(guard, need)
    guard = min(guard, 7)
    # encode codeblocks and build packets
    packets = []
    for res in range(levels + 1):
        for c in range(n_comp):
            packets.append(_build_packet(comp_bands[c], res, cb_w, cb_h,
                                         depth, guard))
    # markers
    out = bytearray(b"\xff\x4f")  # SOC
    siz = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, n_comp)
    siz += b"".join(struct.pack(">BBB", depth - 1, 1, 1)
                    for _ in range(n_comp))
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    cod = struct.pack(">BBHBBBBBB", 0, 0, 1, mct, levels,
                      cb_exp - 2, cb_exp - 2, 0, 1)
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    n_bands = 1 + 3 * levels
    qcd = bytes([guard << 5]) + bytes(
        ((depth + g) << 3) for g in _qcd_gains(levels))
    assert len(qcd) == 1 + n_bands
    out += b"\xff\x5c" + struct.pack(">H", len(qcd) + 2) + qcd
    body = b"".join(packets)
    psot = 12 + 2 + len(body)
    out += b"\xff\x90" + struct.pack(">HHIBB", 10, 0, psot, 0, 1)
    out += b"\xff\x93" + body
    out += b"\xff\xd9"  # EOC
    return bytes(out)


def _qcd_gains(levels: int):
    gains = [0]
    for _ in range(levels):
        gains.extend([1, 1, 2])
    return gains


def _build_packet(bands: dict, res: int, cb_w: int, cb_h: int,
                  depth: int, guard: int) -> bytes:
    names = ("LL",) if res == 0 else ("HL", "LH", "HH")
    # collect codeblock encodings per band
    band_blocks = []
    any_data = False
    for name in names:
        arr = bands[(res, name)]
        bh, bw = arr.shape
        if bw == 0 or bh == 0:
            band_blocks.append((name, 0, 0, []))
            continue
        n_x = (bw + cb_w - 1) // cb_w
        n_y = (bh + cb_h - 1) // cb_h
        mb = depth + _GAIN[name] + guard - 1
        blocks = []
        for by in range(n_y):
            for bx in range(n_x):
                block = arr[by * cb_h:(by + 1) * cb_h,
                            bx * cb_w:(bx + 1) * cb_w]
                enc = t1_encode_block(block, name, mb)
                blocks.append(enc)
                if enc is not None:
                    any_data = True
        band_blocks.append((name, n_x, n_y, blocks))
    bw_ = _BitWriter()
    if not any_data:
        bw_.write(0)
        return bw_.finish()
    bw_.write(1)
    bodies = []
    for name, n_x, n_y, blocks in band_blocks:
        if n_x == 0:
            continue
        incl_vals = np.array(
            [[0 if blocks[yy * n_x + xx] is not None else 1
              for xx in range(n_x)] for yy in range(n_y)], dtype=np.int32)
        zbp_vals = np.array(
            [[blocks[yy * n_x + xx][1] if blocks[yy * n_x + xx] is not None
              else 0 for xx in range(n_x)] for yy in range(n_y)],
            dtype=np.int32)
        incl_tree = TagTreeEncoder(incl_vals)
        zbp_tree = TagTreeEncoder(zbp_vals)
        lblock = np.full((n_y, n_x), 3, dtype=np.int32)
        for by in range(n_y):
            for bx in range(n_x):
                blk = blocks[by * n_x + bx]
                incl_tree.encode(bx, by, 1, lambda b: bw_.write(b))
                if blk is None:
                    continue
                data, zero_bp, n_passes = blk
                zbp_tree.encode_until_known(bx, by,
                                            lambda b: bw_.write(b))
                _write_passes(bw_, n_passes)
                base = int(lblock[by, bx]) + n_passes.bit_length() - 1
                need = max(0, len(data).bit_length() - base)
                for _ in range(need):
                    bw_.write(1)
                bw_.write(0)
                lblock[by, bx] += need
                nbits = int(lblock[by, bx]) + n_passes.bit_length() - 1
                bw_.write_bits(len(data), nbits)
                bodies.append(data)
    return bw_.finish() + b"".join(bodies)


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
