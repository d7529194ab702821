"""Dependency-free media codecs for the multimodal feature stage.

The container has no PIL/soundfile, but these formats need no external
codec: PNG is zlib (stdlib) + per-row unfiltering (numpy), GIF is
variable-code-width LZW over a color table, TIFF is an IFD walk over
uncompressed / TIFF-LZW / CCITT-G4 strips (pdfkernel/ccitt.py), and
WAV / MP3 / MP4 / Ogg durations are header arithmetic (RIFF chunks,
MPEG frame headers + Xing VBR counts, moov/mvhd timescale, Ogg granule
positions).  Together with the kernel's JPEG decoder they make every
common container REAL in the media stage; only full payload decode of
compressed audio/video samples stays stubbed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class CodecError(Exception):
    pass


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# samples per pixel by PNG color type
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """PNG → (height, width, n_channels, uint8 array).  Supports 8-bit
    greyscale / RGB / palette / grey+alpha / RGBA, non-interlaced
    (Adam7 raises CodecError — rare for training-data payloads)."""
    if not data.startswith(_PNG_MAGIC):
        raise CodecError("not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        if len(chunk) < length:
            raise CodecError("truncated chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk[:13])
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None:
        raise CodecError("missing IHDR")
    w, h, bit_depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise CodecError("unsupported compression/filter method")
    if interlace != 0:
        raise CodecError("Adam7 interlace not supported")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS:
        raise CodecError(f"unsupported bit depth/color type {bit_depth}/{color_type}")
    nch = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise CodecError(f"IDAT inflate failed: {e}") from e
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise CodecError("short pixel data")
    rows = np.frombuffer(raw[: h * (stride + 1)], dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    img = np.zeros((h, stride), dtype=np.uint8)
    bpp = nch  # bytes per pixel at bit depth 8
    for y in range(h):
        f = filters[y]
        cur = rows[y, 1:].astype(np.int32)
        prior = img[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:  # None
            out = cur
        elif f == 1:  # Sub: out[x] = cur[x] + out[x-bpp] is a per-channel
            # prefix sum — vectorized as cumsum mod 256 over pixel columns
            out = np.cumsum(cur.reshape(-1, bpp), axis=0).reshape(-1) & 0xFF
        elif f == 2:  # Up — fully vectorized
            out = (cur + prior) & 0xFF
        elif f == 3:  # Average — sequential on left; plain-int loop
            # (numpy scalar indexing is ~10x slower than Python ints)
            cl = cur.tolist()
            pl = prior.tolist()
            o = cl[:]
            for x in range(stride):
                left = o[x - bpp] if x >= bpp else 0
                o[x] = (cl[x] + ((left + pl[x]) >> 1)) & 0xFF
            out = o
        elif f == 4:  # Paeth — sequential on left; plain-int loop
            cl = cur.tolist()
            pl = prior.tolist()
            o = cl[:]
            for x in range(bpp):
                # left/upleft are 0: predictor degenerates to up
                o[x] = (cl[x] + pl[x]) & 0xFF
            for x in range(bpp, stride):
                a = o[x - bpp]
                b = pl[x]
                c = pl[x - bpp]
                pa = b - c
                pb = a - c
                pc = pa + pb
                if pa < 0:
                    pa = -pa
                if pb < 0:
                    pb = -pb
                if pc < 0:
                    pc = -pc
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                o[x] = (cl[x] + pred) & 0xFF
            out = o
        else:
            raise CodecError(f"unknown filter {f}")
        img[y] = np.asarray(out, dtype=np.uint8) if isinstance(out, list) \
            else out.astype(np.uint8)
    px = img.reshape(h, w, nch)
    if color_type == 3:
        if palette is None:
            raise CodecError("palette image without PLTE")
        px = palette[np.clip(px[..., 0], 0, len(palette) - 1)]
        nch = 3
    return h, w, nch, (px if nch > 1 else px[..., 0])


def wav_duration(data: bytes) -> float:
    """RIFF/WAVE duration in seconds from the fmt + data chunks."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise CodecError("not a WAV")
    pos = 12
    byte_rate = None
    data_size = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if cid == b"fmt ":
            if size < 16:
                raise CodecError("short fmt chunk")
            (_fmt, _nch, _rate, byte_rate, _align, _bits) = struct.unpack(
                "<HHIIHH", data[pos + 8:pos + 24])
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not byte_rate or data_size is None:
        raise CodecError("missing fmt/data chunk")
    return data_size / byte_rate


def decode_wav_pcm(data: bytes,
                   max_samples: int = 1 << 26) -> tuple[int, int, int,
                                                        "np.ndarray"]:
    """REAL RIFF/WAVE payload decode — integer PCM (8-bit unsigned,
    16/24/32-bit signed little-endian, format tag 1) and IEEE float
    (32/64-bit, format tag 3) need no codec library.  Returns
    (sample_rate, channels, bits, samples) with samples float64 in
    [-1, 1], shape (n_frames, channels).  ``max_samples`` caps total
    decoded samples (frames x channels) so one pathological blob can't
    blow a worker's heap; compressed format tags raise CodecError (those
    genuinely need external codecs and stay stubbed per the brief)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise CodecError("not a WAV")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if cid == b"fmt ":
            if size < 16 or pos + 24 > len(data):
                raise CodecError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", data[pos + 8:pos + 24])
        elif cid == b"data":
            payload = data[pos + 8:pos + 8 + size]
            if len(payload) < size:
                raise CodecError("truncated data chunk")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise CodecError("missing fmt/data chunk")
    tag, nch, rate, _brate, _align, bits = fmt
    if nch < 1 or rate < 1:
        raise CodecError("bad fmt values")
    if tag == 1 and bits in (8, 16, 24, 32):
        width = bits // 8
        n = len(payload) // (width * nch)
        if n * nch > max_samples:
            raise CodecError("sample cap exceeded")
        raw = payload[:n * nch * width]
        if bits == 8:
            x = np.frombuffer(raw, np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
        else:  # 24-bit: widen to int32 via zero-padded LSB, sign intact
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            quad = np.zeros((len(b), 4), np.uint8)
            quad[:, 1:] = b
            x = quad.view("<i4").ravel().astype(np.float64) / 2147483648.0
    elif tag == 3 and bits in (32, 64):
        width = bits // 8
        n = len(payload) // (width * nch)
        if n * nch > max_samples:
            raise CodecError("sample cap exceeded")
        raw = payload[:n * nch * width]
        x = np.frombuffer(raw, "<f4" if bits == 32 else "<f8") \
            .astype(np.float64)
    else:
        raise CodecError(f"unsupported WAV format tag={tag} bits={bits}")
    return rate, nch, bits, x.reshape(-1, nch)


def _gif_lzw(data: bytes, min_code_size: int, max_pixels: int) -> bytes:
    """GIF variable-code-width LZW (LSB-first packing, 3..12-bit codes,
    clear/end codes, 4096-entry table cap)."""
    clear = 1 << min_code_size
    end = clear + 1
    init = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(init)
    width = min_code_size + 1
    out = bytearray()
    buf = 0
    nbits = 0
    prev = None
    for byte in data:
        buf |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = buf & ((1 << width) - 1)
            buf >>= width
            nbits -= width
            if code == clear:
                table = list(init)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise CodecError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise CodecError("LZW code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= max_pixels:
                return bytes(out)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """GIF87a/89a first frame → (height, width, 3, uint8 RGB array)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise CodecError("not a GIF")
    if len(data) < 13:
        raise CodecError("truncated header")
    w, h = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension block
            pos += 2
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                raise CodecError("truncated image descriptor")
            _x, _y, iw, ih = struct.unpack("<HHHH", data[pos + 1:pos + 9])
            fl = data[pos + 9]
            pos += 10
            pal = gct
            if fl & 0x80:
                n = 2 << (fl & 7)
                pal = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
                pos += 3 * n
            if pal is None:
                raise CodecError("no color table")
            min_code = data[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise CodecError(f"bad LZW minimum code size {min_code}")
            chunks = []
            while pos < len(data) and data[pos]:
                ln = data[pos]
                chunks.append(data[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw(b"".join(chunks), min_code, iw * ih)
            if len(idx) < iw * ih:
                raise CodecError("short pixel data")
            grid = np.frombuffer(idx[: iw * ih], np.uint8).reshape(ih, iw)
            if fl & 0x40:  # Adam-style GIF interlace: rows arrive by pass
                de = np.empty_like(grid)
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    rows = range(start, ih, step)
                    de[list(rows)] = grid[src:src + len(rows)]
                    src += len(rows)
                grid = de
            px = pal[np.clip(grid, 0, len(pal) - 1)]
            return ih, iw, 3, px
        elif b == 0x3B:  # trailer
            break
        else:
            pos += 1
    raise CodecError("no image data")


def decode_tiff(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Baseline TIFF first IFD → (height, width, n_channels, uint8 array).
    Supports single-strip-or-multi-strip uncompressed (1), CCITT G4 (4,
    via pdfkernel/ccitt.py) and LZW (5) for 1-bit bilevel and 8-bit
    gray/RGB.  Anything else raises CodecError."""
    if data[:4] == b"II*\x00":
        endian = "<"
    elif data[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise CodecError("not a TIFF")

    def u16(off):
        return struct.unpack_from(endian + "H", data, off)[0]

    def u32(off):
        return struct.unpack_from(endian + "I", data, off)[0]

    ifd = u32(4)
    if ifd + 2 > len(data):
        raise CodecError("truncated IFD")
    n = u16(ifd)
    tags = {}
    for i in range(n):
        e = ifd + 2 + 12 * i
        tag, typ, cnt = u16(e), u16(e + 2), u32(e + 4)
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            continue
        if size * cnt <= 4:
            off = e + 8
        else:
            off = u32(e + 8)
        vals = []
        for j in range(cnt):
            if typ == 3:
                vals.append(u16(off + 2 * j))
            elif typ == 4:
                vals.append(u32(off + 4 * j))
            else:
                vals.append(data[off + j])
        tags[tag] = vals
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as e:
        raise CodecError(f"missing required TIFF tag {e}") from e
    bits = tags.get(258, [1])[0]
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    rows_per_strip = tags.get(278, [h])[0]
    strips = [data[o:o + c] for o, c in zip(offsets, counts)]
    if comp == 4:  # CCITT G4
        if bits != 1 or spp != 1:
            raise CodecError("G4 TIFF must be 1-bit bilevel")
        from ..pdfkernel.ccitt import decode_ccitt

        parts = []
        for si, strip in enumerate(strips):
            nrows = min(rows_per_strip, h - si * rows_per_strip)
            parts.append(decode_ccitt(strip, columns=w, rows=nrows, k=-1))
        img = np.concatenate(parts)  # 1 = black
        # PhotometricInterpretation 0 = WhiteIsZero: black pixels are 1s
        px = (img * 255 if photo == 1 else (1 - img) * 255).astype(np.uint8)
        return h, w, 1, px
    if comp == 5:  # LZW (TIFF flavor == PDF LZWDecode with EarlyChange=1)
        from ..pdfkernel.filters import lzw_decode

        strips = [lzw_decode(s) for s in strips]
    elif comp != 1:
        raise CodecError(f"unsupported TIFF compression {comp}")
    raw = b"".join(strips)
    if bits == 1 and spp == 1:
        rows = []
        stride = (w + 7) // 8
        if len(raw) < stride * h:
            raise CodecError("short TIFF pixel data")
        grid = np.unpackbits(
            np.frombuffer(raw[: stride * h], np.uint8).reshape(h, stride),
            axis=1)[:, :w]
        px = (grid * 255 if photo == 1 else (1 - grid) * 255).astype(np.uint8)
        return h, w, 1, px
    if bits != 8:
        raise CodecError(f"unsupported TIFF bit depth {bits}")
    if len(raw) < h * w * spp:
        raise CodecError("short TIFF pixel data")
    px = np.frombuffer(raw[: h * w * spp], np.uint8).reshape(h, w, spp)
    return h, w, spp, (px[..., 0] if spp == 1 else px)


_MP3_BITRATES = {  # kbps, MPEG1 Layer III / MPEG2(.5) Layer III
    1: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0),
}
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}


def mp3_duration(data: bytes) -> float:
    """MP3 duration from frame headers: Xing/Info frame count when
    present (VBR), else file-size / first-frame bitrate (CBR estimate)."""
    pos = 0
    if data[:3] == b"ID3":  # skip ID3v2 (syncsafe size)
        if len(data) < 10:
            raise CodecError("truncated ID3")
        sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) \
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        pos = 10 + sz
    # find frame sync
    while pos + 4 <= len(data):
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            break
        pos += 1
    if pos + 4 > len(data):
        raise CodecError("no MP3 frame sync")
    h1 = data[pos + 1]
    h2 = data[pos + 2]
    version = (h1 >> 3) & 3          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (h1 >> 1) & 3            # 1=Layer III
    if version == 1 or layer != 1:
        raise CodecError("unsupported MPEG version/layer")
    br_idx = (h2 >> 4) & 0xF
    sr_idx = (h2 >> 2) & 3
    if sr_idx == 3:
        raise CodecError("bad sample-rate index")
    mpeg1 = version == 3
    bitrate = _MP3_BITRATES[1 if mpeg1 else 2][br_idx] * 1000
    rate = _MP3_RATES[version][sr_idx]
    spf = 1152 if mpeg1 else 576     # samples per Layer-III frame
    if not bitrate:
        raise CodecError("free-format bitrate")
    # Xing/Info header (VBR): side-info offset depends on version/channels
    mode = (data[pos + 3] >> 6) & 3
    side = (17 if mode == 3 else 32) if mpeg1 else (9 if mode == 3 else 17)
    tag_off = pos + 4 + side
    tag = data[tag_off:tag_off + 4]
    if tag in (b"Xing", b"Info") and data[tag_off + 7] & 1:
        frames = struct.unpack(">I", data[tag_off + 8:tag_off + 12])[0]
        return frames * spf / rate
    return (len(data) - pos) * 8 / bitrate


def mp4_duration(data: bytes) -> float:
    """MP4/ISO-BMFF duration from the moov/mvhd box."""
    def walk(lo: int, hi: int, depth: int = 0) -> float:
        pos = lo
        while pos + 8 <= hi:
            size = struct.unpack(">I", data[pos:pos + 4])[0]
            typ = data[pos + 4:pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit size
                size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
                body = pos + 16
            if size < 8:
                raise CodecError("bad box size")
            if typ == b"moov" and depth == 0:
                return walk(body, min(pos + size, hi), 1)
            if typ == b"mvhd" and depth == 1:
                ver = data[body]
                if ver == 1:
                    ts = struct.unpack(">I", data[body + 20:body + 24])[0]
                    dur = struct.unpack(">Q", data[body + 24:body + 32])[0]
                else:
                    ts = struct.unpack(">I", data[body + 12:body + 16])[0]
                    dur = struct.unpack(">I", data[body + 16:body + 20])[0]
                if not ts:
                    raise CodecError("zero mvhd timescale")
                return dur / ts
            pos += size
        raise CodecError("no mvhd box")

    if len(data) < 12 or data[4:8] != b"ftyp":
        raise CodecError("not an MP4")
    return walk(0, len(data))


def ogg_duration(data: bytes) -> float:
    """Ogg duration from the identification header (Vorbis rate / Opus
    48 kHz + pre-skip) and the LAST page's granule position."""
    if data[:4] != b"OggS":
        raise CodecError("not an Ogg stream")
    if len(data) < 28:
        raise CodecError("truncated Ogg page")
    nsegs = data[26]
    body = 27 + nsegs
    seg_total = sum(data[27:body])
    first = data[body:body + seg_total]
    rate = None
    preskip = 0
    if first[:7] == b"\x01vorbis":
        if len(first) < 16:
            raise CodecError("short vorbis id header")
        rate = struct.unpack("<I", first[12:16])[0]
    elif first[:8] == b"OpusHead":
        if len(first) < 12:
            raise CodecError("short OpusHead")
        preskip = struct.unpack("<H", first[10:12])[0]
        rate = 48000  # granule positions are always 48 kHz for Opus
    else:
        raise CodecError("unknown Ogg codec")
    if not rate:
        raise CodecError("zero sample rate")
    # last page's granule position
    last = data.rfind(b"OggS")
    if last < 0 or last + 14 > len(data):
        raise CodecError("no final page")
    granule = struct.unpack("<q", data[last + 6:last + 14])[0]
    if granule < 0:
        raise CodecError("unset granule position")
    return max(0, granule - preskip) / rate


def avi_duration(data: bytes) -> float:
    """AVI duration from the avih main header: dwMicroSecPerFrame ×
    dwTotalFrames (RIFF 'AVI ' → LIST hdrl → avih)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        fourcc = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if fourcc == b"LIST":
            list_type = data[pos + 8:pos + 12]
            if list_type == b"hdrl":
                pos += 12  # descend into the hdrl list
                continue
        elif fourcc == b"avih":
            usec_per_frame, = struct.unpack_from("<I", data, pos + 8)
            total_frames, = struct.unpack_from("<I", data, pos + 24)
            return usec_per_frame * total_frames / 1e6
        pos += 8 + size + (size & 1)
    raise ValueError("no avih header found")


def encode_png(px: np.ndarray) -> bytes:
    """Minimal PNG encoder (8-bit gray or RGB, filter 0, one IDAT) — the
    output side of the resize stage; round-trips through decode_png."""
    px = np.ascontiguousarray(px.astype(np.uint8))
    if px.ndim == 2:
        color_type, h, w = 0, px.shape[0], px.shape[1]
        rows = px
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, h, w = 2, px.shape[0], px.shape[1]
        rows = px.reshape(h, w * 3)
    else:
        raise CodecError("encode_png supports (h,w) gray or (h,w,3) RGB")
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rows], axis=1).tobytes()

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def area_mean_resize(px: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Integer area-mean downsample/resample to (th, tw) — the ahash64
    integral-image trick generalized to an arbitrary grid, exact block
    means (floor division) when the factors divide, deterministic across
    platforms (no float kernels)."""
    if px.ndim == 2:
        px = px[:, :, None]
        squeeze = True
    else:
        squeeze = False
    h, w, c = px.shape
    if th <= 0 or tw <= 0:
        raise CodecError("bad resize target")
    if h < th or w < tw:  # upscale: nearest (area mean needs >=1 px cells)
        yi = (np.arange(th) * h) // th
        xi = (np.arange(tw) * w) // tw
        out = px[yi[:, None], xi[None, :], :]
        return out[..., 0] if squeeze else out
    ys = (np.arange(th + 1) * h) // th
    xs = (np.arange(tw + 1) * w) // tw
    cs = np.zeros((h + 1, w + 1, c), np.int64)
    cs[1:, 1:, :] = px.astype(np.int64).cumsum(0).cumsum(1)
    sums = (cs[ys[1:, None], xs[None, 1:], :] - cs[ys[:-1, None], xs[None, 1:], :]
            - cs[ys[1:, None], xs[None, :-1], :] + cs[ys[:-1, None], xs[None, :-1], :])
    areas = ((ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :])[..., None]
    out = (sums // areas).astype(np.uint8)
    return out[..., 0] if squeeze else out


def decode_avi_frames(data: bytes, stride: int = 1, max_frames: int = 64,
                      max_pixels: int = 1 << 24):
    """AVI raw-video frame sampler: parses avih + the vids stream's
    BITMAPINFOHEADER and decodes every ``stride``-th UNCOMPRESSED
    (BI_RGB 24-bit DIB, '00db') frame from the movi list — bottom-up
    padded BGR rows → (h, w, 3) RGB.  Compressed streams ('00dc' chunks
    or biCompression != 0) raise CodecError: frame sampling of encoded
    video needs a codec this container doesn't ship, so the stage
    absorbs those to decoded=False rather than faking pixels.

    Returns (fps, total_frames, [(frame_index, rgb_array), ...])."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise CodecError("not an AVI file")
    pos, n = 12, len(data)
    usec_per_frame = total_frames = 0
    bw = bh = bits = comp = None
    movi = None
    while pos + 8 <= n:
        fourcc = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if fourcc == b"LIST":
            ltype = data[pos + 8:pos + 12]
            if ltype in (b"hdrl", b"strl"):
                pos += 12  # descend
                continue
            if ltype == b"movi":
                movi = (pos + 12, pos + 8 + size)
                pos += 8 + size + (size & 1)
                continue
        elif fourcc == b"avih":
            usec_per_frame, = struct.unpack_from("<I", data, pos + 8)
            total_frames, = struct.unpack_from("<I", data, pos + 24)
        elif fourcc == b"strf" and bw is None and size >= 40:
            (_bisize, bw, bh, _planes, bits, comp) = struct.unpack_from(
                "<IiiHHI", data, pos + 8)
        pos += 8 + size + (size & 1)
    fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
    if movi is None:
        raise CodecError("no movi list (metadata-only AVI)")
    if bw is None:
        raise CodecError("no video stream format")
    if comp != 0 or bits != 24:
        raise CodecError(f"compressed/unsupported video (biCompression={comp}, "
                         f"biBitCount={bits})")
    bottom_up = bh > 0
    bh = abs(bh)
    if bw * bh > max_pixels:
        raise CodecError("frame too large")
    row_bytes = (bw * 3 + 3) & ~3
    frames = []
    idx = 0
    pos, end = movi
    while pos + 8 <= end and len(frames) < max_frames:
        cc = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if cc[2:4] == b"dc":
            raise CodecError("compressed video chunk")
        if cc[2:4] == b"db":
            if idx % stride == 0:
                buf = data[pos + 8:pos + 8 + size]
                if len(buf) < row_bytes * bh:
                    raise CodecError("truncated frame")
                arr = np.frombuffer(buf[:row_bytes * bh], np.uint8) \
                    .reshape(bh, row_bytes)[:, :bw * 3].reshape(bh, bw, 3)
                if bottom_up:
                    arr = arr[::-1]
                frames.append((idx, arr[:, :, ::-1].copy()))  # BGR → RGB
            idx += 1
        pos += 8 + size + (size & 1)
    return fps, total_frames, frames
