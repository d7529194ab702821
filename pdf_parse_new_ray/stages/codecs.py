"""Dependency-free media codecs for the multimodal feature stage.

The container has no PIL/soundfile, but PNG and WAV need no external
codec: PNG is zlib (stdlib) + per-row unfiltering (numpy), WAV duration
is RIFF header arithmetic.  These upgrade two of the stage's honest
stubs to REAL decoders; GIF pixel decode (variable-width LZW) and
compressed audio stay stubbed.
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
        elif f == 1:  # Sub — sequential on the left neighbor
            out = cur.copy()
            for x in range(bpp, stride):
                out[x] = (out[x] + out[x - bpp]) & 0xFF
        elif f == 2:  # Up — fully vectorized
            out = (cur + prior) & 0xFF
        elif f == 3:  # Average
            out = cur.copy()
            for x in range(stride):
                left = out[x - bpp] if x >= bpp else 0
                out[x] = (out[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            out = cur.copy()
            for x in range(stride):
                a = out[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = (out[x] + pred) & 0xFF
        else:
            raise CodecError(f"unknown filter {f}")
        img[y] = out.astype(np.uint8)
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
