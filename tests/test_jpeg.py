"""Baseline + progressive JPEG decoder conformance (pdfkernel/jpeg.py)
and the multimodal image path it powers.  The encoders (fixtures/
jpeggen.py) emit spec-valid JPEGs with non-Annex-K Huffman tables, so
DHT parsing and canonical code construction are genuinely exercised;
baseline round-trip error is bounded by the quantization step, and the
progressive fixture must decode PIXEL-EXACT to its baseline twin (both
carry identical quantized coefficients)."""

import numpy as np
import pytest

from pdf_parse_new_ray.fixtures.jpeggen import (encode_baseline_jpeg,
                                                encode_progressive_jpeg)
from pdf_parse_new_ray.pdfkernel.jpeg import JPEGError, decode_jpeg


def _gradient(h, w):
    return (np.linspace(0, 255, w)[None, :] * np.ones((h, 1))).astype(np.uint8)


def test_gray_roundtrip():
    img = _gradient(48, 64)
    h, w, nc, out = decode_jpeg(encode_baseline_jpeg(img))
    assert (h, w, nc) == (48, 64, 1)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_color_444_roundtrip():
    img = np.zeros((40, 56, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, 56)[None, :]
    img[..., 1] = np.linspace(255, 0, 40)[:, None]
    img[..., 2] = 100
    h, w, nc, out = decode_jpeg(encode_baseline_jpeg(img))
    assert (h, w, nc) == (40, 56, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4


def test_color_420_with_restarts():
    img = np.zeros((33, 41, 3), np.uint8)  # non-multiple-of-16 dims
    img[..., 0] = np.linspace(0, 255, 41)[None, :]
    img[..., 2] = np.linspace(0, 200, 33)[:, None]
    jpg = encode_baseline_jpeg(img, subsample_420=True, restart_interval=2)
    h, w, nc, out = decode_jpeg(jpg)
    assert (h, w, nc) == (33, 41, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 8


def test_noise_roundtrip_exercises_ac_runs():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(24, 32), dtype=np.int64).astype(np.uint8)
    h, w, nc, out = decode_jpeg(encode_baseline_jpeg(img))
    assert (h, w, nc) == (24, 32, 1)
    # noise saturates every AC category; error stays quantization-bounded
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 8


def test_rejects_invalid_streams():
    with pytest.raises(JPEGError):
        decode_jpeg(b"not a jpeg")
    # a baseline scan mislabeled SOF2 carries an illegal progressive scan
    # header (Ss=0, Se=63) — must reject, not mis-decode
    img = _gradient(16, 16)
    jpg = bytearray(encode_baseline_jpeg(img))
    idx = jpg.find(b"\xff\xc0")
    jpg[idx + 1] = 0xC2
    with pytest.raises(JPEGError):
        decode_jpeg(bytes(jpg))
    # arithmetic-coded / lossless frame markers still reject
    jpg[idx + 1] = 0xC9
    with pytest.raises(JPEGError):
        decode_jpeg(bytes(jpg))


def test_progressive_matches_baseline_exact():
    """Progressive scans reconstruct the same quantized coefficients as
    the baseline twin, so decoded pixels must be IDENTICAL — covering DC
    first/refine, AC spectral bands, EOB runs and AC refinement."""
    rng = np.random.RandomState(7)
    cases = [
        ("gradient", _gradient(48, 64), {}),
        ("noise-odd", rng.randint(0, 256, (13, 21)).astype(np.uint8), {}),
        ("two-level-sa", rng.randint(0, 256, (40, 56)).astype(np.uint8),
         dict(al_dc=2, al_ac=2)),
        ("no-split", rng.randint(0, 256, (16, 16)).astype(np.uint8),
         dict(spectral_split=False)),
        ("flat-eobruns", np.full((64, 64), 77, np.uint8), {}),
    ]
    for name, img, kw in cases:
        b = decode_jpeg(encode_baseline_jpeg(img))
        p = decode_jpeg(encode_progressive_jpeg(img, **kw))
        assert b[:3] == p[:3], name
        assert np.array_equal(b[3], p[3]), name


def test_progressive_color_420_exact():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (33, 47, 3)).astype(np.uint8)
    b = decode_jpeg(encode_baseline_jpeg(img, subsample_420=True))
    p = decode_jpeg(encode_progressive_jpeg(img, subsample_420=True,
                                            al_dc=2, al_ac=2))
    assert b[:3] == p[:3] == (33, 47, 3)
    assert np.array_equal(b[3], p[3])


def test_multimodal_stage_decodes_jpeg(ray_session):
    import pyarrow as pa

    from pdf_parse_new_ray.stages.multimodal import MediaFeatureExtractor

    img = _gradient(20, 30)
    jpg = encode_baseline_jpeg(img)
    pjpg = encode_progressive_jpeg(img)
    batch = pa.table({
        "media_ref": pa.array(["img-1", "junk-1", "prog-1"], pa.string()),
        "bytes": pa.array([jpg, b"\xff\xd8\xff\xe0garbage", pjpg], pa.binary()),
    })
    out = MediaFeatureExtractor()(batch).to_pylist()
    assert out[0]["media_type"] == "jpeg"
    assert out[0]["decoded"] is True
    assert (out[0]["width"], out[0]["height"]) == (30, 20)
    assert out[1]["media_type"] == "jpeg"
    assert out[1]["decoded"] is False  # corrupt jpeg absorbs to error
    assert out[1]["error"]
    assert out[2]["decoded"] is True  # progressive decodes for real now
    assert (out[2]["width"], out[2]["height"]) == (30, 20)


def _encode_png(img: np.ndarray, filters=None, palette=None) -> bytes:
    """Minimal PNG encoder for tests: 8-bit gray/RGB/RGBA (or palette when
    `palette` given and img carries indices), per-row filter choice."""
    import struct
    import zlib

    if img.ndim == 2:
        px = img[:, :, None]
    else:
        px = img
    h, w, nch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch] if palette is None else 3
    bpp = nch
    raw = bytearray()
    prior = np.zeros(w * nch, np.int32)
    for y in range(h):
        row = px[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)] if filters else 0
        raw.append(f)
        if f == 0:
            enc = row
        elif f == 1:
            left = np.concatenate((np.zeros(bpp, np.int32), row[:-bpp]))
            enc = (row - left) & 0xFF
        elif f == 2:
            enc = (row - prior) & 0xFF
        elif f == 3:
            left = np.concatenate((np.zeros(bpp, np.int32), row[:-bpp]))
            enc = (row - ((left + prior) >> 1)) & 0xFF
        else:  # Paeth
            left = np.concatenate((np.zeros(bpp, np.int32), row[:-bpp]))
            upleft = np.concatenate((np.zeros(bpp, np.int32), prior[:-bpp]))
            p = left + prior - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prior, upleft))
            enc = (row - pred) & 0xFF
        raw += enc.astype(np.uint8).tobytes()
        prior = row

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload)))

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def test_png_roundtrip_all_filters():
    from pdf_parse_new_ray.stages.codecs import decode_png

    rng = np.random.RandomState(5)
    for nch, name in ((1, "gray"), (3, "rgb"), (4, "rgba")):
        shape = (13, 17) if nch == 1 else (13, 17, nch)
        img = rng.randint(0, 256, shape).astype(np.uint8)
        png = _encode_png(img, filters=[0, 1, 2, 3, 4])
        h, w, c, out = decode_png(png)
        assert (h, w, c) == (13, 17, nch), name
        assert np.array_equal(out, img), name  # PNG is lossless


def test_png_palette_and_errors():
    from pdf_parse_new_ray.stages.codecs import CodecError, decode_png

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    h, w, c, out = decode_png(_encode_png(idx, palette=pal))
    assert (h, w, c) == (2, 2, 3)
    assert np.array_equal(out, pal[idx])
    import pytest as _pt

    with _pt.raises(CodecError):
        decode_png(b"\x89PNG\r\n\x1a\njunk")
    with _pt.raises(CodecError):
        decode_png(b"not a png")


def test_wav_duration_and_multimodal_real_decoders(ray_session):
    import struct

    import pyarrow as pa

    from pdf_parse_new_ray.stages.codecs import wav_duration
    from pdf_parse_new_ray.stages.multimodal import MediaFeatureExtractor

    # 1 kHz mono 8-bit, 2500 bytes of data → 2.5 s
    fmt = struct.pack("<HHIIHH", 1, 1, 1000, 1000, 1, 8)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", 2500) + b"\x00" * 2500
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert wav_duration(wav) == 2.5

    png = _encode_png(np.zeros((6, 9), np.uint8), filters=[4])
    batch = pa.table({
        "media_ref": pa.array(["p", "w", "badwav"], pa.string()),
        "bytes": pa.array([png, wav, b"RIFF\x10\x00\x00\x00WAVExxxx"], pa.binary()),
    })
    out = MediaFeatureExtractor()(batch).to_pylist()
    assert out[0]["media_type"] == "png" and out[0]["decoded"] is True
    assert (out[0]["width"], out[0]["height"]) == (9, 6)
    assert out[1]["media_type"] == "wav" and out[1]["decoded"] is True
    assert out[1]["duration_s"] == 2.5
    assert out[2]["decoded"] is False and out[2]["error"]


def _encode_gif(idx: np.ndarray, palette: np.ndarray,
                interlace: bool = False) -> bytes:
    """Minimal GIF89a encoder for tests (8-bit color table, LZW stream
    emitting literal codes with periodic clear codes so the code width
    stays 9 — valid, just not size-optimal)."""
    import struct

    h, w = idx.shape
    pal = np.zeros((256, 3), np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries
    out += pal.tobytes()
    fl = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([fl])
    out += bytes([8])  # LZW minimum code size
    rows = idx
    if interlace:  # emit rows in GIF pass order
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order += list(range(start, h, step))
        rows = idx[order]
    # bitstream: 9-bit codes LSB-first, clear every 100 literals
    bits = bytearray()
    acc = nb = 0

    def emit(code):
        nonlocal acc, nb
        acc |= code << nb
        nb += 9
        while nb >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nb -= 8

    emit(256)  # initial clear
    for i, px in enumerate(rows.reshape(-1)):
        if i and i % 100 == 0:
            emit(256)  # keep the decoder table under 512 entries
        emit(int(px))
    emit(257)  # end
    if nb:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        chunk = bits[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_roundtrip_and_interlace():
    from pdf_parse_new_ray.stages.codecs import CodecError, decode_gif

    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    idx = rng.randint(0, 256, (21, 13)).astype(np.uint8)
    for interlace in (False, True):
        h, w, c, out = decode_gif(_encode_gif(idx, pal, interlace=interlace))
        assert (h, w, c) == (21, 13, 3)
        assert np.array_equal(out, pal[idx]), f"interlace={interlace}"
    import pytest as _pt

    with _pt.raises(CodecError):
        decode_gif(b"GIF89ajunk")
    with _pt.raises(CodecError):
        decode_gif(b"not a gif")


def test_multimodal_stage_decodes_gif(ray_session):
    import pyarrow as pa

    from pdf_parse_new_ray.stages.multimodal import MediaFeatureExtractor

    pal = np.tile(np.arange(256, dtype=np.uint8)[:, None], (1, 3))
    gif = _encode_gif(np.zeros((5, 7), np.uint8), pal)
    batch = pa.table({
        "media_ref": pa.array(["g"], pa.string()),
        "bytes": pa.array([gif], pa.binary()),
    })
    out = MediaFeatureExtractor()(batch).to_pylist()
    assert out[0]["media_type"] == "gif" and out[0]["decoded"] is True
    assert (out[0]["width"], out[0]["height"]) == (7, 5)
