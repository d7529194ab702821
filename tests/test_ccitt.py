"""CCITT G3/G4 decoder conformance (pdfkernel/ccitt.py) + the TIFF
container path that carries it into the multimodal stage.  The encoders
(fixtures/ccittgen.py) implement the standard T.4/T.6 coding procedure,
so round-trips are bit-exact."""

import struct

import numpy as np
import pytest

from pdf_parse_new_ray.fixtures.ccittgen import encode_g3_1d, encode_g4
from pdf_parse_new_ray.pdfkernel.ccitt import decode_ccitt, pack_bilevel
from pdf_parse_new_ray.pdfkernel import PDFError


def _cases():
    rng = np.random.RandomState(3)
    out = [
        ("all-white", np.zeros((10, 40), np.uint8)),
        ("all-black", np.ones((10, 40), np.uint8)),
        ("sparse-noise", (rng.rand(24, 100) > 0.8).astype(np.uint8)),
        ("dense-noise-odd", (rng.rand(12, 33) > 0.5).astype(np.uint8)),
    ]
    img = np.zeros((20, 64), np.uint8)
    img[5:15, 10:50] = 1
    out.append(("block", img))
    img = np.zeros((16, 80), np.uint8)
    img[:, ::7] = 1
    out.append(("stripes", img))  # dense transitions: H/V/P mode mix
    img = np.zeros((5, 2600), np.uint8)
    img[:, 2590:] = 1
    out.append(("long-runs", img))  # extended makeup codes (>1728)
    for s in range(12):
        r2 = np.random.RandomState(50 + s)
        hh, ww = int(r2.randint(1, 40)), int(r2.randint(1, 200))
        out.append((f"rand{s}", (r2.rand(hh, ww) > r2.rand()).astype(np.uint8)))
    return out


def test_g4_roundtrip_matrix():
    for name, img in _cases():
        out = decode_ccitt(encode_g4(img), columns=img.shape[1],
                           rows=img.shape[0], k=-1)
        assert np.array_equal(out, img), name


def test_g3_1d_roundtrip_matrix():
    for name, img in _cases():
        out = decode_ccitt(encode_g3_1d(img), columns=img.shape[1],
                           rows=img.shape[0], k=0)
        assert np.array_equal(out, img), name


def test_g4_eofb_terminates_without_rows():
    img = (np.random.RandomState(1).rand(9, 31) > 0.6).astype(np.uint8)
    out = decode_ccitt(encode_g4(img), columns=31, k=-1)
    assert out.shape == (9, 31)
    assert np.array_equal(out, img)


def test_truncated_stream_rejects_with_rows():
    img = np.ones((8, 64), np.uint8)
    enc = encode_g4(img)
    with pytest.raises(PDFError):
        decode_ccitt(enc[: len(enc) // 3], columns=64, rows=8, k=-1)


def test_pack_bilevel_conventions():
    img = np.array([[1, 0, 1, 1, 0, 0, 0, 0]], np.uint8)
    # PDF default (BlackIs1 false): 0 bits are black
    assert pack_bilevel(img) == bytes([0b01001111])
    assert pack_bilevel(img, black_is_1=True) == bytes([0b10110000])


# --- TIFF container -------------------------------------------------------


def _encode_tiff(strips, w, h, comp, bits=1, photo=0, rows_per_strip=None):
    """Minimal little-endian TIFF writer for tests."""
    rows_per_strip = rows_per_strip or h
    entries = []
    extra = bytearray()
    base = 8 + 2 + 12 * 8 + 4  # header + count + 8 entries + next-IFD

    def entry(tag, typ, vals):
        size = {3: 2, 4: 4}[typ]
        if size * len(vals) <= 4:
            payload = b"".join(struct.pack("<" + ("H" if typ == 3 else "I"), v)
                               for v in vals).ljust(4, b"\x00")
            entries.append(struct.pack("<HHI", tag, typ, len(vals)) + payload)
        else:
            off = base + len(extra)
            for v in vals:
                extra.extend(struct.pack("<" + ("H" if typ == 3 else "I"), v))
            entries.append(struct.pack("<HHII", tag, typ, len(vals), off))

    strip_data_off = base  # patched after extras are known
    # first pass to lay out value extras, then strip offsets
    offsets = []
    pos = 0
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [bits])
    entry(259, 3, [comp])
    entry(262, 3, [photo])
    entry(273, 4, [0] * len(strips))  # patched below
    entry(278, 4, [rows_per_strip])
    entry(279, 4, [len(s) for s in strips])
    data_off = base + len(extra)
    abs_offsets = [data_off + o for o in offsets]
    # rebuild entry 273 with real offsets
    entries_final = []
    extra2 = bytearray()
    base2 = base

    def entry2(tag, typ, vals):
        size = {3: 2, 4: 4}[typ]
        if size * len(vals) <= 4:
            payload = b"".join(struct.pack("<" + ("H" if typ == 3 else "I"), v)
                               for v in vals).ljust(4, b"\x00")
            entries_final.append(struct.pack("<HHI", tag, typ, len(vals)) + payload)
        else:
            off = base2 + len(extra2)
            for v in vals:
                extra2.extend(struct.pack("<" + ("H" if typ == 3 else "I"), v))
            entries_final.append(struct.pack("<HHII", tag, typ, len(vals), off))

    entry2(256, 4, [w])
    entry2(257, 4, [h])
    entry2(258, 3, [bits])
    entry2(259, 3, [comp])
    entry2(262, 3, [photo])
    entry2(273, 4, abs_offsets)
    entry2(278, 4, [rows_per_strip])
    entry2(279, 4, [len(s) for s in strips])
    assert len(extra2) == len(extra)  # same layout both passes
    out = b"II*\x00" + struct.pack("<I", 8)
    out += struct.pack("<H", 8) + b"".join(entries_final) + b"\x00\x00\x00\x00"
    out += bytes(extra2)
    out += b"".join(strips)
    return out


def test_tiff_g4_and_uncompressed():
    from pdf_parse_new_ray.stages.codecs import decode_tiff

    img = (np.random.RandomState(7).rand(22, 61) > 0.7).astype(np.uint8)
    # G4, two strips, WhiteIsZero
    s1 = encode_g4(img[:11])
    s2 = encode_g4(img[11:])
    tif = _encode_tiff([s1, s2], 61, 22, comp=4, rows_per_strip=11)
    h, w, c, px = decode_tiff(tif)
    assert (h, w, c) == (22, 61, 1)
    assert np.array_equal(px, (1 - img) * 255)  # photo=0: white is 0 → black=0
    # uncompressed bilevel, single strip
    packed = np.packbits(img, axis=1).tobytes()
    tif2 = _encode_tiff([packed], 61, 22, comp=1, photo=1)
    h, w, c, px = decode_tiff(tif2)
    assert np.array_equal(px, img * 255)


def test_tiff_lzw_gray_and_multimodal(ray_session):
    import pyarrow as pa

    from pdf_parse_new_ray.fixtures.pdfgen import lzw_encode
    from pdf_parse_new_ray.stages.codecs import decode_tiff
    from pdf_parse_new_ray.stages.multimodal import MediaFeatureExtractor

    gray = np.random.RandomState(5).randint(0, 256, (14, 23)).astype(np.uint8)
    tif = _encode_tiff([lzw_encode(gray.tobytes())], 23, 14, comp=5, bits=8,
                       photo=1)
    h, w, c, px = decode_tiff(tif)
    assert (h, w, c) == (14, 23, 1)
    assert np.array_equal(px, gray)

    img = (np.random.RandomState(9).rand(9, 17) > 0.5).astype(np.uint8)
    good = _encode_tiff([encode_g4(img)], 17, 9, comp=4)
    batch = pa.table({
        "media_ref": pa.array(["t", "bad"], pa.string()),
        "bytes": pa.array([good, b"II*\x00garbage"], pa.binary()),
    })
    out = MediaFeatureExtractor()(batch).to_pylist()
    assert out[0]["media_type"] == "tiff" and out[0]["decoded"] is True
    assert (out[0]["width"], out[0]["height"]) == (17, 9)
    assert out[1]["media_type"] == "tiff" and out[1]["decoded"] is False
    assert out[1]["error"]


def test_multimodal_fuzz_never_crashes(ray_session):
    """Random mutations of every container format must flow through the
    multimodal stage as decoded=False-or-True rows — never a crashed
    task, never a hang (absorb-to-error contract across ALL decoders)."""
    import pyarrow as pa

    from pdf_parse_new_ray.fixtures.ccittgen import encode_g4
    from pdf_parse_new_ray.fixtures.jpeggen import (encode_baseline_jpeg,
                                                    encode_progressive_jpeg)
    from pdf_parse_new_ray.stages.multimodal import MediaFeatureExtractor

    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_jpeg import _encode_gif, _encode_png

    rng = np.random.RandomState(123)
    img = rng.randint(0, 256, (12, 17)).astype(np.uint8)
    bil = (img > 128).astype(np.uint8)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    seeds = [
        encode_baseline_jpeg(img),
        encode_progressive_jpeg(img),
        _encode_png(img),
        _encode_gif(img, pal),
        _encode_tiff([encode_g4(bil)], 17, 12, comp=4),
        _encode_tiff([np.packbits(bil, axis=1).tobytes()], 17, 12, comp=1),
    ]
    refs, blobs = [], []
    k = 0
    for seed in seeds:
        for _ in range(40):
            blob = bytearray(seed)
            for _ in range(rng.randint(1, 8)):
                blob[rng.randint(0, len(blob))] = rng.randint(0, 256)
            refs.append(f"fz-{k}")
            blobs.append(bytes(blob))
            k += 1
    batch = pa.table({"media_ref": pa.array(refs, pa.string()),
                      "bytes": pa.array(blobs, pa.binary())})
    out = MediaFeatureExtractor()(batch).to_pylist()
    assert len(out) == len(blobs)
    for r in out:
        assert isinstance(r["decoded"], bool)
        if not r["decoded"] and r["media_type"] in (
                "jpeg", "png", "gif", "tiff"):
            assert r["error"] or r["media_type"]  # absorbed, surfaced


def _make_mp3(n_frames=40, bitrate_idx=9, vbr=False):
    """Minimal MPEG1 Layer-III CBR/VBR stream (silent frames)."""
    # header: sync, MPEG1 (11), Layer III (01), no CRC (1)
    h0, h1 = 0xFF, 0xFB
    h2 = (bitrate_idx << 4) | (0 << 2)  # 44100 Hz
    h3 = 0xC0  # mono
    bitrate = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
               160, 192, 224, 256, 320, 0)[bitrate_idx] * 1000
    flen = 144 * bitrate // 44100
    frame = bytearray([h0, h1, h2, h3]) + b"\x00" * (flen - 4)
    if vbr:
        # Xing tag at 4 + side_info(17 for mono MPEG1)
        off = 4 + 17
        frame[off:off + 4] = b"Xing"
        frame[off + 4:off + 8] = struct.pack(">I", 1)  # flags: frames
        frame[off + 8:off + 12] = struct.pack(">I", n_frames)
    return bytes(frame) * n_frames


def _make_mp4(duration_s=7.5, timescale=1000):
    mvhd = bytes([0, 0, 0, 0]) + struct.pack(">II", 0, 0) \
        + struct.pack(">II", timescale, int(duration_s * timescale)) + b"\x00" * 80
    mvhd_box = struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    moov = struct.pack(">I", 8 + len(mvhd_box)) + b"moov" + mvhd_box
    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    return ftyp + moov


def test_audio_video_durations(ray_session):
    import pyarrow as pa

    from pdf_parse_new_ray.stages.codecs import mp3_duration, mp4_duration
    from pdf_parse_new_ray.stages.multimodal import MediaFeatureExtractor

    mp3_cbr = _make_mp3(n_frames=38)  # 38 * 1152 / 44100 s via size/bitrate
    d = mp3_duration(mp3_cbr)
    assert abs(d - 38 * 1152 / 44100) < 0.05  # CBR estimate
    mp3_vbr = _make_mp3(n_frames=25, vbr=True)
    assert abs(mp3_duration(mp3_vbr) - 25 * 1152 / 44100) < 1e-9  # exact
    mp4 = _make_mp4(7.5)
    assert mp4_duration(mp4) == 7.5

    batch = pa.table({
        "media_ref": pa.array(["a", "b", "c", "bad"], pa.string()),
        "bytes": pa.array([mp3_cbr, mp3_vbr, mp4,
                           b"\xff\xfb\x7cbad-sr-index"], pa.binary()),
    })
    out = MediaFeatureExtractor()(batch).to_pylist()
    assert out[0]["media_type"] == "mp3" and out[0]["decoded"] is True
    assert out[1]["decoded"] is True
    assert abs(out[1]["duration_s"] - 25 * 1152 / 44100) < 1e-6
    assert out[2]["media_type"] == "mp4" and out[2]["duration_s"] == 7.5
    assert out[3]["decoded"] is False and out[3]["error"]


def _make_ogg_vorbis(rate=8000, total_samples=12000):
    def page(body, granule, seq, typ=0):
        segs = []
        n = len(body)
        while n >= 255:
            segs.append(255)
            n -= 255
        segs.append(n)
        hdr = (b"OggS" + bytes([0, typ]) + struct.pack("<q", granule)
               + struct.pack("<III", 1, seq, 0) + bytes([len(segs)])
               + bytes(segs))
        return hdr + body
    idh = b"\x01vorbis" + struct.pack("<IB", 0, 1) + struct.pack("<I", rate) \
        + b"\x00" * 12
    return page(idh, 0, 0, typ=2) + page(b"\x00" * 10, total_samples, 1, typ=4)


def test_ogg_duration(ray_session):
    import pyarrow as pa

    from pdf_parse_new_ray.stages.codecs import CodecError, ogg_duration
    from pdf_parse_new_ray.stages.multimodal import MediaFeatureExtractor

    ogg = _make_ogg_vorbis(rate=8000, total_samples=12000)
    assert ogg_duration(ogg) == 1.5
    with pytest.raises(CodecError):
        ogg_duration(b"OggSjunk")

    batch = pa.table({"media_ref": pa.array(["o"], pa.string()),
                      "bytes": pa.array([ogg], pa.binary())})
    out = MediaFeatureExtractor()(batch).to_pylist()
    assert out[0]["media_type"] == "ogg" and out[0]["decoded"] is True
    assert out[0]["duration_s"] == 1.5


def test_avi_duration(ray_session):
    import ray.data as rd

    from pdf_parse_new_ray.fixtures.media_mixed import _make_avi
    from pdf_parse_new_ray.stages.codecs import avi_duration
    from pdf_parse_new_ray.stages.multimodal import MediaFeatureExtractor

    blob = _make_avi(12.3)
    assert abs(avi_duration(blob) - 12.32) < 1e-9  # 25fps rounding
    ds = rd.from_items([{"media_ref": "v1", "bytes": blob},
                        {"media_ref": "v2",
                         "bytes": b"RIFF\x10\x00\x00\x00AVI corrupt!"}])
    out = ds.map_batches(MediaFeatureExtractor, concurrency=1,
                         batch_format="pyarrow").to_pandas().set_index(
                             "media_ref")
    assert out.loc["v1"].media_type == "avi"
    assert bool(out.loc["v1"].decoded)
    assert abs(out.loc["v1"].duration_s - 12.32) < 1e-6
    assert not bool(out.loc["v2"].decoded)
