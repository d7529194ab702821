"""JBIG2 decoder tests: encoder/decoder roundtrips across every region
type, byte-exact differential checks against the LIVE reference decoder
(pdf.worker.js jbig2 module under node), absorb-to-error fuzzing, and
the multimodal stage integration."""

import os
import shutil
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from pdf_parse_new_ray.fixtures.jbig2gen import (build_generic_stream,
                                                 build_halftone_stream,
                                                 build_symbol_text_stream)
from pdf_parse_new_ray.pdfkernel.jbig2 import (JBIG2Error, decode_jbig2,
                                               decode_jbig2_file,
                                               decode_jbig2_packed)


def _ref_available() -> bool:
    return shutil.which("node") is not None and \
        os.path.exists("/root/reference/lib/pdf.js/v4.5.136/build/pdf.worker.js")


def _img(rng, h, w, density=0.3):
    img = (rng.random((h, w)) < density).astype(np.uint8)
    img[h // 4:h // 2, w // 8:w // 2] = 1
    if h > 6:
        img[h - 3] = img[h - 4]  # a typical (repeated) row for TPGDON
    return img


def test_generic_roundtrip_all_templates():
    rng = np.random.default_rng(7)
    for template in range(4):
        for tpgdon in (False, True):
            img = _img(rng, 33, 46)
            stream = build_generic_stream(img.tolist(), template=template,
                                          tpgdon=tpgdon)
            out = decode_jbig2(stream)
            assert np.array_equal(out, img), (template, tpgdon)


def test_generic_nondefault_at_pixels():
    rng = np.random.default_rng(11)
    img = _img(rng, 21, 30)
    at = ((1, -1), (-2, -1), (1, -2), (-1, -2))
    stream = build_generic_stream(img.tolist(), template=0, at=at)
    assert np.array_equal(decode_jbig2(stream), img)


def test_symbol_text_roundtrip_and_placement():
    glyph_a = [[0, 1, 0], [1, 0, 1], [1, 1, 1], [1, 0, 1]]
    glyph_b = [[1, 1, 0], [1, 0, 1], [1, 1, 0], [1, 0, 1], [1, 1, 0]]
    dot = [[1]]
    placements = [(0, 2, 1), (1, 7, 1), (0, 12, 1), (2, 16, 4),
                  (1, 3, 8), (0, 10, 8)]
    stream = build_symbol_text_stream(24, 16, [glyph_a, glyph_b, dot],
                                      placements)
    img = decode_jbig2(stream)
    assert img[1:5, 2:5].tolist() == glyph_a
    assert img[1:6, 7:10].tolist() == glyph_b
    assert img[4, 16] == 1


def test_halftone_roundtrip():
    pats = [[[0] * 3] * 3,
            [[0, 0, 0], [0, 1, 0], [0, 0, 0]],
            [[0, 1, 0], [1, 1, 1], [0, 1, 0]],
            [[1, 1, 1], [1, 1, 1], [1, 1, 1]]]
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 4, (7, 9))
    stream = build_halftone_stream(vals, pats, 3, 3)
    img = decode_jbig2(stream)
    for mg in range(7):
        for ng in range(9):
            cell = img[mg * 3:mg * 3 + 3, ng * 3:ng * 3 + 3]
            assert cell.tolist() == pats[int(vals[mg, ng])], (mg, ng)


@pytest.mark.skipif(not _ref_available(), reason="node/reference unavailable")
def test_differential_vs_reference_decoder():
    """Every stream flavor must decode byte-exactly like the reference's
    pure-JS jbig2 module (packed page buffer comparison)."""
    from jbig2_ref import ref_decode

    rng = np.random.default_rng(42)
    streams = []
    for template in range(4):
        for tpgdon in (False, True):
            img = _img(rng, 40, 57)
            streams.append(build_generic_stream(
                img.tolist(), template=template, tpgdon=tpgdon))
    glyphs = [[[0, 1], [1, 1], [1, 0]], [[1, 1, 1], [0, 1, 0], [0, 1, 0]],
              [[1]]]
    streams.append(build_symbol_text_stream(
        30, 12, glyphs, [(0, 1, 1), (1, 5, 1), (2, 10, 2), (1, 12, 6),
                         (0, 20, 6)]))
    pats = [[[0, 0], [0, 0]], [[1, 0], [0, 0]], [[1, 0], [0, 1]],
            [[1, 1], [1, 1]]]
    streams.append(build_halftone_stream(
        rng.integers(0, 4, (5, 6)), pats, 2, 2))
    for n, stream in enumerate(streams):
        packed, _w, _h = decode_jbig2_packed(stream)
        assert ref_decode(stream) == packed, f"stream {n} diverged"


def test_standalone_file_and_size_cap():
    rng = np.random.default_rng(5)
    img = _img(rng, 12, 17)
    stream = build_generic_stream(img.tolist())
    blob = b"\x97JB2\r\n\x1a\x0a" + bytes([1]) + (1).to_bytes(4, "big") \
        + stream
    packed, w, h = decode_jbig2_file(blob)
    assert (w, h) == (17, 12)
    with pytest.raises(JBIG2Error):
        decode_jbig2_file(blob, max_pixels=10)
    with pytest.raises(JBIG2Error):
        decode_jbig2_file(b"not a jbig2 file")


def test_fuzz_mutations_absorb():
    """Bit flips / truncations must raise JBIG2Error (or decode), never
    crash with arbitrary exceptions — the multimodal absorb contract."""
    import struct

    rng = np.random.default_rng(9)
    img = _img(rng, 20, 20)
    stream = bytearray(build_generic_stream(img.tolist()))
    for i in range(60):
        mutated = bytearray(stream)
        if i % 3 == 0:
            mutated = mutated[:rng.integers(1, len(mutated))]
        else:
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_jbig2_packed(bytes(mutated), max_pixels=1 << 22)
        except (JBIG2Error, IndexError, ValueError, struct.error):
            pass  # parse errors are fine; no hangs, no segfaults


def test_multimodal_stage_decodes_jbig2(ray_session):
    import ray.data as rd

    from pdf_parse_new_ray.stages.multimodal import MediaFeatureExtractor

    rng = np.random.default_rng(21)
    img = _img(rng, 14, 19)
    stream = build_generic_stream(img.tolist())
    blob = b"\x97JB2\r\n\x1a\x0a" + bytes([1]) + (1).to_bytes(4, "big") \
        + stream
    ds = rd.from_items([{"media_ref": "m1", "bytes": blob},
                        {"media_ref": "m2", "bytes": b"\x97JB2\r\n\x1a\x0abad"}])
    out = ds.map_batches(MediaFeatureExtractor, concurrency=1,
                         batch_format="pyarrow").to_pandas()
    row = out[out.media_ref == "m1"].iloc[0]
    assert row.media_type == "jbig2"
    assert bool(row.decoded) and row.width == 19 and row.height == 14
    bad = out[out.media_ref == "m2"].iloc[0]
    assert bad.media_type == "jbig2" and not bool(bad.decoded)


def test_huffman_symbol_text_roundtrip_and_reference():
    """Huffman-coded symbol dictionary (uncompressed collective bitmap)
    + Huffman text region, with standard tables and with a custom
    type-53 DS table — placement exact and byte-exact vs reference."""
    from pdf_parse_new_ray.fixtures.jbig2gen import \
        build_huffman_symbol_text_stream

    glyph_a = [[0, 1, 0], [1, 0, 1], [1, 1, 1], [1, 0, 1]]
    glyph_b = [[1, 1, 0], [1, 0, 1], [1, 1, 0], [1, 0, 1], [1, 1, 0]]
    dot = [[1]]
    placements = [(0, 2, 1), (1, 7, 1), (0, 12, 1), (2, 16, 4),
                  (1, 3, 8), (0, 10, 8)]
    for custom, mmr in ((False, False), (True, False), (False, True)):
        stream = build_huffman_symbol_text_stream(
            24, 16, [glyph_a, glyph_b, dot], placements, custom_ds=custom,
            mmr=mmr)
        img = decode_jbig2(stream)
        assert img[1:5, 2:5].tolist() == glyph_a, custom
        assert img[1:6, 7:10].tolist() == glyph_b, custom
        assert img[4, 16] == 1, custom
        if _ref_available():
            from jbig2_ref import ref_decode

            packed, _w, _h = decode_jbig2_packed(stream)
            assert ref_decode(stream) == packed, custom


def test_huffman_fuzz_absorbs():
    import struct

    from pdf_parse_new_ray.fixtures.jbig2gen import \
        build_huffman_symbol_text_stream

    glyphs = [[[1, 0], [0, 1]], [[1]]]
    stream = bytearray(build_huffman_symbol_text_stream(
        12, 8, glyphs, [(0, 1, 1), (1, 5, 3)]))
    rng = np.random.default_rng(13)
    for i in range(50):
        mutated = bytearray(stream)
        if i % 3 == 0:
            mutated = mutated[:rng.integers(1, len(mutated))]
        else:
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            decode_jbig2_packed(bytes(mutated), max_pixels=1 << 20)
        except (JBIG2Error, IndexError, ValueError, KeyError, struct.error):
            pass


def test_refinement_symbol_dict_and_text_region():
    """SDREFAGG=1 dictionary (new symbol refines a base dictionary's
    export) and per-instance IARI text-region refinement, byte-exact
    vs the reference."""
    from pdf_parse_new_ray.fixtures.jbig2gen import \
        build_refined_symbol_text_stream

    glyph_a = [[0, 1, 0], [1, 0, 1], [1, 1, 1], [1, 0, 1]]
    glyph_b = [[1, 1, 0], [1, 0, 1], [1, 1, 0], [1, 0, 1], [1, 1, 0]]
    a_prime = [[0, 1, 0], [1, 1, 1], [1, 1, 1], [1, 0, 1]]
    blob = [[1, 1, 1, 1], [1, 0, 0, 1], [1, 0, 0, 1], [1, 1, 1, 1]]
    placements = [(0, 1, 1), (1, 6, 1), (2, 11, 1), (1, 3, 8)]
    stream = build_refined_symbol_text_stream(
        20, 16, [glyph_a, glyph_b], [(0, a_prime, 0, 0)], placements,
        inline_refine={3: (blob, 1, -1, 0, 0)})
    img = decode_jbig2(stream)
    assert img[1:5, 1:4].tolist() == glyph_a
    assert img[1:6, 6:9].tolist() == glyph_b
    assert img[1:5, 11:14].tolist() == a_prime
    if _ref_available():
        from jbig2_ref import ref_decode

        packed, _w, _h = decode_jbig2_packed(stream)
        assert ref_decode(stream) == packed


def test_halftone_mmr_roundtrip():
    """HMMR=1: gray planes share one T.6 cursor with per-plane EOFB
    (T.88 C.5; reference pdf.worker.js:9994-10005), pattern dictionary
    HDMMR=1 collective bitmap."""
    pats8 = [[[int(bool(v & (1 << (2 - r)) and c != 1)) for c in range(3)]
              for r in range(3)] for v in range(8)]
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 8, (9, 11))
    stream = build_halftone_stream(vals, pats8, 3, 3, mmr=True)
    img = decode_jbig2(stream)
    for mg in range(9):
        for ng in range(11):
            cell = img[mg * 3:mg * 3 + 3, ng * 3:ng * 3 + 3]
            assert cell.tolist() == pats8[int(vals[mg, ng])], (mg, ng)


@pytest.mark.skipif(not _ref_available(), reason="node/reference unavailable")
def test_halftone_mmr_vs_reference():
    from jbig2_ref import ref_decode

    rng = np.random.default_rng(13)
    pats = [[[0, 0], [0, 0]], [[1, 0], [0, 0]], [[1, 0], [0, 1]],
            [[1, 1], [1, 1]]]
    for shape in ((5, 6), (13, 3), (1, 9)):
        vals = rng.integers(0, 4, shape)
        stream = build_halftone_stream(vals, pats, 2, 2, mmr=True)
        packed, _w, _h = decode_jbig2_packed(stream)
        assert ref_decode(stream) == packed, shape
