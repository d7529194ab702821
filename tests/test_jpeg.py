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
