"""Property-based tests (hypothesis) for the coding primitives every
image codec sits on: the MQ arithmetic coder pair, the reversible 5/3
DWT, CCITT G4, and JBIG2 generic-region roundtrips on arbitrary
bitmaps.  These hunt the corner cases fixed-seed tests miss (the MQ
flush bug this round was exactly such a tail case)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pdf_parse_new_ray.fixtures.jbig2gen import MQEncoder, build_generic_stream
from pdf_parse_new_ray.pdfkernel.jbig2 import MQDecoder, decode_jbig2

_settings = settings(max_examples=60, deadline=None)


@given(steps=st.lists(st.tuples(st.integers(0, 18), st.integers(0, 1)),
                      min_size=1, max_size=400),
       raw=st.booleans())
@_settings
def test_mq_coder_roundtrip(steps, raw):
    enc = MQEncoder()
    cxe = bytearray(19)
    for ctx, bit in steps:
        enc.encode(cxe, ctx, bit)
    data = enc.finish_raw() if raw else enc.finish()
    dec = MQDecoder(data, 0, len(data))
    cxd = bytearray(19)
    out = [dec.read_bit(cxd, ctx) for ctx, _ in steps]
    assert out == [bit for _, bit in steps]


@given(w=st.integers(1, 40), h=st.integers(1, 40),
       levels=st.integers(1, 4), seed=st.integers(0, 2**31))
@_settings
def test_dwt53_roundtrip(w, h, levels, seed):
    from pdf_parse_new_ray.fixtures.jpxgen import fdwt53
    from pdf_parse_new_ray.pdfkernel.jpx import idwt53

    rng = np.random.default_rng(seed)
    img = rng.integers(-300, 300, (h, w)).astype(np.int64)
    ll, chain = fdwt53(img, levels)
    assert np.array_equal(idwt53(ll, chain), img)


@given(w=st.integers(1, 48), h=st.integers(1, 24),
       density=st.floats(0.0, 1.0), seed=st.integers(0, 2**31))
@_settings
def test_ccitt_g4_roundtrip(w, h, density, seed):
    from pdf_parse_new_ray.fixtures.ccittgen import encode_g4
    from pdf_parse_new_ray.pdfkernel.ccitt import decode_ccitt

    rng = np.random.default_rng(seed)
    img = (rng.random((h, w)) < density).astype(np.uint8)
    out = decode_ccitt(encode_g4(img), columns=w, rows=h, k=-1)
    assert np.array_equal(out, img)


@given(w=st.integers(1, 32), h=st.integers(1, 32),
       template=st.integers(0, 3), tpgdon=st.booleans(),
       density=st.floats(0.0, 1.0), seed=st.integers(0, 2**31))
@_settings
def test_jbig2_generic_roundtrip(w, h, template, tpgdon, density, seed):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w)) < density).astype(np.uint8)
    stream = build_generic_stream(img.tolist(), template=template,
                                  tpgdon=tpgdon)
    assert np.array_equal(decode_jbig2(stream), img)


@given(w=st.integers(1, 24), h=st.integers(1, 24),
       levels=st.integers(0, 3), seed=st.integers(0, 2**31))
@_settings
def test_jpx_codestream_roundtrip(w, h, levels, seed):
    from pdf_parse_new_ray.fixtures.jpxgen import encode_jpx
    from pdf_parse_new_ray.pdfkernel.jpx import decode_jpx

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    assert np.array_equal(decode_jpx(encode_jpx(img, levels=levels)), img)
