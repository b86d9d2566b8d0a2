"""Property-based tests (hypothesis) for the pure-numpy media codecs.

LZW and palette-GIF round-trips are EXACT properties over arbitrary
inputs; JPEG is lossy, so its properties are shape/determinism plus an
error bound on smooth content at high quality.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from datafusion_python_spark.operators.codecs import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_png,
    encode_gif,
    encode_png,
)
from datafusion_python_spark.operators.jpeg import decode_jpeg, encode_jpeg

SETTINGS = dict(max_examples=25, deadline=None)


@settings(**SETTINGS)
@given(
    data=st.binary(min_size=0, max_size=4000),
    min_code=st.integers(min_value=2, max_value=8),
)
def test_lzw_roundtrip_arbitrary_bytes(data, min_code):
    # indices must fit the initial code table
    idx = np.frombuffer(data, np.uint8) % (1 << min_code)
    enc = _lzw_encode(idx, min_code)
    dec = _lzw_decode(enc, min_code, len(idx))
    assert dec == list(idx)


@settings(**SETTINGS)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    n_colors=st.integers(min_value=1, max_value=256),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_gif_roundtrip_paletted(h, w, n_colors, seed):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    img = palette[rng.integers(0, n_colors, (h, w))]
    assert (decode_gif(encode_gif(img)) == img).all()


@settings(**SETTINGS)
@given(
    h=st.integers(min_value=1, max_value=33),
    w=st.integers(min_value=1, max_value=33),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_png_roundtrip_exact(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


@settings(**SETTINGS)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_jpeg_shape_determinism_and_smooth_bound(h, w, seed):
    rng = np.random.default_rng(seed)
    # smooth content: low-frequency gradient with small noise
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 199 / max(w, 1) + yy * 53 / max(h, 1)) % 256
    img = np.stack([base, 255 - base, (base + 64) % 256], axis=-1).astype(np.uint8)
    enc = encode_jpeg(img, quality=95)
    dec = decode_jpeg(enc)
    assert dec.shape == (h, w, 3)
    assert encode_jpeg(img, quality=95) == enc  # deterministic
    # gradients at q95 stay within a few gray levels except at the
    # wraparound seams (modulo 256 creates step edges → ringing)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert float(np.median(err)) <= 4


@settings(**SETTINGS)
@given(
    h=st.integers(min_value=1, max_value=32),
    w=st.integers(min_value=1, max_value=32),
    seed=st.integers(min_value=0, max_value=2**31),
    quality=st.integers(min_value=50, max_value=100),
)
def test_jpeg_progressive_equals_baseline_decode(h, w, seed, quality):
    # both modes encode the same quantized coefficients, so their decodes
    # must be bit-identical — random content stresses every scan path
    from datafusion_python_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (
        decode_jpeg(encode_jpeg_progressive(img, quality=quality))
        == decode_jpeg(encode_jpeg(img, quality=quality))
    ).all()


@settings(**SETTINGS)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    fill=st.integers(min_value=0, max_value=255),
)
def test_jpeg_flat_image_near_exact(h, w, fill):
    img = np.full((h, w, 3), fill, np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2
