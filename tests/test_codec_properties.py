"""Property-based codec round trips (hypothesis): arbitrary shapes,
channel counts, filters, and sample widths — the fixed-seed tests in
test_jpeg.py/test_codecs.py pin known cases; these sweep the space."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from parallel_inverted_index_map_reduce_spark.functions import audio as A
from parallel_inverted_index_map_reduce_spark.functions import jpeg as J
from parallel_inverted_index_map_reduce_spark.functions import png as P

ONES = np.ones(64, dtype=np.int64)


def _img(h, w, ch, seed):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, (h, w, ch), dtype=np.uint8)
    return a[:, :, 0] if ch == 1 else a


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ch=st.sampled_from([1, 2, 3, 4]),
    ftype=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, ftype, seed):
    img = _img(h, w, ch, seed)
    dec = P.decode_png(P.encode_png(img, filter_type=ftype))
    got = dec["pixels"][:, :, 0] if img.ndim == 2 else dec["pixels"]
    np.testing.assert_array_equal(got, img)


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    h=st.integers(1, 48),
    w=st.integers(1, 48),
    gray=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
    restart=st.sampled_from([0, 1, 3]),
)
def test_jpeg_roundtrip_property(h, w, gray, seed, restart):
    """All-ones quantization: error bounded by the float DCT round trip
    (a couple of levels), whatever the dimensions or restart layout."""
    img = _img(h, w, 1 if gray else 3, seed)
    enc = J.encode_baseline_jpeg(
        img, quant_luma=ONES, quant_chroma=ONES, restart_interval=restart
    )
    dec = J.decode_baseline_jpeg(enc)
    assert (dec["height"], dec["width"]) == (h, w)
    got = dec["pixels"][:, :, 0] if gray else dec["pixels"]
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 3


@settings(max_examples=25, deadline=None, derandomize=True)
@given(
    n=st.integers(1, 2000),
    ch=st.integers(1, 4),
    rate=st.integers(1, 192_000),
    bits=st.sampled_from([8, 16]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, bits, seed):
    rng = np.random.RandomState(seed)
    if bits == 8:
        s = rng.randint(0, 256, (n, ch)).astype(np.int64)
    else:
        s = rng.randint(-32768, 32768, (n, ch)).astype(np.int64)
    d = A.decode_wav(A.encode_wav(s, rate, bits=bits))
    assert (d["n_samples"], d["n_channels"], d["sample_rate"]) == (n, ch, rate)
    np.testing.assert_array_equal(d["samples"], s)
