"""Property-based tests (hypothesis) for the pure-numpy/pure-python
kernels — these run without a SparkSession, so they explore far more
of the input space per second than the golden tests."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from enhydris_autoprocess_spark.storage.gorilla import (
    decode_chunk,
    encode_chunk,
    encode_chunk_fast,
)
from enhydris_autoprocess_spark.timeutil import parse_step, step_ratio


@st.composite
def series(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    # timestamps: sorted, possibly huge gaps and sub-second jitter
    deltas = draw(
        st.lists(
            st.integers(min_value=1, max_value=1 << 40),
            min_size=n - 1,
            max_size=n - 1,
        )
    )
    t0 = draw(st.integers(min_value=0, max_value=1 << 50))
    ts = np.array([t0, *np.cumsum(deltas) + t0][:n], dtype=np.int64)
    # values: any float64 bit pattern is legal payload
    raw = draw(
        st.lists(
            st.integers(min_value=0, max_value=(1 << 64) - 1),
            min_size=n,
            max_size=n,
        )
    )
    vals = np.array(raw, dtype=np.uint64).view(np.float64)
    return ts, vals


@settings(max_examples=60, deadline=None)
@given(series())
def test_gorilla_roundtrip_any_bit_pattern(s):
    ts, vals = s
    for enc in (encode_chunk, encode_chunk_fast):
        t2, v2 = decode_chunk(enc(ts, vals))
        assert np.array_equal(t2, ts)
        # compare BIT PATTERNS: NaN payloads must survive exactly
        assert np.array_equal(v2.view(np.uint64), vals.view(np.uint64))


@settings(max_examples=100, deadline=None)
@given(
    st.sampled_from(["1min", "5min", "10min", "30min", "H", "2H", "6H", "D"]),
    st.sampled_from(["10min", "30min", "H", "2H", "6H", "D"]),
)
def test_step_ratio_consistency(src, dst):
    a, b = parse_step(src), parse_step(dst)
    if b.seconds % a.seconds == 0:
        assert step_ratio(a, b) == b.seconds // a.seconds
