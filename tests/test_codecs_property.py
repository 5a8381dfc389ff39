"""Property-based codec round-trips (hypothesis): arbitrary unicode,
arbitrary bytes, arbitrary int64/float64 arrays with nulls — decode must
reproduce encode input bit-identically for every codec the selector can
legally choose.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from fhirflat_spark.codecs import decode_array, encode_array

_settings = settings(max_examples=60, deadline=None)


def _roundtrip(arr: pa.Array, codec: str = "auto"):
    out = decode_array(encode_array(arr, codec=codec))
    assert out.type.equals(arr.type)
    assert out.to_pylist() == arr.to_pylist()


@_settings
@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=200)),
        max_size=300,
    )
)
def test_any_unicode_roundtrips(values):
    _roundtrip(pa.array(values, type=pa.string()))


@_settings
@given(
    st.lists(
        st.one_of(st.none(), st.binary(max_size=300)),
        max_size=200,
    )
)
def test_any_bytes_roundtrip(values):
    _roundtrip(pa.array(values, type=pa.binary()))


@_settings
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
        ),
        max_size=300,
    )
)
def test_any_int64_roundtrips(values):
    arr = pa.array(values, type=pa.int64())
    _roundtrip(arr)
    if arr.null_count == 0 and len(arr):
        for codec in ("for", "delta", "zstd"):
            _roundtrip(arr, codec)


@_settings
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.floats(allow_nan=False),  # NaN compared separately below
        ),
        max_size=300,
    )
)
def test_any_float64_roundtrips(values):
    _roundtrip(pa.array(values, type=pa.float64()))


def test_nan_bit_patterns_roundtrip():
    # bit-exactness beyond to_pylist: raw buffer comparison incl. NaNs/-0.0
    v = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 5e-324], dtype=np.float64)
    arr = pa.array(v)
    out = decode_array(encode_array(arr, codec="bss"))
    assert out.to_numpy(zero_copy_only=False).tobytes() == v.tobytes()


@_settings
@given(st.lists(st.text(max_size=60), min_size=1, max_size=200))
def test_sorted_strings_prefix_codec(values):
    arr = pa.array(sorted(values), type=pa.string())
    _roundtrip(arr, "prefix")


@_settings
@given(
    st.lists(
        st.one_of(
            st.text(max_size=120),
            st.text(alphabet="0123456789abcdef", min_size=8, max_size=64),
        ),
        max_size=300,
    )
)
def test_fsst_tile_format_roundtrips(values):
    """Force the r4 fsst tile-pair format on arbitrary mixed text + hex
    (odd lengths, empty rows, repeated tiles, unicode): bit-identical or
    a clean CodecError (too little data to train) — never wrong bytes."""
    from fhirflat_spark.codecs.core import CodecError

    arr = pa.array(values, type=pa.string())
    try:
        _roundtrip(arr, codec="fsst")
    except CodecError:
        pass  # "no viable symbols" on tiny/low-repeat samples is legal
