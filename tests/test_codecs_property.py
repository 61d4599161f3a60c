"""Property-based codec round-trips (Hypothesis): any generated column
must survive encode∘decode bit-exactly under every applicable codec and
under auto-selection. Complements the fixed adversarial arrays in
test_codecs.py with search over the input space.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from osm_pbf_parquet_spark.functions.codecs import decode_array, encode_array

SETTINGS = settings(max_examples=60, deadline=None)

i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
opt_i64 = st.one_of(st.none(), i64)
floats = st.floats(allow_nan=True, allow_infinity=True, width=64)
opt_float = st.one_of(st.none(), floats)
texts = st.one_of(st.none(), st.text(max_size=200))
blobs = st.one_of(st.none(), st.binary(max_size=200))


def bit_equal(a: pa.Array, b: pa.Array) -> bool:
    if a.type != b.type or len(a) != len(b):
        return False
    if pa.types.is_floating(a.type):
        na = a.is_null().to_numpy(zero_copy_only=False)
        nb = b.is_null().to_numpy(zero_copy_only=False)
        if not np.array_equal(na, nb):
            return False
        va = a.fill_null(0.0).to_numpy(zero_copy_only=False)
        vb = b.fill_null(0.0).to_numpy(zero_copy_only=False)
        return np.array_equal(va.view(np.uint8), vb.view(np.uint8))
    return a.equals(b)


def check(arr: pa.Array, codecs: tuple) -> None:
    for codec in (None, *codecs):
        name, params, payload = encode_array(arr, codec)
        out = decode_array(name, params, payload)
        assert bit_equal(out, arr), (codec, name, arr[:5], out[:5])


@SETTINGS
@given(st.lists(opt_i64, max_size=300))
def test_int64_roundtrip_any(values):
    check(pa.array(values, type=pa.int64()),
          ("bitpack", "delta", "rle", "dictint", "plain", "zstd"))


@SETTINGS
@given(st.lists(opt_float, max_size=300))
def test_float_roundtrip_any(values):
    check(pa.array(values, type=pa.float64()),
          ("alp", "rle", "dictint", "plain", "zstd"))


@SETTINGS
@given(st.lists(texts, max_size=200))
def test_string_roundtrip_any(values):
    check(pa.array(values, type=pa.string()),
          ("str_plain", "str_zstd", "str_dict", "str_fsst", "plain", "zstd"))


@SETTINGS
@given(st.lists(blobs, max_size=200))
def test_binary_roundtrip_any(values):
    check(pa.array(values, type=pa.binary()),
          ("str_plain", "str_zstd", "str_dict", "str_fsst"))


@SETTINGS
@given(st.lists(i64, max_size=300), st.integers(min_value=0, max_value=2))
def test_timestamp_units_roundtrip(values, unit_idx):
    unit = ["ms", "us", "ns"][unit_idx]
    # clamp to the unit's representable range
    vals = [v % (2**62) - 2**61 for v in values]
    arr = pa.array(vals, type=pa.timestamp(unit))
    check(arr, ("bitpack", "delta", "rle", "plain", "zstd"))


@SETTINGS
@given(st.lists(st.one_of(st.none(), st.booleans()), max_size=300))
def test_bool_roundtrip_any(values):
    check(pa.array(values, type=pa.bool_()), ("bitpack", "rle", "plain"))
