"""Column-chunk envelope: pa.Array ⇄ (codec, params, payload), bit-exactly.

This is the engine's analogue of the reference's OSMArrowBuilder +
Parquet page layer (reference src/osm_arrow.rs:98-265, src/sink.rs:124-143):
it owns null bitmaps, logical→physical type mapping, and payload framing,
and delegates the value stream to a codec kernel.

Payload container (pack_sections):
  [0] serialized single-field arrow schema  (restores the exact type)
  [1] validity bitmap, LSB bit-packed       (empty when null_count == 0)
  [2] codec payload

Value representations handed to kernels:
  int-kind    int64 numpy view (wrap-exact for uint64), nulls → 0
  float-kind  IEEE bit view as int64/int32 (NaN payloads survive)
  str-kind    (int64 lengths, flat bytes), nulls → length 0
  other       arrow IPC stream (any nested type), nulls intact
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import intcodecs as ic
from . import strcodecs as sc
from .primitives import (
    pack_sections,
    params_from_bytes,
    params_to_bytes,
    unpack_sections,
)

INT_CODECS = ("bitpack", "delta", "rle", "dictint", "plain", "zstd")
FLOAT_CODECS = ("alp", "xorf", "rle", "dictint", "plain", "zstd")
STR_CODECS = ("str_dict", "str_fsst", "str_zstd", "str_plain", "plain", "zstd")
OTHER_CODECS = ("plain", "zstd")


def classify(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "bool"
    if (
        pa.types.is_integer(t)
        or pa.types.is_date(t)
        or pa.types.is_time(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_duration(t)
    ):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        return "str"
    return "other"


def codecs_for(kind: str) -> tuple[str, ...]:
    if kind in ("int", "bool"):
        return INT_CODECS
    if kind == "float":
        return FLOAT_CODECS
    if kind == "str":
        return STR_CODECS
    return OTHER_CODECS


_NP_FIXED = {
    pa.int8(): np.int8, pa.int16(): np.int16, pa.int32(): np.int32,
    pa.int64(): np.int64, pa.uint8(): np.uint8, pa.uint16(): np.uint16,
    pa.uint32(): np.uint32, pa.uint64(): np.uint64,
    pa.float32(): np.float32, pa.float64(): np.float64,
    pa.date32(): np.int32, pa.date64(): np.int64,
}


def _np_dtype(t: pa.DataType):
    if t in _NP_FIXED:
        return _NP_FIXED[t]
    if pa.types.is_timestamp(t) or pa.types.is_duration(t) or pa.types.is_time64(t):
        return np.int64
    if pa.types.is_time32(t):
        return np.int32
    raise TypeError(f"no fixed-width numpy dtype for {t}")


def _schema_bytes(t: pa.DataType) -> bytes:
    return pa.schema([pa.field("c", t)]).serialize().to_pybytes()


def _schema_type(b: bytes) -> pa.DataType:
    return pa.ipc.read_schema(pa.py_buffer(b)).field(0).type


def _validity(arr: pa.Array) -> tuple[bytes, int]:
    nulls = arr.null_count
    if nulls == 0:
        return b"", 0
    valid = ~arr.is_null().to_numpy(zero_copy_only=False)
    return np.packbits(valid, bitorder="little").tobytes(), int(nulls)


def _validity_buffer(vbytes: bytes, n: int, nulls: int):
    if nulls == 0:
        return None, None
    return pa.py_buffer(vbytes), None


def _int_view(arr: pa.Array, kind: str) -> np.ndarray:
    """int64 view of any fixed-width column, nulls → 0, bit-exact."""
    t = arr.type
    if kind == "bool":
        vals = arr.fill_null(False).to_numpy(zero_copy_only=False)
        return vals.astype(np.int64)
    if kind == "float":
        dt = _np_dtype(t)
        vals = _fixed_values(arr, dt)
        if dt == np.float64:
            return vals.view(np.int64)
        return vals.view(np.int32).astype(np.int64)
    dt = _np_dtype(t)
    vals = _fixed_values(arr, dt)
    if dt in (np.uint64,):
        return vals.view(np.int64)
    return vals.astype(np.int64)


def _fixed_values(arr: pa.Array, dt) -> np.ndarray:
    """Raw value buffer of a fixed-width array (nulls as-stored → zeroed)."""
    buf = arr.buffers()[1]
    vals = np.frombuffer(buf, dtype=dt)[arr.offset : arr.offset + len(arr)]
    if arr.null_count:
        vals = vals.copy()
        vals[arr.is_null().to_numpy(zero_copy_only=False)] = 0
    return vals


def _restore_fixed(t: pa.DataType, kind: str, iv: np.ndarray, vbuf, n: int) -> pa.Array:
    if kind == "bool":
        bits = np.packbits(iv.astype(bool), bitorder="little").tobytes()
        return pa.Array.from_buffers(pa.bool_(), n, [vbuf, pa.py_buffer(bits)])
    dt = _np_dtype(t)
    if kind == "float":
        if dt == np.float64:
            vals = iv.view(np.float64)
        else:
            vals = iv.astype(np.int32).view(np.float32)
    elif dt == np.uint64:
        vals = iv.view(np.uint64)
    else:
        vals = iv.astype(dt)
    return pa.Array.from_buffers(
        t, n, [vbuf, pa.py_buffer(np.ascontiguousarray(vals).tobytes())]
    )


def _str_views(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    t = arr.type
    big = pa.types.is_large_string(t) or pa.types.is_large_binary(t)
    odt = np.int64 if big else np.int32
    if arr.null_count:
        fill = b"" if pa.types.is_binary(t) or pa.types.is_large_binary(t) else ""
        arr = arr.fill_null(fill)
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data_buf = arr.buffers()[2]
    if data_buf is None:
        return np.zeros(len(arr), dtype=np.int64), b""
    data = np.frombuffer(data_buf, dtype=np.uint8)[offs[0] : offs[-1]].tobytes()
    return np.diff(offs).astype(np.int64), data


def _restore_str(t: pa.DataType, lens: np.ndarray, data: bytes, vbuf, n: int) -> pa.Array:
    big = pa.types.is_large_string(t) or pa.types.is_large_binary(t)
    odt = np.int64 if big else np.int32
    offs = np.concatenate(([0], np.cumsum(lens, dtype=np.int64))).astype(odt)
    return pa.Array.from_buffers(
        t, n, [vbuf, pa.py_buffer(offs.tobytes()), pa.py_buffer(data)]
    )


def _ipc_bytes(arr: pa.Array) -> bytes:
    sink = pa.BufferOutputStream()
    batch = pa.record_batch([arr], names=["c"])
    with pa.ipc.new_stream(sink, batch.schema) as w:
        w.write_batch(batch)
    return sink.getvalue().to_pybytes()


def _ipc_array(b: bytes) -> pa.Array:
    with pa.ipc.open_stream(pa.py_buffer(b)) as r:
        return r.read_all().column(0).combine_chunks()


def _alp_encode_view(iv):
    """ALP over the float64 bit view the envelope hands float kernels.
    On float32 columns the view is garbage floats, so everything lands
    in the bit-exact patch list — still a correct round-trip, just one
    the selector never picks."""
    from . import alp as _alp

    return _alp.alp_encode(iv.view(np.float64))


def _alp_decode_view(params, payload):
    from . import alp as _alp

    return _alp.alp_decode(params, payload)


def _xor_encode_view(iv):
    from . import xor as _xor

    return _xor.xor_encode(iv)


def _xor_decode_view(params, payload):
    from . import xor as _xor

    return _xor.xor_decode(params, payload)


_INT_KERNELS = {
    "alp": (_alp_encode_view, _alp_decode_view),
    "xorf": (_xor_encode_view, _xor_decode_view),
    "bitpack": (ic.bitpack_encode, ic.bitpack_decode),
    "delta": (ic.delta_encode, ic.delta_decode),
    "rle": (ic.rle_encode, ic.rle_decode),
    "dictint": (ic.dict_int_encode, ic.dict_int_decode),
}
_STR_KERNELS = {
    "str_plain": (sc.str_plain_encode, sc.str_plain_decode),
    "str_zstd": (sc.str_zstd_encode, sc.str_zstd_decode),
    "str_dict": (sc.str_dict_encode, sc.str_dict_decode),
    "str_fsst": (sc.str_fsst_encode, sc.str_fsst_decode),
}


def encode_array(
    arr: pa.Array, codec: str | None = None, zstd_level: int = 3
) -> tuple[str, bytes, bytes]:
    """Encode one column chunk. codec=None → auto-select (selector.py).

    zstd_level mirrors the reference's --compression knob
    (src/util.rs:35-37); it reaches every zstd-backed payload.
    """
    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 0:
            arr = pa.array([], type=arr.type)
        elif arr.num_chunks == 1:
            arr = arr.chunk(0)
        else:
            arr = pa.concat_arrays(arr.chunks)
    kind = classify(arr.type)
    if codec is None:
        from .selector import choose_codec

        codec = choose_codec(arr, kind)
    n = len(arr)

    if codec == "plain":
        payload = pack_sections([b"", b"", _ipc_bytes(arr)])
        return codec, params_to_bytes({"n": n}), payload
    if codec == "zstd":
        raw = _ipc_bytes(arr)
        payload = pack_sections([b"", b"", sc.zstd_compress(raw, zstd_level)])
        return codec, params_to_bytes({"n": n, "raw": len(raw)}), payload

    vbytes, nulls = _validity(arr)
    if kind in ("int", "bool", "float"):
        enc, _ = _INT_KERNELS[codec]
        p, blob = enc(_int_view(arr, kind))
    elif kind == "str":
        enc, _ = _STR_KERNELS[codec]
        lens, data = _str_views(arr)
        if codec in ("str_zstd", "str_dict"):
            p, blob = enc(lens, data, zstd_level)
        else:
            p, blob = enc(lens, data)
    else:
        raise ValueError(f"codec {codec} unsupported for kind {kind}")
    params = {"n": n, "nulls": nulls, "p": p}
    payload = pack_sections([_schema_bytes(arr.type), vbytes, blob])
    return codec, params_to_bytes(params), payload


def decode_array(codec: str, params_bytes: bytes, payload: bytes) -> pa.Array:
    params = params_from_bytes(params_bytes)
    schema_b, vbytes, blob = unpack_sections(payload)
    if codec == "plain":
        return _ipc_array(blob)
    if codec == "zstd":
        return _ipc_array(sc.zstd_decompress(blob, params["raw"]))

    n, nulls = params["n"], params["nulls"]
    t = _schema_type(schema_b)
    kind = classify(t)
    vbuf, _ = _validity_buffer(vbytes, n, nulls)
    if kind in ("int", "bool", "float"):
        _, dec = _INT_KERNELS[codec]
        iv = dec(params["p"], blob)
        return _restore_fixed(t, kind, iv, vbuf, n)
    if kind == "str":
        _, dec = _STR_KERNELS[codec]
        lens, data = dec(params["p"], blob)
        return _restore_str(t, lens, data, vbuf, n)
    raise ValueError(f"codec {codec} unsupported for kind {kind}")
