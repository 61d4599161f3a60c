"""From-scratch RIFF/WAVE PCM codec — the audio leg of the multimodal
column family (images: PNG/GIF/JPEG in png/gif/jpeg siblings).

PCM needs no entropy coder, so unlike JPEG's Huffman layer the whole
decode path is implementable for real: a spec-complete RIFF chunk walk
(unknown chunks like LIST/INFO skipped with their pad byte, exactly as
the container requires), fmt validation (format tag 1 = integer PCM,
8- or 16-bit), and a zero-copy numpy view of the data chunk. The
encoder twin writes both sample widths, optional junk chunks, and the
odd-size pad byte so the walk's corners are round-trip-tested.

No reference counterpart (the reference is an OSM transcoder with no
audio surface); this serves the training-data mandate's multimodal
row: audio as an opaque binary column + real decode / feature
extraction where feasible.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "decode_wav", "parse_wav_header"]


def encode_wav(
    samples: np.ndarray,
    sample_rate: int,
    junk_chunk: bytes | None = None,
) -> bytes:
    """(n_frames, channels) int16 (PCM16) or uint8 (PCM8) → a
    spec-valid RIFF/WAVE file. `junk_chunk` optionally inserts a LIST
    chunk with that body between fmt and data (metadata real encoders
    emit — exercises the decoder's unknown-chunk skip)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError("samples must be (n_frames, channels)")
    n, ch = s.shape
    if s.dtype == np.int16:
        bits = 16
        data = s.astype("<i2").tobytes()
    elif s.dtype == np.uint8:
        bits = 8
        data = s.tobytes()
    else:
        raise ValueError("PCM samples must be int16 or uint8")
    block = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if junk_chunk is not None:
        body += b"LIST" + struct.pack("<I", len(junk_chunk)) + junk_chunk
        if len(junk_chunk) % 2:
            body += b"\x00"  # RIFF: odd chunks carry a pad byte
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _walk_chunks(payload: bytes):
    """Yield (chunk_id, body_offset, body_size) over a RIFF body,
    honoring the pad byte after odd-sized chunks."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if payload[8:12] != b"WAVE":
        raise ValueError("RIFF file is not WAVE")
    end = 8 + riff_size
    if end > len(payload):
        # the header promises more bytes than exist: a partially
        # downloaded file must not decode silently (X6 fail-fast)
        raise ValueError("RIFF size exceeds the file — truncated WAV")
    pos = 12
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"chunk {cid!r} overruns the RIFF size — corrupt WAV"
            )
        yield cid, body, size
        pos = body + size + (size & 1)  # pad byte after odd chunks


def parse_wav_header(payload: bytes):
    """(channels, sample_rate, bits, n_frames) or None when the
    payload is not a PCM WAVE file — the metadata-extraction twin of
    parse_image_header (no sample decode, header bytes only)."""
    try:
        fmt = data_size = None
        for cid, off, size in _walk_chunks(payload):
            if cid == b"fmt " and fmt is None:
                if size < 16:
                    return None
                fmt = struct.unpack_from("<HHIIHH", payload, off)
            elif cid == b"data" and data_size is None:
                data_size = size
            if fmt is not None and data_size is not None:
                break
        if fmt is None or data_size is None:
            return None
        tag, ch, rate, _, block, bits = fmt
        if tag != 1 or bits not in (8, 16) or ch < 1:
            return None
        if block != ch * bits // 8:
            return None
        return ch, rate, bits, data_size // block
    except ValueError:
        return None


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL PCM decode: full chunk walk (unknown chunks skipped per
    the container spec), fmt validation, then one numpy view of the
    data chunk → ((n_frames, channels) int16/uint8, sample_rate).
    Fail-fast on anything non-PCM or inconsistent (X6 discipline)."""
    fmt = None
    data = None
    for cid, off, size in _walk_chunks(payload):
        if cid == b"fmt ":
            if fmt is not None:
                raise ValueError("duplicate fmt chunk — corrupt WAV")
            if size < 16:
                raise ValueError("fmt chunk too small — corrupt WAV")
            fmt = struct.unpack_from("<HHIIHH", payload, off)
        elif cid == b"data":
            if data is not None:
                raise ValueError("duplicate data chunk — corrupt WAV")
            data = payload[off:off + size]
        # LIST/INFO/fact/…: skipped — spec requires readers to ignore
        # chunks they don't know
    if fmt is None:
        raise ValueError("WAV has no fmt chunk")
    if data is None:
        raise ValueError("WAV has no data chunk")
    tag, ch, rate, byte_rate, block, bits = fmt
    if tag != 1:
        raise ValueError(f"compression format {tag} is not PCM")
    if bits not in (8, 16):
        raise ValueError(f"{bits}-bit PCM not supported (8/16 only)")
    if ch < 1 or block != ch * bits // 8:
        raise ValueError("inconsistent fmt block alignment — corrupt WAV")
    if len(data) % block:
        raise ValueError("data chunk is not frame-aligned — corrupt WAV")
    if bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.int16)
    else:
        arr = np.frombuffer(data, dtype=np.uint8)
    return arr.reshape(-1, ch), rate
