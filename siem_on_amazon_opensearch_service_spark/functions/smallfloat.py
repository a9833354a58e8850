"""Lucene-compatible lossy 1-byte doc-length norms (SmallFloat).

The reference stores BM25 document lengths the way Lucene does: each doc's
token count is quantized to one byte with ``SmallFloat.intToByte4`` and
decoded at query time with ``byte4ToInt`` (public Lucene semantics; the
reference never overrides ``similarity`` in any index template —
/root/reference/source/lambda/deploy_es/data.ini, absence verified).

Encoding (public Lucene ``SmallFloat`` semantics):
- values 0..23 are stored verbatim ("free" values);
- larger values v are stored as 24 + int4(v - 24) where int4 keeps a 3-bit
  mantissa with an implicit leading bit plus a shift (4 significant bits).

We precompute the full 256-entry decode table once; everything downstream
(engine and oracle alike) uses these exact integers, so engine/oracle score
equality is bit-exact.
"""

from __future__ import annotations

import numpy as np

_NUM_FREE_VALUES = 24  # 255 - longToInt4(Integer.MAX_VALUE) = 255 - 231


def _long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError("negative length")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit leading bit
    encoded |= (shift + 1) << 3
    return encoded


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


def int_to_byte4(i: int) -> int:
    """Lucene SmallFloat.intToByte4: doc length -> unsigned norm byte."""
    if i < 0:
        raise ValueError("length must be >= 0")
    if i < _NUM_FREE_VALUES:
        return i
    return _NUM_FREE_VALUES + _long_to_int4(i - _NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Lucene SmallFloat.byte4ToInt: unsigned norm byte -> decoded length."""
    if b < _NUM_FREE_VALUES:
        return b
    return _NUM_FREE_VALUES + _int4_to_long(b - _NUM_FREE_VALUES)


#: decode table: LENGTH_TABLE[norm_byte] = decoded doc length (Lucene's
#: BM25Similarity builds the same 256-entry table at class-init).
LENGTH_TABLE: np.ndarray = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)


def _build_encode_lut(max_len: int) -> np.ndarray:
    """Dense lookup length -> norm byte for lengths <= max_len (vectorized)."""
    lut = np.empty(max_len + 1, dtype=np.uint8)
    b = 0
    for length in range(max_len + 1):
        # norm bytes are monotone in length; advance while the next byte's
        # decoded value is still <= length
        while b < 255 and LENGTH_TABLE[b + 1] <= length:
            b += 1
        lut[length] = b
    return lut


_ENCODE_LUT_MAX = 1 << 20
_ENCODE_LUT = _build_encode_lut(_ENCODE_LUT_MAX)


def encode_lengths(lengths: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over an int array of doc lengths."""
    lengths = np.asarray(lengths, dtype=np.int64)
    out = np.empty(lengths.shape, dtype=np.uint8)
    small = lengths <= _ENCODE_LUT_MAX
    out[small] = _ENCODE_LUT[lengths[small]]
    if not small.all():
        big = np.nonzero(~small)[0]
        for idx in big:
            out[idx] = int_to_byte4(int(lengths[idx]))
    return out


def decode_norms(norm_bytes: np.ndarray) -> np.ndarray:
    """Vectorized byte4ToInt over an array of norm bytes."""
    return LENGTH_TABLE[np.asarray(norm_bytes, dtype=np.uint8)]


def sql_decode_case(col: str) -> str:
    """ANSI-SQL expression decoding a *doc length* through the lossy norm
    round-trip byte4ToInt(intToByte4(len)) — used to build DuckDB oracles.

    Emitted as a searched CASE over the (sorted) decode breakpoints; exact
    for lengths < 2**20.
    """
    # breakpoints: for byte b, lengths in [LENGTH_TABLE[b], LENGTH_TABLE[b+1])
    # decode to LENGTH_TABLE[b].
    parts = []
    for b in range(255, -1, -1):
        lo = int(LENGTH_TABLE[b])
        parts.append(f"WHEN {col} >= {lo} THEN {lo}")
    return "CASE " + " ".join(parts) + " ELSE 0 END"
