"""Vectorized varbyte (VByte) codec for posting lists.

Posting lists store docID *gaps* (delta encoding) and term frequencies as
VByte: 7 data bits per byte, MSB set = continuation.  Both directions are
numpy-vectorized (O(max_width) array passes, no per-value Python loop) so
they can run inside Arrow-batched pandas UDFs on executors.

Reference context: the reference repo delegates posting-list compression to
Lucene entirely; this is our from-scratch equivalent of that delegated
layer (SURVEY.md §2.12).
"""

from __future__ import annotations

import numpy as np


def encoded_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value VByte byte count (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    x = v >> np.uint64(7)
    while x.any():
        nbytes[x > 0] += 1
        x >>= np.uint64(7)
    return nbytes


def encode(values: np.ndarray, lengths: np.ndarray | None = None) -> bytes:
    """VByte-encode a non-negative int array -> bytes.  Pass precomputed
    ``encoded_lengths(values)`` to avoid a second width pass when the
    caller also needs the lengths (the shard encoder does)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = encoded_lengths(v) if lengths is None else lengths
    offs = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.empty(int(offs[-1]), dtype=np.uint8)
    cur = v.copy()
    starts = offs[:-1]
    max_w = int(nbytes.max())
    for k in range(max_w):
        m = nbytes > k
        byte = (cur[m] & np.uint64(0x7F)).astype(np.uint8)
        more = (nbytes[m] > k + 1).astype(np.uint8) << 7
        out[starts[m] + k] = byte | more
        cur >>= np.uint64(7)
    return out.tobytes()


def decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a VByte buffer -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    vals = np.zeros(ends.shape, dtype=np.uint64)
    for k in range(int(lengths.max())):
        m = lengths > k
        vals[m] |= (b[starts[m] + k] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(7 * k)
    return vals


def delta_encode(sorted_values: np.ndarray, first_base: int = 0) -> bytes:
    """Encode a strictly-increasing array as VByte gaps (first gap relative
    to ``first_base``)."""
    v = np.asarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return b""
    gaps = np.empty_like(v)
    gaps[0] = v[0] - np.uint64(first_base)
    np.subtract(v[1:], v[:-1], out=gaps[1:])
    return encode(gaps)


def delta_decode(buf: bytes, first_base: int = 0) -> np.ndarray:
    gaps = decode(buf)
    if gaps.size == 0:
        return gaps
    out = np.cumsum(gaps, dtype=np.uint64)
    if first_base:
        out += np.uint64(first_base)
    return out
