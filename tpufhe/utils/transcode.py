"""Bit-width transcoding of integer vectors (wire format building block).

Behavioral parity with fhe-util/src/lib.rs:60-176: values are packed
little-endian, `nbits` bits each, into bytes (or other bit widths).
"""

from __future__ import annotations

import numpy as np


def transcode_to_bytes(a, nbits: int) -> bytes:
    """Pack each value of `a` into nbits little-endian bits; returns bytes."""
    assert 0 < nbits <= 64
    a = [int(x) for x in a]
    mask = (1 << nbits) - 1
    nbytes = -((-len(a) * nbits) // 8)
    out = bytearray()
    current = 0
    current_nbits = 0
    idx = 0
    while idx < len(a):
        if current_nbits < 8:
            v = a[idx] & mask
            assert a[idx].bit_length() <= nbits
            current |= v << current_nbits
            current_nbits += nbits
            idx += 1
        while current_nbits >= 8:
            out.append(current & 0xFF)
            current >>= 8
            current_nbits -= 8
    if current_nbits > 0:
        assert current_nbits < 8
        assert len(out) == nbytes - 1
        out.append(current & 0xFF)
    else:
        assert len(out) == nbytes
        assert current == 0
    return bytes(out)


def transcode_from_bytes(b: bytes, nbits: int) -> np.ndarray:
    """Unpack bytes into nbits-wide values (uint64 array)."""
    assert 0 < nbits <= 64
    mask = (1 << nbits) - 1
    nelements = -((-len(b) * 8) // nbits)
    out = []
    current = 0
    current_nbits = 0
    idx = 0
    while idx < len(b):
        if current_nbits < nbits:
            current |= b[idx] << current_nbits
            current_nbits += 8
            idx += 1
        while current_nbits >= nbits:
            out.append(current & mask)
            current >>= nbits
            current_nbits -= nbits
    if current_nbits > 0:
        assert len(out) == nelements - 1
        out.append(current)
    else:
        assert len(out) == nelements
        assert current == 0
    return np.array(out, dtype=np.uint64)


def transcode_bidirectional(a, input_nbits: int, output_nbits: int) -> np.ndarray:
    """Repack input_nbits-wide values into output_nbits-wide values."""
    assert 0 < input_nbits <= 64 and 0 < output_nbits <= 64
    a = [int(x) for x in a]
    in_mask = (1 << input_nbits) - 1
    out_mask = (1 << output_nbits) - 1
    output_size = -((-len(a) * input_nbits) // output_nbits)
    out = []
    current = 0
    current_nbits = 0
    idx = 0
    while idx < len(a):
        if current_nbits < output_nbits:
            assert a[idx].bit_length() <= input_nbits
            current |= (a[idx] & in_mask) << current_nbits
            current_nbits += input_nbits
            idx += 1
        while current_nbits >= output_nbits:
            out.append(current & out_mask)
            current >>= output_nbits
            current_nbits -= output_nbits
    if current_nbits > 0:
        assert current_nbits < output_nbits
        assert len(out) == output_size - 1
        out.append(current)
    else:
        assert len(out) == output_size
        assert current == 0
    return np.array(out, dtype=np.uint64)
