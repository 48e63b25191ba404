"""Native (C++) sampling core parity vs the pure-Python reference stack.

Every stream is checked byte-for-byte / value-for-value against the Python
implementations with native dispatch disabled, including continuation of a
partially consumed block across mixed call sequences.
"""

import numpy as np
import pytest

from tpufhe import native
from tpufhe.utils import rngs as rngs_mod
from tpufhe.utils import sampling as sampling_mod
from tpufhe.utils.rngs import ChaCha8Rng, ChaChaRng, seed_from_u64

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)


class _PyOnly:
    """Context manager forcing the pure-Python paths."""

    def __enter__(self):
        self._lib = native._lib
        native._lib = None
        self._tried = native._tried
        native._tried = True
        return self

    def __exit__(self, *exc):
        native._lib = self._lib
        native._tried = self._tried


def test_fill_bytes_parity():
    for n in [1, 3, 31, 64, 65, 127, 128, 1000, 4096 + 17]:
        a = ChaCha8Rng(seed_from_u64(7))
        b = ChaCha8Rng(seed_from_u64(7))
        got = a.fill_bytes(n)
        with _PyOnly():
            want = b.fill_bytes(n)
        assert got == want, n
        # continuation after the partial block must also agree
        got2 = a.fill_bytes(100)
        with _PyOnly():
            want2 = b.fill_bytes(100)
        assert got2 == want2, n


def test_uniform_parity():
    for bound in [2, 1153, (1 << 62) - 57, 4611686018326724609]:
        a = ChaCha8Rng(seed_from_u64(11))
        b = ChaCha8Rng(seed_from_u64(11))
        got = rngs_mod.uniform_u64_below(a, bound, 257)
        with _PyOnly():
            want = rngs_mod.uniform_u64_below(b, bound, 257)
        np.testing.assert_array_equal(got, want)
        # stream state continuation
        assert a.next_u64() == b.next_u64()


def test_cbd_parity():
    for variance in [1, 2, 10, 16]:
        a = ChaCha8Rng(seed_from_u64(13))
        b = ChaCha8Rng(seed_from_u64(13))
        got = sampling_mod.sample_vec_cbd(333, variance, a)
        with _PyOnly():
            want = sampling_mod.sample_vec_cbd(333, variance, b)
        np.testing.assert_array_equal(got, want)
        assert a.next_u32() == b.next_u32()


def test_mixed_sequence_parity():
    a = ChaCha8Rng(seed_from_u64(5))
    b = ChaCha8Rng(seed_from_u64(5))

    def drive(r, py):
        out = []
        ctx = _PyOnly() if py else None
        if ctx:
            ctx.__enter__()
        try:
            out.append(r.fill_bytes(32))
            out.append(tuple(rngs_mod.uniform_u64_below(r, 1153, 40)))
            out.append(r.next_u32())
            out.append(tuple(sampling_mod.sample_vec_cbd(33, 10, r)))
            out.append(r.fill_bytes(7))
            out.append(r.next_u64())
        finally:
            if ctx:
                ctx.__exit__()
        return out

    assert drive(a, False) == drive(b, True)


def test_streams_differ_by_seed():
    a = ChaCha8Rng(seed_from_u64(1))
    b = ChaCha8Rng(seed_from_u64(2))
    assert a.fill_bytes(64) != b.fill_bytes(64)
