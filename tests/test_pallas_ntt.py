"""Pallas NTT kernel parity vs the XLA-graph NTT (interpret mode on CPU)."""

import numpy as np
import pytest

from tpufhe.ops import ntt as ntt_mod
from tpufhe.ops import rq as rq_mod
from tpufhe.ops.pallas.ntt_kernel import build_limb_scalars, build_stage_tables, ntt_pallas
from tpufhe.ops.rq import Context, pack_u64

RNG = np.random.default_rng(123)

N = 256
MODULI = (4611686018326724609, 1152921504606830593)


def make_inputs(ctx, batch):
    mats = []
    for _ in range(batch):
        mats.append(
            np.stack(
                [RNG.integers(0, m, size=N, dtype=np.uint64) for m in ctx.moduli]
            )
        )
    arr = np.stack([pack_u64(m) for m in mats])  # (B, k, 2, N)
    return arr, mats


@pytest.mark.parametrize("lazy", [False, True])
def test_forward_parity(lazy):
    ctx = Context(MODULI, N)
    batch = 2
    x, mats = make_inputs(ctx, batch)
    tables = ctx.dev.stage_tables(False)
    out = np.asarray(
        ntt_pallas(x, tables, build_limb_scalars(ctx.ops), lazy=lazy,
                   interpret=True)
    )
    want = np.asarray(rq_mod._fwd_fn(ctx, lazy)(x))
    np.testing.assert_array_equal(out, want)


def test_backward_parity():
    ctx = Context(MODULI, N)
    batch = 2
    x, mats = make_inputs(ctx, batch)
    tables = ctx.dev.stage_tables(True)
    # backward expects NTT-domain input < p: forward first via XLA path
    fwd = np.asarray(rq_mod._fwd_fn(ctx, False)(x))
    out = np.asarray(
        ntt_pallas(fwd, tables, build_limb_scalars(ctx.ops), inverse=True,
                   interpret=True)
    )
    np.testing.assert_array_equal(out, x)
