"""Cross-chip negacyclic NTT: the four-step MXU plan distributed over a
mesh axis (SURVEY hard part #5; reference scaling axis rq/mod.rs:878-886,
default params to N=16384 at parameters.rs:236-249).

The single-device four-step plan (tpufhe.ops.ntt_mxu) computes

    out = M2-contract( T * M1-contract(X) )        (forward)

on the lane-folded (n1, n2=128) view of a degree-N polynomial. For
sequence sharding, the sublane axis n1 is sharded over a mesh axis
(`seq`): each device holds a contiguous block of n1/D rows. Of the two
matmuls, only the M1 contraction (over j1 = sublanes) crosses shards; the
twiddle is row-local and the M2 contraction is over lanes. The distributed
M1 contraction is:

  1. local: contract the local j1 block against the FULL output-row range
     of M1 (int8 digit-plane einsum -> int32 planes), fold/Barrett-reduce
     to canonical u64-pair partials P_d[i1, :] < p. Each partial is the
     exact residue of a partial integer sum, so residue addition mod p of
     the D partials is the exact full contraction (bit-exact by CRT).
  2. one all_to_all over `seq`: device d keeps/receives the D partials of
     its own i1 block (split_axis == concat_axis == the block axis), the
     FHE analogue of a sequence-parallel transpose. Comm volume
     (D-1)/D * N * 8 bytes per limb per transform, riding ICI.
  3. local: modular tree-add the D partials, then twiddle + M2 as usual.

The inverse transform mirrors it: the lane contraction (M2b) and twiddle
are local, the M1b contraction runs steps 1-3 at the end.

Everything is exact integer arithmetic; outputs are bit-identical to the
single-device path (tests/test_ntt_dist.py checks N=2048 and N=16384 on
the 8-device CPU mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufhe.ops import zq
from tpufhe.ops.ntt_mxu import (
    MxuNttPlan,
    _extract_planes,
    _fold_reduce,
    _matmul_right,
    _twiddle,
)


def _pairs(a):
    return (a[..., 0, :, :], a[..., 1, :, :])


def _stack(r):
    return jnp.stack([r[0], r[1]], axis=-3)


def _block_matmul_left(planes, mat_block):
    """Partial M1 contraction: local j1 block against all output rows.

    planes: (..., k, A, n1_local, n2) int8 digit planes of the local rows.
    mat_block: (k, A, B, n1_full, n1_local) int8 — M1 columns of this shard.
    Returns (..., k, B, n1_full, n2) int32 partial planes.
    """
    return jnp.einsum(
        "kabij,...kajm->...kbim",
        mat_block,
        planes,
        preferred_element_type=jnp.int32,
    )


def _psum_blocks_mod(partial_u64, plan, axis_name: str, n_shards: int):
    """(..., k, 2, n1_full, n2) canonical partials -> local block sum.

    all_to_all exchanges row blocks so every device holds the D partials
    of its own block, then adds them mod p.
    """
    n1_full = partial_u64.shape[-2]
    blk = n1_full // n_shards
    x = partial_u64.reshape(
        partial_u64.shape[:-2] + (n_shards, blk) + partial_u64.shape[-1:]
    )
    # move the shard-block axis to the front for the collective
    x = jnp.moveaxis(x, -3, 0)  # (D, ..., k, 2, blk, n2)
    x = jax.lax.all_to_all(x, axis_name, split_axis=0, concat_axis=0)
    idx = (...,) + (None,) * 2
    p = (plan.p_pair[0][idx], plan.p_pair[1][idx])
    acc = x[0]
    for d in range(1, n_shards):
        acc = _stack(zq.add_mod(_pairs(acc), _pairs(x[d]), p))
    return acc


def dist_forward_shard(a_local, plan: MxuNttPlan, m1f_block, tf_block,
                       tf_shoup_block, axis_name: str, n_shards: int,
                       lazy: bool = False):
    """Forward NTT on a row-sharded block. For use inside shard_map.

    a_local: (..., k, 2, n1/D, n2). m1f_block/tf_*_block are this shard's
    constant slices (M1 columns j1 for m1f; twiddle rows i1 for tf).
    Output: (..., k, 2, n1/D, n2), same sharding as the input.
    """
    lo, hi = a_local[..., 0, :, :], a_local[..., 1, :, :]
    x = _extract_planes(lo, hi)
    part = _block_matmul_left(x, m1f_block)
    part = _stack(_fold_reduce(part, plan, lazy=False))  # canonical < p
    s1 = _psum_blocks_mod(part, plan, axis_name, n_shards)
    s2 = _twiddle(_pairs(s1), tf_block, tf_shoup_block, plan)
    x = _extract_planes(*s2)
    out = _fold_reduce(_matmul_right(x, plan.m2f), plan, lazy=lazy)
    return jnp.stack(out, axis=-3)


def dist_backward_shard(a_local, plan: MxuNttPlan, m1b_block, tb_block,
                        tb_shoup_block, axis_name: str, n_shards: int):
    """Inverse NTT (with N^{-1} fold) on a row-sharded block."""
    lo, hi = a_local[..., 0, :, :], a_local[..., 1, :, :]
    x = _extract_planes(lo, hi)
    s1 = _fold_reduce(_matmul_right(x, plan.m2b), plan, lazy=True)
    s2 = _twiddle(s1, tb_block, tb_shoup_block, plan)
    x = _extract_planes(*s2)
    part = _block_matmul_left(x, m1b_block)
    part = _stack(_fold_reduce(part, plan, lazy=False))
    return _psum_blocks_mod(part, plan, axis_name, n_shards)


class DistNtt:
    """Jitted distributed forward/backward NTT over a mesh `seq` axis.

    Input/output arrays are (..., k, 2, n1, n2) lane-folded, with the n1
    (sublane) axis sharded over `seq`. Constants are pre-sliced per shard
    and fed as sharded operands, so each device only holds its M1 column
    block and twiddle row block.
    """

    def __init__(self, ctx, mesh: Mesh, seq_axis: str = "seq", n2: int = 128):
        from tpufhe.ops.ntt_mxu import MxuNttPlan

        self.ctx = ctx
        self.mesh = mesh
        self.seq_axis = seq_axis
        self.n_shards = mesh.shape[seq_axis]
        plan = MxuNttPlan.new(list(ctx.ops), n2=n2)
        assert plan.n1 % self.n_shards == 0, (
            f"n1={plan.n1} must divide over {self.n_shards} shards"
        )
        self.plan = plan
        D = self.n_shards
        blk = plan.n1 // D

        # constant slices, leading axis = shard index
        self._m1f = np.stack(
            [plan.m1f[..., :, d * blk : (d + 1) * blk] for d in range(D)]
        )  # (D, k, A, B, n1, blk): columns j1 of this shard
        self._m1b = np.stack(
            [plan.m1b[..., :, d * blk : (d + 1) * blk] for d in range(D)]
        )
        self._tf = np.stack(
            [plan.tf[..., d * blk : (d + 1) * blk, :] for d in range(D)]
        )  # (D, k, 2, blk, n2): twiddle rows i1 of this shard
        self._tfs = np.stack(
            [plan.tf_shoup[..., d * blk : (d + 1) * blk, :] for d in range(D)]
        )
        self._tb = np.stack(
            [plan.tb[..., d * blk : (d + 1) * blk, :] for d in range(D)]
        )
        self._tbs = np.stack(
            [plan.tb_shoup[..., d * blk : (d + 1) * blk, :] for d in range(D)]
        )
        self._fwd = None
        self._bwd = None

    def _specs(self, nlead: int):
        data = P(*((None,) * nlead + (None, None, self.seq_axis, None)))
        const = P(self.seq_axis)
        return data, const

    def _build(self, nlead: int, lazy: bool):
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map

        plan, ax, D = self.plan, self.seq_axis, self.n_shards
        data_spec, const_spec = self._specs(nlead)

        def fwd(a, m1f, tf, tfs):
            return dist_forward_shard(
                a, plan, m1f[0], tf[0], tfs[0], ax, D, lazy=lazy
            )

        def bwd(a, m1b, tb, tbs):
            return dist_backward_shard(a, plan, m1b[0], tb[0], tbs[0], ax, D)

        smap = partial(
            shard_map,
            mesh=self.mesh,
            in_specs=(data_spec, const_spec, const_spec, const_spec),
            out_specs=data_spec,
        )
        return jax.jit(smap(fwd)), jax.jit(smap(bwd))

    def forward(self, a, lazy: bool = False):
        nlead = a.ndim - 4
        key = (nlead, lazy)
        if self._fwd is None or self._fwd[0] != key:
            self._fwd = (key, self._build(nlead, lazy))
        return self._fwd[1][0](a, self._m1f, self._tf, self._tfs)

    def backward(self, a):
        nlead = a.ndim - 4
        if self._bwd is None or self._bwd[0] != nlead:
            self._bwd = (nlead, self._build(nlead, False))
        return self._bwd[1][1](a, self._m1b, self._tb, self._tbs)

    def sharding(self, nlead: int) -> NamedSharding:
        return NamedSharding(self.mesh, self._specs(nlead)[0])
