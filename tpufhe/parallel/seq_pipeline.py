"""Sequence-sharded (degree-sharded) fused pipelines.

For N >= 2^14 (the reference's default-128 table tops out at N=16384,
parameters.rs:236-249) a single ciphertext's coefficient axis is sharded
over a mesh `seq` axis, the FHE analogue of sequence parallelism
(SURVEY hard part #5, section 2.9). The insight that makes the FULL
multiply+relinearize shard this way: every non-NTT stage of the HPS
pipeline — base extension, tensor product, t/q down-scaling, key-switch
Shoup accumulation — is coefficient-local (it mixes RNS limbs, never
coefficients). Only the NTTs communicate, and the distributed four-step
transform (parallel/ntt_dist.py) needs exactly ONE all_to_all each.

So the sequence-sharded pipeline is the single-device step
(pipeline.build_mul_relin_step) run under shard_map with its NTT
implementation swapped for the distributed one; outputs are bit-identical
to the single-device path (tests/test_seq_pipeline.py).

Layout inside shard_map: lane-folded (..., k, 2, n1, 128) arrays with the
n1 (sublane) axis sharded; each device holds n1/D contiguous rows. The
four-step constants are baked replicated (numpy closures) and each shard
dynamic-slices its M1-column/twiddle-row block by `axis_index` — tables
are ~2 MiB/limb, noise against HBM.
"""

from __future__ import annotations

from functools import lru_cache
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufhe.bfv.parameters import BfvParameters
from tpufhe.ops.ntt_mxu import MxuNttPlan
from tpufhe.parallel.ntt_dist import dist_backward_shard, dist_forward_shard
from tpufhe.pipeline import build_mul_relin_step


def _slice_plan(plan: MxuNttPlan, limb_slice):
    """A per-limb-sliced view of the plan (k axis of every limb-led field)."""
    if limb_slice is None:
        return plan
    return SimpleNamespace(
        n=plan.n, n1=plan.n1, n2=plan.n2,
        m1f=plan.m1f[limb_slice], tf=plan.tf[limb_slice],
        tf_shoup=plan.tf_shoup[limb_slice], m2f=plan.m2f[limb_slice],
        m2b=plan.m2b[limb_slice], tb=plan.tb[limb_slice],
        tb_shoup=plan.tb_shoup[limb_slice], m1b=plan.m1b[limb_slice],
        p_pair=tuple(c[limb_slice] for c in plan.p_pair),
        p2_pair=tuple(c[limb_slice] for c in plan.p2_pair),
        barrett_lo=tuple(c[limb_slice] for c in plan.barrett_lo),
        barrett_hi=tuple(c[limb_slice] for c in plan.barrett_hi),
    )


class _SeqNtt:
    """ntt_fwd/ntt_bwd implementation for use INSIDE shard_map.

    Matches the (ctx, x, lazy=..., in_bits=..., limb_slice=...) call
    surface of ops.rq.ntt_forward_any / ntt_backward_any; `in_bits` is
    accepted and ignored (the distributed kernel always uses full-width
    digit planes — a correctness-only knob)."""

    def __init__(self, axis_name: str, n_shards: int):
        self.axis_name = axis_name
        self.n_shards = n_shards
        self._plans = {}

    def plan_for(self, ctx):
        key = id(ctx)
        if key not in self._plans:
            plan = MxuNttPlan.new(list(ctx.ops), n2=128)
            assert plan.n1 % self.n_shards == 0, (
                f"n1={plan.n1} must divide over {self.n_shards} seq shards")
            self._plans[key] = plan
        return self._plans[key]

    def _blocks(self, plan, inverse: bool):
        """This shard's M1-column and twiddle-row constant blocks."""
        d = jax.lax.axis_index(self.axis_name)
        blk = plan.n1 // self.n_shards
        m1 = plan.m1b if inverse else plan.m1f
        tw = plan.tb if inverse else plan.tf
        tws = plan.tb_shoup if inverse else plan.tf_shoup
        m1_block = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(m1), d * blk, blk, axis=-1)
        tw_block = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(tw), d * blk, blk, axis=-2)
        tws_block = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(tws), d * blk, blk, axis=-2)
        return m1_block, tw_block, tws_block

    def fwd(self, ctx, x, lazy: bool = False, in_bits: int = 63,
            limb_slice=None):
        plan = _slice_plan(self.plan_for(ctx), limb_slice)
        m1f, tf, tfs = self._blocks(plan, inverse=False)
        return dist_forward_shard(x, plan, m1f, tf, tfs, self.axis_name,
                                  self.n_shards, lazy=lazy)

    def bwd(self, ctx, x, in_bits: int = 63, limb_slice=None):
        plan = _slice_plan(self.plan_for(ctx), limb_slice)
        m1b, tb, tbs = self._blocks(plan, inverse=True)
        return dist_backward_shard(x, plan, m1b, tb, tbs, self.axis_name,
                                   self.n_shards)


def make_seq_sharded_mul_relin(par: BfvParameters, rk, mesh: Mesh,
                               seq_axis: str = "seq", level: int = 0,
                               batch_axis: str | None = None,
                               strategy2_primes: int | None = None):
    """Multiply+relinearize with the DEGREE axis sharded over `seq`.

    Input/output arrays are lane-folded (B, k, 2, n1, 128) uint32 with n1
    sharded over `seq` (and optionally B over `batch_axis`). All non-NTT
    stages run shard-local; each NTT performs one all_to_all over ICI.
    Bit-identical to pipeline.make_mul_relin.
    """
    try:
        from jax import shard_map
    except ImportError:  # jax < 0.6
        from jax.experimental.shard_map import shard_map

    ctx = par.context_level_at(level).poly_context
    assert not ctx.narrow and ctx.degree % 128 == 0, (
        "sequence sharding targets wide-limb lane-folded contexts")
    n_shards = mesh.shape[seq_axis]
    impl = _SeqNtt(seq_axis, n_shards)

    def const_slice(arr):
        """Full-degree per-coefficient constant -> this shard's row block."""
        d = jax.lax.axis_index(seq_axis)
        blk = arr.shape[-2] // n_shards
        return jax.lax.dynamic_slice_in_dim(
            jnp.asarray(arr), d * blk, blk, axis=-2)

    step = build_mul_relin_step(par, rk, level,
                                ntt_fwd=impl.fwd, ntt_bwd=impl.bwd,
                                const_slice=const_slice,
                                strategy2_primes=strategy2_primes)

    spec = P(batch_axis, None, None, seq_axis, None)
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(spec,) * 4,
        out_specs=(spec, spec),
        check_vma=False,
    )
    sharding = NamedSharding(mesh, spec)

    def run(a0, a1, b0, b1):
        args = [jax.lax.with_sharding_constraint(v, sharding)
                for v in (a0, a1, b0, b1)]
        return sharded(*args)

    return jax.jit(run)
