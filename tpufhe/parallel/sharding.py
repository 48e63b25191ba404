"""Device-mesh sharding helpers and sharded pipeline builders."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufhe.bfv.parameters import BfvParameters
from tpufhe.pipeline import make_mul_relin


def batch_limb_mesh(n_batch: int, n_limb: int, devices=None) -> Mesh:
    """A (batch, limb) mesh. On real pods, lay the limb axis along ICI."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_batch * n_limb, "not enough devices"
    grid = devices[: n_batch * n_limb].reshape(n_batch, n_limb)
    return Mesh(grid, ("batch", "limb"))


def ct_sharding(mesh: Mesh, limb_sharded: bool = True) -> NamedSharding:
    """Sharding for (B, k, 2, N) ciphertext-batch arrays."""
    spec = P("batch", "limb" if limb_sharded else None, None, None, None)
    return NamedSharding(mesh, spec)


def shard_ciphertext(mesh: Mesh, arr, limb_sharded: bool = True):
    return jax.device_put(arr, ct_sharding(mesh, limb_sharded))


def make_sharded_mul_relin(par: BfvParameters, rk, mesh: Mesh, level: int = 0,
                           limb_sharded: bool = True):
    """Multiply+relinearize jitted over a (batch, limb) mesh.

    Inputs are (B, k, 2, N) with B sharded on `batch` and (optionally) k on
    `limb`. GSPMD partitions the elementwise/NTT work per shard and inserts
    the cross-limb collectives needed by base extension and key switching.
    """
    step = make_mul_relin(par, rk, level)
    sharding = ct_sharding(mesh, limb_sharded)

    def sharded(a0, a1, b0, b1):
        args = [jax.lax.with_sharding_constraint(x, sharding)
                for x in (a0, a1, b0, b1)]
        return step(*args)

    return jax.jit(sharded, out_shardings=(sharding, sharding))
