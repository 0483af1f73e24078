"""Device-mesh utilities: sharded FHE-AES CTR over JAX meshes.

Parallelism model (SURVEY.md 2c): the reference's only axis is rayon threads
over CTR blocks (main.rs:55-64).  TPU-natively that becomes:

  * 'dp'  — CTR blocks, pure data parallel (no collectives);
  * 'mp'  — optional second axis over the 16 state bytes: each round's
    WoPBS is byte-independent, and MixColumns' cross-byte sums make XLA
    insert the all-gathers automatically under GSPMD.

Evaluation keys are replicated to every device (read-only, ~1.2 GB at
production parameters) — the all_gather-at-init pattern; no collective rides
the hot loop in the dp-only configuration.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import fhe_aes
from ..ops.keys import DeviceKeys


def make_mesh(n_dp: int | None = None, n_mp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_dp = n_dp or (len(devices) // n_mp)
    dev = np.asarray(devices[: n_dp * n_mp]).reshape(n_dp, n_mp)
    return Mesh(dev, axis_names=("dp", "mp"))


def shard_keys(mesh: Mesh, keys: DeviceKeys) -> DeviceKeys:
    """Replicate evaluation keys onto every device of the mesh."""
    rep = NamedSharding(mesh, P())
    arrays, treedef = jax.tree_util.tree_flatten(keys)
    return jax.tree_util.tree_unflatten(
        treedef, [jax.device_put(a, rep) for a in arrays])


def sharded_ctr_fn(mesh: Mesh, keys: DeviceKeys, n_blocks: int,
                   shard_bytes: bool = False):
    """Build a jitted CTR keystream fn with the batch axis sharded over 'dp'
    (and optionally the byte axis over 'mp').

    Returns fn(round_keys, enc_iv, lut_lsb, luts_rest)
      -> [n_blocks, 16, 8, big+1]
    where the LUT stacks come from fhe_aes.add_scalar_luts (per-block
    counter tables, sharded along 'dp' with the batch).
    """
    byte_spec = "mp" if shard_bytes else None
    state_spec = P("dp", byte_spec)
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("dp"))
    dp1 = NamedSharding(mesh, P(None, "dp"))

    def run(round_keys, enc_iv, lut_lsb, luts_rest):
        state = jax.numpy.broadcast_to(enc_iv[None],
                                       (n_blocks,) + enc_iv.shape)
        state = jax.lax.with_sharding_constraint(
            state, NamedSharding(mesh, state_spec))
        state = fhe_aes.add_scalar_device(keys, state, lut_lsb, luts_rest)
        return fhe_aes.aes_encrypt(keys, round_keys, state)

    return jax.jit(
        run,
        in_shardings=(rep, rep, dp, dp1),
        out_shardings=NamedSharding(mesh, state_spec),
    )
