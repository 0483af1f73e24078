"""Device-side LWE/GLWE structural ops: rotations, extraction, modswitch.

These are the "free" ops of the scheme (no key material): leveled additions
(the reference's unchecked_add XOR, server.rs:278-282), negacyclic monomial
rotations, sample extraction and the 2N modulus switch feeding blind rotation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U64 = jnp.uint64


def modswitch(ct_u64: jnp.ndarray, two_n: int) -> jnp.ndarray:
    """Round torus values to Z_2N: round(x * 2N / 2^64) -> int32 [0, 2N)."""
    shift = 64 - int(np.log2(two_n))
    t = (ct_u64 + (U64(1) << U64(shift - 1))) >> U64(shift)
    return (t & U64(two_n - 1)).astype(jnp.int32)


def neg_rotate(polys: jnp.ndarray, amounts: jnp.ndarray) -> jnp.ndarray:
    """Multiply polys[..., N] by X^amounts (negacyclic), amounts int32 mod 2N.

    amounts broadcasts against polys' leading axes (one rotation per batch
    element).  Gather from the doubled [poly, -poly] table.
    """
    n = polys.shape[-1]
    ext = jnp.concatenate([polys, U64(0) - polys], axis=-1)  # [..., 2N]
    j = jnp.arange(n, dtype=jnp.int32)
    idx = (j - amounts[..., None]) % (2 * n)                 # [..., N]
    idx = jnp.broadcast_to(idx, polys.shape[:-1] + (n,))
    return jnp.take_along_axis(ext, idx.astype(jnp.int32), axis=-1)


def neg_rotate_const(polys: jnp.ndarray, amount: int) -> jnp.ndarray:
    """Static negacyclic rotation by `amount` (pure roll + sign, no gather)."""
    n = polys.shape[-1]
    amount = amount % (2 * n)
    ext = jnp.concatenate([polys, U64(0) - polys], axis=-1)
    return jnp.roll(ext, amount, axis=-1)[..., :n]


def sample_extract0(glwe: jnp.ndarray) -> jnp.ndarray:
    """GLWE [..., k+1, N] -> big-LWE [..., k*N+1] of coefficient 0."""
    kp1, n = glwe.shape[-2], glwe.shape[-1]
    k = kp1 - 1
    masks = glwe[..., :k, :]
    j = np.arange(n)
    idx = (-j) % n
    sign = np.where(j == 0, 1, -1).astype(np.int64).astype(np.uint64)
    a = masks[..., idx] * jnp.asarray(sign)
    a = a.reshape(glwe.shape[:-2] + (k * n,))
    b = glwe[..., k, 0]
    return jnp.concatenate([a, b[..., None]], axis=-1)


def lwe_trivial(m: jnp.ndarray, n: int) -> jnp.ndarray:
    z = jnp.zeros(m.shape + (n,), U64)
    return jnp.concatenate([z, m[..., None].astype(U64)], axis=-1)
