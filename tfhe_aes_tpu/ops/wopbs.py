"""Many-LUT WoPBS: the framework's first-class batched LUT-evaluation API.

Reference counterpart: many_wopbs_without_padding (many_wopbs.rs:31-116),
which the reference had to build by forking tfhe-rs internals so one circuit
bootstrap could feed several vertical packings (many_wopbs.rs:28-30).  Here
the split is the natural API:

    extract bits (batched keyswitch)  ->  circuit bootstrap (batched)
    ->  vertical packing over an arbitrary stack of LUT polynomials.

Ciphertext layout: a "byte" is its 8 bit-level big-LWE rows, LSB first
(radix block order, client.rs:126-129); batches lead.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import cbs as cbs_mod
from . import keyswitch, vertical_packing
from .keys import DeviceKeys

U64 = jnp.uint64


def extract_bits(keys: DeviceKeys, byte_bits_big: jnp.ndarray) -> jnp.ndarray:
    """[..., nbits, big+1] u64 -> [..., nbits, n+1] small-LWE bits.

    With 1-bit radix blocks at delta 2^63 this is exactly one keyswitch per
    bit (reference extract_bits_assign degenerates likewise; SURVEY.md 2b).
    """
    return keyswitch.keyswitch(keys.params, keys.ksk_limbs, byte_bits_big)


def circuit_bootstrap_bits(keys: DeviceKeys,
                           bits_small: jnp.ndarray) -> jnp.ndarray:
    """[B, nbits, n+1] -> GGSW NTT stack [nbits, P, B, R2, k+1, N]."""
    Bb, nbits = bits_small.shape[0], bits_small.shape[1]
    flat = bits_small.reshape(Bb * nbits, -1)
    g = cbs_mod.circuit_bootstrap(keys, flat)   # [P, B*nbits, R2, k+1, N]
    P = g.shape[0]
    g = g.reshape((P, Bb, nbits) + g.shape[2:])
    return jnp.moveaxis(g, 2, 0)                # [nbits, P, B, R2, k+1, N]


def many_wopbs(keys: DeviceKeys, byte_bits_big: jnp.ndarray,
               lut_polys_u64: jnp.ndarray) -> jnp.ndarray:
    """Evaluate L LUT output polynomials on a batch of radix "bytes".

    byte_bits_big: [B, nbits, big+1] u64 — nbits 1-bit blocks, LSB first.
    lut_polys_u64: [B or 1, L, C, N]   — per-output LUT polynomials
                   (C > 1 engages the CMux tree when 2^nbits > N).
    Returns [B, L, big+1] u64 — fresh big-LWEs of each output bit, noise
    level NOMINAL (the reference stamps the same, many_wopbs.rs:100-109).
    """
    small = extract_bits(keys, byte_bits_big)
    ggsw = circuit_bootstrap_bits(keys, small)
    return vertical_packing.vertical_packing(keys, ggsw, lut_polys_u64)


# Jitted entry point: compiled once per (key shapes, batch, LUT stack) and
# reused across AES rounds / key-expansion words / CTR ripple steps.  Inlines
# harmlessly when a caller jits a larger region around it.
import jax as _jax  # noqa: E402
many_wopbs_jit = _jax.jit(many_wopbs)
