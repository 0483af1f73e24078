"""Device-side balanced gadget decomposition (jnp, exact u64)."""

from __future__ import annotations

import jax.numpy as jnp

U64 = jnp.uint64


def gadget_decompose(v: jnp.ndarray, base_log: int, levels: int,
                     q_bits: int = 64) -> jnp.ndarray:
    """2^q_bits-torus [...] -> int32 digits [..., levels] in [-B/2, B/2-1],
    level 0 = MSB.

    Same semantics as utils.torus.gadget_decompose (see there for the carry
    convention); digits for base_log <= 8 fit int8 (cast at the call site).
    When q_bits == base_log*levels (the mod-switched rotate domain) the
    decomposition keeps every bit — EXACT, no rounding term.
    """
    B = 1 << base_log
    shift = q_bits - base_log * levels
    assert shift >= 0
    if shift > 0:
        vbar = (v + (U64(1) << U64(shift - 1))) >> U64(shift)
    else:
        vbar = v
    digits = [None] * levels
    carry = jnp.zeros(v.shape, U64)
    for l in range(levels - 1, -1, -1):
        t = ((vbar >> U64(base_log * (levels - 1 - l))) & U64(B - 1)) + carry
        c = (t >= U64(B // 2)).astype(U64)
        digits[l] = (t.astype(jnp.int64)
                     - (c << U64(base_log)).astype(jnp.int64)).astype(jnp.int32)
        carry = c
    return jnp.stack(digits, axis=-1)


def glwe_digits_flat(glwe_u64: jnp.ndarray, base_log: int,
                     levels: int, q_bits: int = 64) -> jnp.ndarray:
    """Decompose GLWE [..., k+1, N] -> flat rows [..., (k+1)*levels, N].

    Row index r = u * levels + l (component-major) — must match the GGSW row
    layout used by ops.keys.pack_* and the external-product MAC.
    """
    d = gadget_decompose(glwe_u64, base_log, levels, q_bits)  # [...,k+1,N,lev]
    d = jnp.moveaxis(d, -1, -2)                            # [..., k+1, lev, N]
    sh = d.shape
    return d.reshape(sh[:-3] + (sh[-3] * sh[-2], sh[-1]))  # [..., R, N]
