"""Fused Pallas blind-rotate kernel vs the XLA fallback — bit-exact.

Both paths implement the same mod-2^q' rotate-domain math on the same key
material (see ops/blind_rotate.py item 3); the Pallas kernel runs here in
interpret mode (CPU).  PARAM_TOY exercises q'=32 (hi accumulator plane
unused), PARAM_TOY_L5 the production-shaped q'=40 two-plane path.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_aes_tpu.params import PARAM_TOY
from tfhe_aes_tpu.backend import numpy_backend as nb
from tfhe_aes_tpu.client.client import Client
from tfhe_aes_tpu.ops import blind_rotate, pallas_blind_rotate
from tfhe_aes_tpu.utils import torus

U64 = np.uint64

# PARAM_TOY has pbs_base_log*pbs_level == 32 (single-plane accumulator).
# This variant exercises the production-shaped q'=40 path (40 digit bits,
# hi-plane extraction) that PARAM_OPT uses.
PARAM_TOY_L5 = dataclasses.replace(PARAM_TOY, name="PARAM_TOY_L5",
                                   pbs_level=5)


@pytest.fixture(scope="module")
def ctx():
    client = Client(PARAM_TOY, seed=11)
    dkeys = client.make_device_keys()
    return client, dkeys


@pytest.fixture(scope="module")
def ctx_l5():
    client = Client(PARAM_TOY_L5, seed=13)
    dkeys = client.make_device_keys()
    return client, dkeys


def _inputs(client, n_batch):
    p = client.params
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, n_batch).astype(np.uint64)
    small = nb.lwe_encrypt(client.sk.lwe_key, bits << U64(63),
                           p.lwe_noise_std, client.rng)
    test = np.zeros((p.glwe_dimension + 1, p.polynomial_size), np.uint64)
    test[-1, :] = U64(1) << U64(60)
    return bits, jnp.asarray(small), jnp.asarray(test)


@pytest.mark.parametrize("n_batch", [1, 3, 8])
def test_pallas_matches_xla(ctx, n_batch):
    client, dkeys = ctx
    p = client.params
    bits, small, test = _inputs(client, n_batch)

    want = jax.jit(blind_rotate.blind_rotate, static_argnums=(0, 1))(
        dkeys.rplan, p, jnp.asarray(dkeys.bsk_limbs), small, test,
        jnp.asarray(dkeys.rfwd_limbs), jnp.asarray(dkeys.fwd_full),
        jnp.asarray(dkeys.rinv_crt_limbs), jnp.asarray(dkeys.inv_crt_full),
        jnp.asarray(dkeys.rot_table))
    got = pallas_blind_rotate.blind_rotate_pallas(
        dkeys.rplan, p, jnp.asarray(dkeys.bsk_limbs), small, test,
        jnp.asarray(dkeys.fwd_full), jnp.asarray(dkeys.inv_crt_full),
        jnp.asarray(dkeys.rot_table), interpret=True)

    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_matches_xla_q40(ctx_l5):
    """The q'=40 two-plane decompose branch (production PARAM_OPT shape)."""
    client, dkeys = ctx_l5
    p = client.params
    bits, small, test = _inputs(client, 3)

    want = jax.jit(blind_rotate.blind_rotate, static_argnums=(0, 1))(
        dkeys.rplan, p, jnp.asarray(dkeys.bsk_limbs), small, test,
        jnp.asarray(dkeys.rfwd_limbs), jnp.asarray(dkeys.fwd_full),
        jnp.asarray(dkeys.rinv_crt_limbs), jnp.asarray(dkeys.inv_crt_full),
        jnp.asarray(dkeys.rot_table))
    got = pallas_blind_rotate.blind_rotate_pallas(
        dkeys.rplan, p, jnp.asarray(dkeys.bsk_limbs), small, test,
        jnp.asarray(dkeys.fwd_full), jnp.asarray(dkeys.inv_crt_full),
        jnp.asarray(dkeys.rot_table), interpret=True)

    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_matches_xla_wide_digits():
    """The WIDE (pbs_base_log > 8, two-int8-limb digit) kernel path that
    PARAM_TPU uses — digits feed the [2N, 2N] block forward-NTT matrix and
    the recombine takes the extra hi-plane barrett."""
    from tfhe_aes_tpu.params import PARAM_TOY_WIDE
    client = Client(PARAM_TOY_WIDE, seed=17)
    dkeys = client.make_device_keys()
    p = client.params
    bits, small, test = _inputs(client, 3)

    want = jax.jit(blind_rotate.blind_rotate, static_argnums=(0, 1))(
        dkeys.rplan, p, jnp.asarray(dkeys.bsk_limbs), small, test,
        jnp.asarray(dkeys.rfwd_limbs), jnp.asarray(dkeys.fwd_full),
        jnp.asarray(dkeys.rinv_crt_limbs), jnp.asarray(dkeys.inv_crt_full),
        jnp.asarray(dkeys.rot_table))
    got = pallas_blind_rotate.blind_rotate_pallas(
        dkeys.rplan, p, jnp.asarray(dkeys.bsk_limbs), small, test,
        jnp.asarray(dkeys.fwd_full), jnp.asarray(dkeys.inv_crt_full),
        jnp.asarray(dkeys.rot_table), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_cache_survives_retrace(ctx, monkeypatch):
    """Regression: round 1's bench-killer (VERDICT.md, What's weak #1).

    _build_call is lru_cached; when its constants were jnp arrays created
    inside the FIRST jit trace, a SECOND distinct jit trace reusing the cache
    hit UnexpectedTracerError.  This mirrors the bench's call pattern
    (aes_key_expansion_jit trace, then ctr_step_jit trace) at minimal cost:
    two distinct jit closures, same _build_call cache key.
    """
    monkeypatch.setenv("TFHE_AES_TPU_BLIND_ROTATE", "interpret")
    from tfhe_aes_tpu.ops import cbs
    client, dkeys = ctx
    p = client.params
    # A fresh cache key (batch size unused elsewhere) + cleared cache, so an
    # earlier eager call in this process can't mask the leak.
    pallas_blind_rotate._build_call.cache_clear()
    bits = np.array([1, 0, 1, 1, 0], dtype=np.uint64)
    small = jnp.asarray(nb.lwe_encrypt(client.sk.lwe_key, bits << U64(63),
                                       p.lwe_noise_std, client.rng))

    out1 = jax.jit(lambda s: cbs.pbs_boolean(dkeys, s, 60))(small)
    # Distinct lambda => distinct trace; pre-fix this raised
    # UnexpectedTracerError from the cached first-trace constants.
    out2 = jax.jit(lambda s: cbs.pbs_boolean(dkeys, s, 60))(small)

    for out in (out1, out2):
        ph = nb.lwe_phase(client.sk.big_lwe_key, np.asarray(out))
        assert torus.torus_close(ph, bits << U64(60), 54)


def test_pallas_vp_matches_xla(ctx, monkeypatch):
    """The fused vertical-packing kernel (ops/pallas_vp.py) must be
    bit-identical to the XLA CMux rotation loop through a REAL WoPBS
    (extract -> CBS -> VP of the S-box LUT), including the tree->kernel
    hand-off at toy N=128 (tree_bits=1, 7 fused rotations)."""
    from tfhe_aes_tpu.models import luts, tables
    from tfhe_aes_tpu.ops import wopbs
    client, dkeys = ctx
    p = client.params
    sbox = tables.sbox()
    lut = jnp.asarray(luts.lut_polys_from_tables(p, sbox[None], 8))
    byte_cts = jnp.asarray(np.stack(
        [client.encrypt_byte(b) for b in (0x5A, 0x01, 0xFF)]))

    monkeypatch.setenv("TFHE_AES_TPU_BLIND_ROTATE", "xla")
    want = np.asarray(wopbs.many_wopbs(dkeys, byte_cts, lut))
    monkeypatch.setenv("TFHE_AES_TPU_BLIND_ROTATE", "interpret")
    got = np.asarray(wopbs.many_wopbs(dkeys, byte_cts, lut))
    np.testing.assert_array_equal(got, want)
    # and it decrypts right
    for bi, b in enumerate((0x5A, 0x01, 0xFF)):
        val = sum(int(client.decrypt_bits(got[bi, ob])) << ob
                  for ob in range(8))
        assert val == int(sbox[b])


def test_pallas_pbs_decrypts(ctx, monkeypatch):
    """pbs_boolean through the interpreted Pallas kernel decrypts right."""
    monkeypatch.setenv("TFHE_AES_TPU_BLIND_ROTATE", "interpret")
    from tfhe_aes_tpu.ops import cbs
    client, dkeys = ctx
    p = client.params
    bits = np.array([0, 1, 1, 0], dtype=np.uint64)
    small = nb.lwe_encrypt(client.sk.lwe_key, bits << U64(63),
                           p.lwe_noise_std, client.rng)
    out = np.asarray(cbs.pbs_boolean(dkeys, jnp.asarray(small), 60))
    ph = nb.lwe_phase(client.sk.big_lwe_key, out)
    assert torus.torus_close(ph, bits << U64(60), 54)
