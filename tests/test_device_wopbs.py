"""Device WoPBS pipeline vs golden model, toy params (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_aes_tpu.params import PARAM_TOY, PARAM_TOY_N512, PARAM_TOY_WIDE
from tfhe_aes_tpu.backend import numpy_backend as nb
from tfhe_aes_tpu.client.client import Client
from tfhe_aes_tpu.models import luts, tables
from tfhe_aes_tpu.ops import wopbs, keyswitch, cbs, lwe as lwe_ops
from tfhe_aes_tpu.utils import torus

U64 = np.uint64


@pytest.fixture(scope="module")
def ctx():
    client = Client(PARAM_TOY, seed=3)
    dkeys = client.make_device_keys()
    return client, dkeys


def test_device_keyswitch_matches_semantics(ctx):
    client, dkeys = ctx
    p = client.params
    m = U64(1) << U64(63)
    big = nb.lwe_encrypt(client.sk.big_lwe_key,
                         np.full(4, m, dtype=np.uint64),
                         p.glwe_noise_std, client.rng)
    out = np.asarray(keyswitch.keyswitch(p, jnp.asarray(dkeys.ksk_limbs),
                                         jnp.asarray(big)))
    ph = nb.lwe_phase(client.sk.lwe_key, out)
    assert torus.torus_close(ph, np.full(4, m), 52)


def test_device_pbs_boolean(ctx):
    client, dkeys = ctx
    p = client.params
    bits = np.array([0, 1, 1, 0], dtype=np.uint64)
    small = nb.lwe_encrypt(client.sk.lwe_key, bits << U64(63),
                           p.lwe_noise_std, client.rng)
    out = np.asarray(cbs.pbs_boolean(dkeys, jnp.asarray(small), 60))
    ph = nb.lwe_phase(client.sk.big_lwe_key, out)
    assert torus.torus_close(ph, bits << U64(60), 54)


def test_device_pfpksk_all(ctx):
    client, dkeys = ctx
    p = client.params
    m = U64(1) << U64(60)
    big = nb.lwe_encrypt(client.sk.big_lwe_key,
                         np.full(2, m, dtype=np.uint64),
                         p.glwe_noise_std, client.rng)
    out = np.asarray(cbs.pfpksk_apply_all(dkeys, jnp.asarray(big)))
    for u in range(p.glwe_dimension + 1):
        ph = nb.glwe_phase(client.sk.glwe_key, out[:, u])
        if u < p.glwe_dimension:
            want = (U64(0) - client.sk.glwe_key[u]) * m
        else:
            want = np.zeros(p.polynomial_size, dtype=np.uint64)
            want[0] = m
        assert torus.torus_close(ph, np.broadcast_to(want, ph.shape), 54), u


@pytest.mark.parametrize(
    "params",
    [PARAM_TOY, PARAM_TOY_WIDE,
     pytest.param(PARAM_TOY_N512, marks=pytest.mark.slow)],
    ids=["N128-tree", "N128-wide-digits", "N512-flat"])
def test_device_many_wopbs_sbox(params):
    """Full byte pipeline: extract -> CBS -> VP of {SBOX, mul2oSBOX} LUTs."""
    client = Client(params, seed=5)
    dkeys = client.make_device_keys()
    sbox = tables.sbox()
    mul2_sbox = tables.gf_mul_table(2)[sbox]
    lut = luts.lut_polys_from_tables(params, np.stack([sbox, mul2_sbox]), 8)

    test_bytes = [0x00, 0x53, 0xff]
    byte_cts = np.stack([client.encrypt_byte(b) for b in test_bytes])

    fn = jax.jit(lambda x: wopbs.many_wopbs(dkeys, x, jnp.asarray(lut)))
    out = np.asarray(fn(jnp.asarray(byte_cts)))   # [B, 16, big+1]
    for bi, byte in enumerate(test_bytes):
        got_s = sum(int(client.decrypt_bits(out[bi, ob])) << ob
                    for ob in range(8))
        got_m2 = sum(int(client.decrypt_bits(out[bi, 8 + ob])) << ob
                     for ob in range(8))
        assert got_s == int(sbox[byte]), f"sbox({byte:#x})"
        assert got_m2 == int(mul2_sbox[byte]), f"mul2(sbox)({byte:#x})"


def test_many_wopbs_chunked_matches_unchunked(ctx):
    """The lax.map byte-chunked VP tail is bit-identical to the monolithic
    path, for both shared and per-batch LUT stacks (the round-4 batch-
    ceiling fix: many_wopbs chunks its packing/VP working set)."""
    client, dkeys = ctx
    p = client.params
    sbox = tables.sbox()
    lut = jnp.asarray(luts.lut_polys_from_tables(p, sbox[None], 8))
    byte_cts = jnp.asarray(np.stack(
        [client.encrypt_byte(b) for b in (0x00, 0x53, 0xff, 0x1c)]))

    full = np.asarray(wopbs.many_wopbs(dkeys, byte_cts, lut, vp_chunk=4))
    chunked = np.asarray(wopbs.many_wopbs(dkeys, byte_cts, lut, vp_chunk=2))
    assert np.array_equal(full, chunked)

    per_batch = jnp.asarray(np.broadcast_to(
        np.asarray(lut), (4,) + lut.shape[1:]).copy())
    chunked_pb = np.asarray(
        wopbs.many_wopbs(dkeys, byte_cts, per_batch, vp_chunk=2))
    assert np.array_equal(full, chunked_pb)

    # RAGGED batch (3 bytes, chunk 2 -> zero-padded to 2x2): the round-5
    # balanced-chunk policy must slice the pad off bit-exactly, for both
    # shared and per-batch LUT stacks.
    full3 = np.asarray(wopbs.many_wopbs(dkeys, byte_cts[:3], lut,
                                        vp_chunk=4))
    ragged = np.asarray(wopbs.many_wopbs(dkeys, byte_cts[:3], lut,
                                         vp_chunk=2))
    assert np.array_equal(full3, ragged)
    ragged_pb = np.asarray(
        wopbs.many_wopbs(dkeys, byte_cts[:3], per_batch[:3], vp_chunk=2))
    assert np.array_equal(full3, ragged_pb)


@pytest.mark.slow
def test_fast_keygen_pipeline():
    """Device-accelerated keygen produces working evaluation keys."""
    from tfhe_aes_tpu.client import keygen_fast
    from tfhe_aes_tpu.backend import numpy_backend as nb
    client = Client(PARAM_TOY, seed=9)
    dkeys = keygen_fast.make_device_keys_fast(client.sk, client.rng)
    sbox = tables.sbox()
    lut = luts.lut_polys_from_tables(PARAM_TOY, sbox[None], 8)
    byte_cts = np.stack([client.encrypt_byte(0xA7)])
    out = np.asarray(wopbs.many_wopbs(dkeys, jnp.asarray(byte_cts),
                                      jnp.asarray(lut)))
    got = sum(int(client.decrypt_bits(out[0, ob])) << ob for ob in range(8))
    assert got == int(sbox[0xA7])
