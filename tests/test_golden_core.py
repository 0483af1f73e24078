"""Unit tests for the numpy golden backend (exact torus math, toy params)."""

import numpy as np
import pytest

from tfhe_aes_tpu.params import PARAM_TOY
from tfhe_aes_tpu.utils import crt, torus
from tfhe_aes_tpu.backend import numpy_backend as nb

U64 = np.uint64
RNG = np.random.default_rng(1234)


def test_gadget_decompose_roundtrip():
    v = RNG.integers(0, 1 << 64, size=4096, dtype=np.uint64)
    for base_log, levels in [(8, 5), (2, 6), (12, 3), (15, 1), (10, 2)]:
        d = torus.gadget_decompose(v, base_log, levels)
        assert d.min() >= -(1 << (base_log - 1))
        assert d.max() <= (1 << (base_log - 1)) - 1
        rec = torus.gadget_recompose(d, base_log, levels)
        err = (rec - v).astype(np.int64)
        bound = 1 << (63 - base_log * levels)
        assert np.abs(err).max() <= bound, (base_log, levels)


def test_signed_limbs_roundtrip():
    v = RNG.integers(0, 1 << 64, size=2048, dtype=np.uint64)
    limbs = torus.signed_limbs(v, 8)
    assert limbs.min() >= -128 and limbs.max() <= 127
    acc = np.zeros_like(v)
    for i in range(8):
        acc = acc + (limbs[..., i].astype(np.uint64) << U64(8 * i))
    assert np.array_equal(acc, v)


def test_ntt_roundtrip_and_convolution():
    primes = crt.ntt_primes()
    assert all((p - 1) % 1024 == 0 for p in primes)
    n = 128
    a = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)
    b = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)
    want = nb.negacyclic_mul_u64(a, b)

    # CRT-NTT product of (small digits) x (torus values) — the kernel's case.
    digits = RNG.integers(-128, 128, size=n).astype(np.int64)
    want_d = nb.negacyclic_mul_u64(digits.astype(np.uint64), b)
    residues = []
    for p in primes:
        ah = crt.ntt_fwd_host(digits, p)
        # roundtrip check
        assert np.array_equal(crt.ntt_inv_host(ah, p), digits % p)
        bh = crt.ntt_fwd_host(b.astype(np.int64) % p, p)
        ch = (ah * bh) % p
        residues.append(crt.ntt_inv_host(ch, p))
    res = np.stack(residues, axis=-1)
    got = crt.crt_reconstruct_u64_host(res, primes)
    assert np.array_equal(got, want_d)

    # sanity: schoolbook conv agrees with itself under operand swap
    assert np.array_equal(want, nb.negacyclic_mul_u64(b, a))


def test_negacyclic_mul_binary_matches_schoolbook():
    n = 128
    a = RNG.integers(0, 1 << 64, size=(5, n), dtype=np.uint64)
    s = RNG.integers(0, 2, size=n, dtype=np.uint64)
    want = np.stack([nb.negacyclic_mul_u64(a[i], s) for i in range(5)])
    got = nb.negacyclic_mul_binary(a, s)
    assert np.array_equal(got, want)


@pytest.fixture(scope="module")
def keys():
    rng = np.random.default_rng(7)
    sk = nb.gen_secret_keys(PARAM_TOY, rng)
    return sk, rng


def test_lwe_roundtrip(keys):
    sk, rng = keys
    bits = np.array([0, 1, 1, 0, 1], dtype=np.uint64)
    ct = nb.lwe_encrypt(sk.lwe_key, bits << U64(63), PARAM_TOY.lwe_noise_std,
                        rng)
    assert np.array_equal(nb.lwe_decrypt_bit(sk.lwe_key, ct), bits)


def test_glwe_roundtrip(keys):
    sk, rng = keys
    n = PARAM_TOY.polynomial_size
    m = (RNG.integers(0, 2, size=n, dtype=np.uint64)) << U64(63)
    ct = nb.glwe_encrypt(sk.glwe_key, m, PARAM_TOY.glwe_noise_std, rng)
    ph = nb.glwe_phase(sk.glwe_key, ct)
    assert torus.torus_close(ph, m, 50)


def test_external_product_and_cmux(keys):
    sk, rng = keys
    p = PARAM_TOY
    n = p.polynomial_size
    v = (RNG.integers(0, 2, size=n, dtype=np.uint64)) << U64(62)
    glwe = nb.glwe_encrypt(sk.glwe_key, v, p.glwe_noise_std, rng)
    for m in (0, 1):
        ggsw = nb.ggsw_encrypt(sk.glwe_key, m, p.pbs_base_log, p.pbs_level,
                               p.glwe_noise_std, rng)
        out = nb.external_product(ggsw, glwe, p.pbs_base_log, p.pbs_level)
        ph = nb.glwe_phase(sk.glwe_key, out)
        assert torus.torus_close(ph, v * U64(m), 55), f"m={m}"

    v0 = np.zeros(n, dtype=np.uint64); v0[0] = U64(1) << U64(62)
    v1 = np.zeros(n, dtype=np.uint64); v1[1] = U64(1) << U64(62)
    c0 = nb.glwe_encrypt(sk.glwe_key, v0, p.glwe_noise_std, rng)
    c1 = nb.glwe_encrypt(sk.glwe_key, v1, p.glwe_noise_std, rng)
    for b in (0, 1):
        g = nb.ggsw_encrypt(sk.glwe_key, b, p.pbs_base_log, p.pbs_level,
                            p.glwe_noise_std, rng)
        sel = nb.cmux(g, c0, c1, p.pbs_base_log, p.pbs_level)
        ph = nb.glwe_phase(sk.glwe_key, sel)
        assert torus.torus_close(ph, v1 if b else v0, 55)


def test_pbs_boolean(keys):
    sk, rng = keys
    p = PARAM_TOY
    bsk = nb.bsk_gen(sk, rng)
    for bit in (0, 1):
        ct = nb.lwe_encrypt(sk.lwe_key, U64(bit) << U64(63),
                            p.lwe_noise_std, rng)
        out = nb.pbs_boolean(bsk, ct, p, 60)
        ph = nb.lwe_phase(sk.big_lwe_key, out)
        want = U64(bit) << U64(60)
        assert torus.torus_close(ph, want, 54), f"bit={bit}"


def test_keyswitch(keys):
    sk, rng = keys
    p = PARAM_TOY
    ksk = nb.ksk_gen(sk, rng)
    m = U64(1) << U64(63)
    big_ct = nb.lwe_encrypt(sk.big_lwe_key, m, p.glwe_noise_std, rng)
    small = nb.keyswitch(ksk, big_ct, p.ks_base_log, p.ks_level)
    assert small.shape[-1] == p.lwe_dimension + 1
    ph = nb.lwe_phase(sk.lwe_key, small)
    assert torus.torus_close(ph, m, 52)


def test_pfpksk(keys):
    sk, rng = keys
    p = PARAM_TOY
    pfpksk = nb.pfpksk_gen(sk, rng)
    m = U64(1) << U64(60)
    ct = nb.lwe_encrypt(sk.big_lwe_key, m, p.glwe_noise_std, rng)
    for u in range(p.glwe_dimension + 1):
        out = nb.pfpksk_apply(pfpksk[u], ct, p.pfks_base_log, p.pfks_level)
        ph = nb.glwe_phase(sk.glwe_key, out)
        if u < p.glwe_dimension:
            want = (U64(0) - sk.glwe_key[u]) * m  # -S_u * m
        else:
            want = np.zeros(p.polynomial_size, dtype=np.uint64)
            want[0] = m
        assert torus.torus_close(ph, want, 54), f"u={u}"


def test_cbs_and_vertical_packing(keys):
    sk, rng = keys
    p = PARAM_TOY
    bsk = nb.bsk_gen(sk, rng)
    pfpksk = nb.pfpksk_gen(sk, rng)
    ksk = nb.ksk_gen(sk, rng)

    # CBS-produced GGSW must act as a correct selector in CMux.
    value = 0b1011  # 4-bit LUT test
    nbits = 4
    ggsw_bits = []
    for j in range(nbits):
        bit = (value >> j) & 1
        big = nb.lwe_encrypt(sk.big_lwe_key, U64(bit) << U64(63),
                             p.glwe_noise_std, rng)
        small = nb.extract_bit_keyswitch(ksk, big, p)
        ggsw_bits.append(nb.circuit_bootstrap_bit(bsk, pfpksk, small, p))

    lut_vals = RNG.integers(0, 2, size=1 << nbits, dtype=np.uint64)
    lut_poly = np.zeros(p.polynomial_size, dtype=np.uint64)
    lut_poly[: 1 << nbits] = lut_vals << U64(63)
    out = nb.vertical_packing(lut_poly, ggsw_bits, p)
    got = nb.lwe_decrypt_bit(sk.big_lwe_key, out)
    assert got == lut_vals[value]
