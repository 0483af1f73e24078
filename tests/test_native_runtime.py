"""Native C++ host runtime vs numpy references."""

import numpy as np

from tfhe_aes_tpu import runtime
from tfhe_aes_tpu.utils import crt, torus
from tfhe_aes_tpu.ops import modular

RNG = np.random.default_rng(77)


def test_native_builds():
    assert runtime.get_lib() is not None, "g++ build of native runtime failed"


def test_signed_limbs_native():
    v = RNG.integers(0, 1 << 64, size=4096, dtype=np.uint64)
    want = torus.signed_limbs(v, 8).astype(np.int8)
    got = runtime.signed_limbs(v, 8)
    assert np.array_equal(got, want)


def test_balanced_residues_native():
    v = RNG.integers(0, 1 << 64, size=4096, dtype=np.uint64)
    for p in crt.ntt_primes()[:2]:
        got = runtime.balanced_residues(v, p)
        limbs = torus.signed_limbs(v, 8)
        want = torus.recompose_limbs_mod(limbs, 8, p)
        assert np.array_equal(got % p, want)
        assert np.abs(got).max() <= p // 2


def test_ntt_rows_native():
    p = crt.ntt_primes()[0]
    rows = RNG.integers(-(p // 2), p // 2 + 1, size=(7, 512)).astype(np.int32)
    mat, _ = crt.ntt_matrices(p, 512)
    got = runtime.ntt_rows_mod(rows, mat.astype(np.int32), p)
    want = crt.ntt_fwd_host(rows.astype(np.int64), p)
    assert np.array_equal(got % p, want)
