"""Minimal timing of the fused Pallas blind rotate at production params.

Usage: python scripts/tpu_time_rotate.py [batch [tb [prod|tpu]]]
Prints full-rotate wall time (honest fence) and checks bit-exactness vs
the XLA reference path on a strided slice.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    if len(sys.argv) > 2:
        os.environ["TFHE_AES_TPU_PALLAS_TB"] = sys.argv[2]
    from tfhe_aes_tpu.params import PARAM_OPT, PARAM_TPU
    from tfhe_aes_tpu.utils import serialization, profiling
    from tfhe_aes_tpu.backend import numpy_backend as nb
    from tfhe_aes_tpu.ops import pallas_blind_rotate as pbr

    p = PARAM_TPU if (len(sys.argv) > 3 and sys.argv[3] == "tpu") \
        else PARAM_OPT
    cache = serialization.cache_path(p, 0)
    sk, dkeys = serialization.load_keys(cache)
    dkeys = jax.device_put(dkeys)

    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, batch).astype(np.uint64)
    small = jnp.asarray(nb.lwe_encrypt(sk.lwe_key, bits << np.uint64(63),
                                       p.lwe_noise_std, rng))
    test = np.zeros((p.glwe_dimension + 1, p.polynomial_size), np.uint64)
    test[-1, :] = np.uint64(1) << np.uint64(60)
    test = jnp.asarray(test)

    fn = jax.jit(lambda k, s, t: pbr.blind_rotate_pallas(
        k.rplan, p, k.bsk_limbs, s, t, k.fwd_full, k.inv_crt_full,
        k.rot_table))
    out = fn(dkeys, small, test)
    profiling.device_fence(out)          # compile + warm
    times = []
    for _ in range(3):
        t0 = time.time()
        profiling.device_fence(fn(dkeys, small, test))
        times.append(time.time() - t0)
    dt = min(times)
    print(f"rotate batch={batch} tb={os.environ.get('TFHE_AES_TPU_PALLAS_TB', '128')}: "
          f"{dt*1e3:.1f} ms  ({dt/p.lwe_dimension*1e6:.1f} us/step)  "
          f"runs={['%.1f' % (t*1e3) for t in times]}", flush=True)

    # bit-exactness spot check vs the XLA (non-Pallas) path on a strided
    # slice spanning multiple batch tiles (ADVICE r3: first-16-rows only
    # would miss a tile-boundary bug beyond the first tb block)
    from tfhe_aes_tpu.ops import blind_rotate as br
    rows = sorted({0, 1, batch // 4, batch // 2, 3 * batch // 4, batch - 1})
    sl = small[np.array(rows)]
    os.environ["TFHE_AES_TPU_BLIND_ROTATE"] = "xla"
    ref = jax.jit(lambda k, s, t: br.blind_rotate(
        k.rplan, p, k.bsk_limbs, s, t, k.rfwd_limbs, k.fwd_full,
        k.rinv_crt_limbs, k.inv_crt_full, k.rot_table))(dkeys, sl, test)
    got = np.asarray(out)[np.array(rows)]
    assert np.array_equal(np.asarray(ref), got), "MISMATCH vs XLA path"
    print(f"bit-exact vs XLA path on rows {rows}: OK", flush=True)


if __name__ == "__main__":
    main()
