"""Minimal: compile+run ONLY the batched PBS (Pallas path) on the TPU."""
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
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from tfhe_aes_tpu.params import PARAM_OPT
    from tfhe_aes_tpu.client.client import Client
    from tfhe_aes_tpu.utils import serialization
    from tfhe_aes_tpu.backend import numpy_backend as nb
    from tfhe_aes_tpu.ops import cbs
    from tfhe_aes_tpu.utils import torus

    cache = serialization.cache_path(PARAM_OPT, 0)
    sk, dkeys = serialization.load_keys(cache)
    client = Client(PARAM_OPT, seed=0)
    client.sk = sk
    dkeys = jax.device_put(dkeys)

    rng = np.random.default_rng(3)
    bitvals = rng.integers(0, 2, bits).astype(np.uint64)
    small = nb.lwe_encrypt(client.sk.lwe_key, bitvals << np.uint64(63),
                           PARAM_OPT.lwe_noise_std, client.rng)
    flat = jnp.asarray(small)

    pbs = jax.jit(lambda k, c: cbs.pbs_boolean(k, c, 60))
    t0 = time.time()
    out = pbs(dkeys, flat)
    np.asarray(jax.device_get(out.ravel()[0]))
    print(f"compile+run: {time.time()-t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.time()
        out = pbs(dkeys, flat)
        np.asarray(jax.device_get(out.ravel()[0]))
        t = time.time() - t0
        print(f"pbs x{bits}: {t:.3f}s -> {bits/t:.0f} PBS/s", flush=True)

    vals = np.asarray(jax.device_get(out))
    ph = nb.lwe_phase(client.sk.big_lwe_key, vals)
    ok = torus.torus_close(ph, bitvals << np.uint64(60), 54)
    print(f"decrypt check: {'OK' if ok else 'FAIL'}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
