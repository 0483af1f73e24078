"""Roofline study of the fused Pallas blind-rotate kernel.

Times blind_rotate at production parameters on the TPU, then re-times with
individual kernel stages stubbed out via the production kernel's
measurement-only env hook (TFHE_AES_TPU_KERNEL_SKIP — read at kernel-build
time inside pallas_blind_rotate._kernel, so this script clears the build
cache between configurations instead of maintaining a drifting copy of the
kernel).  Attribution is DCE-caveated: stubbing a stage lets Mosaic
dead-code-eliminate its exclusive producers/consumers.

Round-5 finding this harness produced (PERF.md): with merged prime planes
the kernel is ADDITIVE across units — the external-product MAC (~45% of
the step, VPU lane-bound) and the forward digit-NTT dot (~43%, MXU at the
v5e's int8 peak) do not overlap; Mosaic executes the big op regions
in-order.

Usage: python scripts/tpu_kernel_ablate.py [batch [tb ...]] [--params tpu]
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


def time_rotate(dkeys, params, small, test, label):
    from tfhe_aes_tpu.ops import pallas_blind_rotate as pbr
    from tfhe_aes_tpu.utils import profiling
    pbr._build_call.cache_clear()
    fn = jax.jit(lambda k, s, t: pbr.blind_rotate_pallas(
        k.rplan, params, k.bsk_limbs, s, t, k.fwd_full, k.inv_crt_full,
        k.rot_table))
    profiling.device_fence(fn(dkeys, small, test))  # compile+warm
    times = []
    for _ in range(3):
        t0 = time.time()
        profiling.device_fence(fn(dkeys, small, test))
        times.append(time.time() - t0)
    dt = min(times)
    n_steps = params.lwe_dimension
    print(f"{label:28s} {dt*1e3:9.1f} ms  ({dt/n_steps*1e6:7.1f} us/step)",
          flush=True)
    return dt


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(argv[0]) if argv else 2048
    tbs = [int(a) for a in argv[1:]] or [256]
    pname = "prod" if "prod" in sys.argv[1:] else "tpu"

    from tfhe_aes_tpu.params import PARAM_OPT, PARAM_TPU
    from tfhe_aes_tpu.utils import serialization
    from tfhe_aes_tpu.backend import numpy_backend as nb

    p = PARAM_TPU if pname == "tpu" else PARAM_OPT
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

    base = None
    for tb in tbs:
        os.environ["TFHE_AES_TPU_PALLAS_TB"] = str(tb)
        base = time_rotate(dkeys, p, small, test, f"full (tb={tb})")

    os.environ["TFHE_AES_TPU_PALLAS_TB"] = str(tbs[0])
    for skip, label in [
            ("mac", "MAC 1 row only (+DCE)"),
            ("fwd", "no fwd-NTT dots"),
            ("intt", "no INTT dots"),
            ("crt", "no CRT/alpha tall pass"),
            ("tw", "no twiddle wrap-barrett"),
    ]:
        os.environ["TFHE_AES_TPU_KERNEL_SKIP"] = skip
        try:
            time_rotate(dkeys, p, small, test, label)
        finally:
            os.environ.pop("TFHE_AES_TPU_KERNEL_SKIP", None)
    from tfhe_aes_tpu.ops import pallas_blind_rotate as pbr
    pbr._build_call.cache_clear()
    print(f"# baseline tb={tbs[0]}: {base*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
