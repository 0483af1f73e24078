"""Measured stage split of one production many-LUT WoPBS (VERDICT r3 #3).

Times each pipeline stage of a round-shaped WoPBS (B bytes, the fused
3-LUT S-box stack) separately on the TPU, plus the fused whole: extract
bits (big->small keyswitch), CBS blind rotates, CBS packing/NTT staging,
vertical packing.  Stage outputs feed the next stage so shapes and values
are the real ones.

Usage: python scripts/tpu_wopbs_split.py [bytes [prod|tpu]]
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
    n_bytes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from tfhe_aes_tpu.params import PARAM_OPT, PARAM_TPU
    from tfhe_aes_tpu.utils import serialization, profiling
    from tfhe_aes_tpu.client.client import Client
    from tfhe_aes_tpu.models import fhe_aes
    from tfhe_aes_tpu.ops import wopbs, cbs, vertical_packing

    p = PARAM_TPU if (len(sys.argv) > 2 and sys.argv[2] == "tpu") \
        else PARAM_OPT
    sk, dkeys = serialization.load_keys(serialization.cache_path(p, 0))
    client = Client(p, seed=0)
    client.sk = sk
    dkeys = jax.device_put(dkeys)
    jax.block_until_ready(jax.tree_util.tree_leaves(dkeys))

    rng = np.random.default_rng(9)
    byts = rng.integers(0, 256, n_bytes)
    cts = jnp.asarray(np.stack([client.encrypt_byte(int(b)) for b in byts]))
    lut = jnp.asarray(fhe_aes._fwd_luts(p))       # 3 fused S-box LUTs, L=24

    def timed(label, fn, *args):
        # keys go through as jit ARGUMENTS — closure capture would embed
        # ~1 GB of constants and blow the remote-compile request limit
        # (HTTP 413; same trap as scripts/tpu_probe.py documents).
        f = jax.jit(fn)
        out = profiling.device_fence(f(dkeys, *args))    # compile + warm
        t0 = time.time()
        profiling.device_fence(f(dkeys, *args))
        dt = time.time() - t0
        print(f"{label:42s} {dt*1e3:9.1f} ms", flush=True)
        return out, dt

    print(f"# {p.name}, {n_bytes} bytes ({n_bytes * 8} bits), L=24 outputs",
          flush=True)
    small, t_ks = timed("extract bits (keyswitch)",
                        lambda k, c: wopbs.extract_bits(k, c), cts)
    flat = small.reshape(n_bytes * 8, -1)
    bigs, t_pbs = timed("CBS blind rotates (PBS)",
                        lambda k, f_: cbs.cbs_pbs_levels(k, f_), flat)
    ggsw, t_st = timed("CBS packing KS + NTT staging",
                       lambda k, b: cbs.cbs_stage_ggsw(k, b), bigs)

    def vp(k, g):
        gg = g.reshape((g.shape[0], n_bytes, 8) + g.shape[2:])
        return vertical_packing.vertical_packing(
            k, jnp.moveaxis(gg, 2, 0), lut)
    _, t_vp = timed("vertical packing (8 CMux + extract)", vp, ggsw)
    _, t_all = timed("whole many_wopbs (fused, chunked tail)",
                     lambda k, c: wopbs.many_wopbs(k, c, lut), cts)
    tot = t_ks + t_pbs + t_st + t_vp
    print(f"# stage sum {tot*1e3:.1f} ms vs fused {t_all*1e3:.1f} ms; "
          f"rotate share {t_pbs/tot*100:.0f}%", flush=True)


if __name__ == "__main__":
    main()
