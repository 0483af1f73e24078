"""Profile batched PBS at large batch + memory analysis of aes_encrypt."""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def summarize(trace_dir, min_pct=0.5):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace found")
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    pid_names = {e.get("pid"): str(e.get("args", {}).get("name", ""))
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    agg = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e["dur"]
    # drop the top-level wrappers (jit_..., while) which double-count
    drop = [n for n in agg if n.startswith("jit_") or n.startswith("while")]
    for n in drop:
        agg.pop(n)
    tot = sum(agg.values())
    print(f"total device op time: {tot/1e6:.3f}s over {len(agg)} op names")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1]):
        if 100 * dur / max(tot, 1) < min_pct:
            break
        print(f"{dur/1e6:9.4f}s  {100*dur/max(tot,1):5.1f}%  {name[:90]}")


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    from tfhe_aes_tpu.params import PARAM_OPT
    from tfhe_aes_tpu.client.client import Client
    from tfhe_aes_tpu.utils import serialization
    from tfhe_aes_tpu.ops import keyswitch, cbs
    from tfhe_aes_tpu.models import fhe_aes

    cache = serialization.cache_path(PARAM_OPT, 0)
    sk, dkeys = serialization.load_keys(cache)
    client = Client(PARAM_OPT, seed=0)
    client.sk = sk

    # memory analysis of aes_encrypt at B=16 (the faulting config) — no run
    B = 16
    rks_shape = jax.ShapeDtypeStruct((11, 16, 8, PARAM_OPT.big_lwe_dimension + 1),
                                     jnp.uint64)
    st_shape = jax.ShapeDtypeStruct((B, 16, 8, PARAM_OPT.big_lwe_dimension + 1),
                                    jnp.uint64)
    try:
        comp = jax.jit(fhe_aes.aes_encrypt).lower(
            dkeys, rks_shape, st_shape).compile()
        ma = comp.memory_analysis()
        print(f"aes_encrypt B={B} memory: args={ma.argument_size_in_bytes/2**30:.2f}GiB "
              f"out={ma.output_size_in_bytes/2**30:.2f}GiB "
              f"temp={ma.temp_size_in_bytes/2**30:.2f}GiB "
              f"total={(ma.argument_size_in_bytes+ma.output_size_in_bytes+ma.temp_size_in_bytes)/2**30:.2f}GiB",
              flush=True)
    except Exception as e:
        print(f"memory analysis failed: {e}", flush=True)

    dkeys = jax.device_put(dkeys)
    flat = jnp.zeros((bits, PARAM_OPT.lwe_dimension + 1), jnp.uint64)
    flat = flat.at[:, -1].set(jnp.uint64(1) << jnp.uint64(62))
    pbs = jax.jit(lambda k, c: cbs.pbs_boolean(
        k, c, 64 - PARAM_OPT.cbs_base_log))
    out = jax.block_until_ready(pbs(dkeys, flat))
    t0 = time.time()
    out = jax.block_until_ready(pbs(dkeys, flat))
    t = time.time() - t0
    print(f"pbs x{bits}: {t:.3f}s -> {bits/t:.0f} PBS/s", flush=True)

    os.makedirs("/tmp/pbs_trace2", exist_ok=True)
    with jax.profiler.trace("/tmp/pbs_trace2"):
        out = jax.block_until_ready(pbs(dkeys, flat))
    summarize("/tmp/pbs_trace2")
    return 0


if __name__ == "__main__":
    sys.exit(main())
