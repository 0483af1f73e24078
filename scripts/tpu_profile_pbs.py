"""Capture a profiler trace of the batched boolean PBS at prod params."""
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


def main():
    from tfhe_aes_tpu.params import PARAM_OPT
    from tfhe_aes_tpu.client.client import Client
    from tfhe_aes_tpu.utils import serialization
    from tfhe_aes_tpu.ops import keyswitch, cbs

    cache = serialization.cache_path(PARAM_OPT, 0)
    sk, dkeys = serialization.load_keys(cache)
    client = Client(PARAM_OPT, seed=0)
    client.sk = sk
    dkeys = jax.device_put(dkeys)

    byte = jnp.asarray(np.stack(
        [client.encrypt_byte(i * 17 % 256) for i in range(16)]))
    ks = jax.jit(lambda k, c: keyswitch.keyswitch(k.params, k.ksk_limbs, c))
    small = jax.block_until_ready(ks(dkeys, byte))
    flat = small.reshape(-1, small.shape[-1])

    pbs = jax.jit(lambda k, c: cbs.pbs_boolean(
        k, c, 64 - PARAM_OPT.cbs_base_log))
    out = jax.block_until_ready(pbs(dkeys, flat))   # compile + warm
    t0 = time.time()
    out = jax.block_until_ready(pbs(dkeys, flat))
    print(f"pbs x128: {time.time()-t0:.3f}s", flush=True)

    os.makedirs("/tmp/pbs_trace", exist_ok=True)
    with jax.profiler.trace("/tmp/pbs_trace"):
        out = jax.block_until_ready(pbs(dkeys, flat))
    print("trace captured", flush=True)

    # Summarize: find trace.json.gz, aggregate op durations on the device.
    files = glob.glob("/tmp/pbs_trace/**/*.trace.json.gz", recursive=True)
    print(files, flush=True)
    if not files:
        return 0
    with gzip.open(sorted(files)[-1], "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # device op events carry 'dur' (us) and names; aggregate by name prefix.
    agg: dict[str, float] = {}
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in str(pname) and "/device" not in str(pname):
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    tot = sum(agg.values())
    print(f"total device op time: {tot/1e6:.3f}s over {len(agg)} op names")
    for name, dur in top:
        print(f"{dur/1e6:9.4f}s  {100*dur/max(tot,1):5.1f}%  {name[:100]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
