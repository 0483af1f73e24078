"""Dump optimized HLO of the batched PBS and locate the dominant fusions."""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def main():
    from tfhe_aes_tpu.params import PARAM_OPT
    from tfhe_aes_tpu.utils import serialization
    from tfhe_aes_tpu.ops import cbs

    cache = serialization.cache_path(PARAM_OPT, 0)
    sk, dkeys = serialization.load_keys(cache)

    flat = jnp.zeros((128, PARAM_OPT.lwe_dimension + 1), jnp.uint64)
    pbs = jax.jit(lambda k, c: cbs.pbs_boolean(
        k, c, 64 - PARAM_OPT.cbs_base_log))
    lowered = pbs.lower(dkeys, flat)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/pbs_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO dumped: {len(txt)} chars", flush=True)
    for name in ("fusion.435", "fusion.436"):
        m = re.search(rf"^\s*%?{re.escape(name)} = .*$", txt, re.M)
        print(f"--- {name}:")
        print(m.group(0)[:2000] if m else "not found")
    return 0


if __name__ == "__main__":
    sys.exit(main())
