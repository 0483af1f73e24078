"""Map profiled fusion names to source lines via compiled HLO metadata."""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    names = sys.argv[2:] or ["compare_select_fusion.57", "fusion.301",
                             "fusion.300", "fusion.309", "fusion.310",
                             "copy.289", "copy.288", "copy.248",
                             "subtract_convert_fusion.15", "copy.280",
                             "fusion.303", "fusion.293"]
    from tfhe_aes_tpu.params import PARAM_OPT
    from tfhe_aes_tpu.utils import serialization
    from tfhe_aes_tpu.ops import cbs

    cache = serialization.cache_path(PARAM_OPT, 0)
    sk, dkeys = serialization.load_keys(cache)
    flat = jax.ShapeDtypeStruct((bits, PARAM_OPT.lwe_dimension + 1),
                                jnp.uint64)
    pbs = jax.jit(lambda k, c: cbs.pbs_boolean(
        k, c, 64 - PARAM_OPT.cbs_base_log))
    txt = pbs.lower(dkeys, flat).compile().as_text()
    with open("/tmp/pbs1024_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO: {len(txt)} chars", flush=True)
    for name in names:
        m = re.search(rf"^\s*%?{re.escape(name)} = (.*)$", txt, re.M)
        if not m:
            print(f"--- {name}: NOT FOUND")
            continue
        line = m.group(1)
        shape = line.split(" fusion(")[0].split(" copy(")[0].split(" = ")[-1]
        meta = re.search(r'op_name="([^"]*)"', line)
        src = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', line)
        print(f"--- {name}:")
        print(f"    shape: {line.split('(')[0][:120]}")
        print(f"    op:    {meta.group(1)[:160] if meta else '?'}")
        print(f"    src:   {src.group(1)}:{src.group(2)}" if src else "    src: ?")
    return 0


if __name__ == "__main__":
    sys.exit(main())
