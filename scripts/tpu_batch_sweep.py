"""Sweep aes_encrypt batch size on the TPU; find the throughput knee."""
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
    sizes = [int(s) for s in (sys.argv[1:] or ["1", "2", "4", "8", "16"])]
    from tfhe_aes_tpu.params import PARAM_OPT
    from tfhe_aes_tpu.client.client import Client
    from tfhe_aes_tpu.utils import serialization
    from tfhe_aes_tpu.models import fhe_aes, aes_plain

    cache = serialization.cache_path(PARAM_OPT, 0)
    sk, dkeys = serialization.load_keys(cache)
    client = Client(PARAM_OPT, seed=0)
    client.sk = sk
    dkeys = jax.device_put(dkeys)

    KEY = 0x2B7E151628AED2A6ABF7158809CF4F3C
    rks_plain = aes_plain.key_expansion(aes_plain.u128_to_bytes_be(KEY))
    rks = jnp.asarray(np.stack(
        [np.stack([client.encrypt_byte(int(b)) for b in rk])
         for rk in rks_plain]))
    pt = 0x00112233445566778899AABBCCDDEEFF
    state1 = jnp.asarray(client.encrypt_u128(pt))[None]
    enc = jax.jit(fhe_aes.aes_encrypt)

    for B in sizes:
        state = jnp.broadcast_to(state1, (B,) + state1.shape[1:])
        t0 = time.time()
        out = enc(dkeys, rks, state)
        jax.block_until_ready(out)
        np.asarray(jax.device_get(out.ravel()[0]))
        print(f"B={B:3d} compile+run: {time.time()-t0:7.1f}s", flush=True)
        for _ in range(2):
            t0 = time.time()
            out = enc(dkeys, rks, state)
            jax.block_until_ready(out)
            np.asarray(jax.device_get(out.ravel()[0]))
            t = time.time() - t0
            print(f"B={B:3d}: {t:6.2f}s  {B*60/t:7.1f} blocks/min  "
                  f"{B*1296/t:6.0f} PBS/s", flush=True)
        got = client.decrypt_state_u128(np.asarray(jax.device_get(out[0])))
        want = aes_plain.bytes_be_to_u128(aes_plain.encrypt_block(
            aes_plain.u128_to_bytes_be(KEY), aes_plain.u128_to_bytes_be(pt)))
        print(f"B={B:3d} decrypt: {'OK' if got == want else 'MISMATCH'}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
