"""Probe the attached TPU: sync semantics + prod-param kernel sanity.

Escalates through the kernel stack at production parameters, timing each
stage with BOTH block_until_ready and a 1-element device_get (to expose
async-dispatch misreporting through the device tunnel), and verifying
decryptions on the way.  Keys are always passed as jit ARGUMENTS — closure
capture would embed ~1.2 GB as constants and blow the remote-compile
request limit (HTTP 413).
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


def sync_time(fn, label):
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    t_block = time.time() - t0
    t0 = time.time()
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))
    t_fetch = time.time() - t0
    print(f"{label}: block={t_block:.3f}s fetch={t_fetch:.3f}s", flush=True)
    return out, t_block + t_fetch


def main():
    stop_at = int(sys.argv[1]) if len(sys.argv) > 1 else 99
    print(f"device: {jax.devices()[0]}", flush=True)

    from tfhe_aes_tpu.params import PARAM_OPT
    from tfhe_aes_tpu.client.client import Client
    from tfhe_aes_tpu.utils import serialization
    from tfhe_aes_tpu.ops import wopbs, keyswitch, cbs
    from tfhe_aes_tpu.models import fhe_aes, aes_plain, tables

    cache = serialization.cache_path(PARAM_OPT, 0)
    sk, dkeys = serialization.load_keys(cache)
    client = Client(PARAM_OPT, seed=0)
    client.sk = sk
    t0 = time.time()
    dkeys = jax.device_put(dkeys)
    jax.block_until_ready(jax.tree_util.tree_leaves(dkeys))
    print(f"keys staged in {time.time()-t0:.1f}s", flush=True)

    byte = np.stack([client.encrypt_byte(i * 17 % 256) for i in range(16)])
    byte = jnp.asarray(byte)                       # [16, 8, big+1]

    # --- keyswitch ----------------------------------------------------------
    ks = jax.jit(lambda k, c: keyswitch.keyswitch(k.params, k.ksk_limbs, c))
    small, _ = sync_time(lambda: ks(dkeys, byte), "keyswitch x128 (compile)")
    small, _ = sync_time(lambda: ks(dkeys, byte), "keyswitch x128")
    if stop_at <= 1:
        return 0

    # --- boolean PBS x128 ---------------------------------------------------
    flat = small.reshape(-1, small.shape[-1])      # [128, n+1]
    pbs = jax.jit(lambda k, c: cbs.pbs_boolean(
        k, c, 64 - PARAM_OPT.cbs_base_log))
    big, _ = sync_time(lambda: pbs(dkeys, flat), "pbs x128 (compile)")
    for _ in range(2):
        big, t = sync_time(lambda: pbs(dkeys, flat), "pbs x128")
        print(f"  -> {128 / t:.0f} PBS/s", flush=True)
    if stop_at <= 2:
        return 0

    # --- full fused S-box many_wopbs on 16 bytes + decrypt check ------------
    lut = jnp.asarray(fhe_aes._fwd_luts(PARAM_OPT))
    mw = jax.jit(wopbs.many_wopbs)
    out, _ = sync_time(lambda: mw(dkeys, byte, lut), "many_sbox x16 (compile)")
    out, _ = sync_time(lambda: mw(dkeys, byte, lut), "many_sbox x16")
    vals = np.asarray(jax.device_get(out))          # [16, 24, big+1]
    sbox = tables.sbox()
    ok = sum(client.decrypt_byte(vals[i, :8]) == int(sbox[i * 17 % 256])
             for i in range(16))
    print(f"sbox correct: {ok}/16", flush=True)
    if stop_at <= 3:
        return 0

    # --- one full AES block (trivial round keys from the real schedule) -----
    KEY = 0x2B7E151628AED2A6ABF7158809CF4F3C
    rks_plain = aes_plain.key_expansion(aes_plain.u128_to_bytes_be(KEY))
    rks = jnp.asarray(np.stack(
        [np.stack([client.encrypt_byte(int(b)) for b in rk])
         for rk in rks_plain]))                     # [11, 16, 8, big+1]
    pt = 0x00112233445566778899AABBCCDDEEFF
    state = jnp.asarray(client.encrypt_u128(pt))[None]   # [1, 16, 8, big+1]
    enc = jax.jit(fhe_aes.aes_encrypt)
    out, _ = sync_time(lambda: enc(dkeys, rks, state), "aes_encrypt B=1 (compile)")
    out, t = sync_time(lambda: enc(dkeys, rks, state), "aes_encrypt B=1")
    got = client.decrypt_state_u128(np.asarray(jax.device_get(out[0])))
    want = aes_plain.encrypt_block(aes_plain.u128_to_bytes_be(KEY),
                                   aes_plain.u128_to_bytes_be(pt))
    want = aes_plain.bytes_be_to_u128(want)
    print(f"aes block: {'OK' if got == want else f'MISMATCH {got:x} {want:x}'}"
          f"  ({60 / t:.1f} blocks/min at B=1)", flush=True)
    if stop_at <= 4:
        return 0

    # --- batched aes_encrypt B=16 -------------------------------------------
    state16 = jnp.broadcast_to(state, (16,) + state.shape[1:])
    out, _ = sync_time(lambda: enc(dkeys, rks, state16),
                       "aes_encrypt B=16 (compile)")
    out, t = sync_time(lambda: enc(dkeys, rks, state16), "aes_encrypt B=16")
    print(f"  -> {16 * 60 / t:.1f} blocks/min", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
