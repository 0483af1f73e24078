"""CLI driver — flag-parity with the reference binary.

Reference: `aes --number-of-outputs N --iv IV --key KEY` (main.rs:20-30):
keygen, client-encrypt key+IV, server key expansion (timed), CTR keystream
(timed), client decrypt + verify against plaintext AES.

Extras over the reference: --params toy for fast runs, --decrypt to exercise
the homomorphic decryption round-trip (the reference's hidden test() path,
main.rs:76-142), key caching, and throughput/PBS metrics.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from .params import PARAM_OPT, PARAM_TOY
from .client.client import Client
from .models import aes_plain, fhe_aes, tables
from .utils import serialization


def _rcon_cts(client, pk):
    rcon_bits = np.stack([
        np.array([(int(r) >> j) & 1 for j in range(8)], dtype=np.uint64)
        for r in tables.RCON])
    return pk.encrypt_bits(rcon_bits, client.rng)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="tfhe-aes-tpu",
        description="TPU-native fully homomorphic AES-128 CTR (WoPBS/TFHE)")
    ap.add_argument("--number-of-outputs", type=int, required=True,
                    help="number of CTR keystream blocks")
    ap.add_argument("--iv", type=lambda s: int(s, 0), required=True,
                    help="u128 initialization vector / counter start")
    ap.add_argument("--key", type=lambda s: int(s, 0), required=True,
                    help="u128 AES key")
    ap.add_argument("--params", choices=["prod", "toy"], default="prod")
    ap.add_argument("--seed", type=int, default=None,
                    help="client RNG seed (default: OS entropy)")
    ap.add_argument("--no-verify", action="store_true")
    ap.add_argument("--decrypt", action="store_true",
                    help="also run homomorphic decryption round-trip")
    ap.add_argument("--no-cache", action="store_true",
                    help="do not cache/load evaluation keys")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_enable_x64", True)

    params = PARAM_OPT if args.params == "prod" else PARAM_TOY
    print(f"[client] parameters: {params.name}  "
          f"(n={params.lwe_dimension}, k={params.glwe_dimension}, "
          f"N={params.polynomial_size})")

    cache = serialization.default_cache_dir() / (
        f"{params.name}_seed{args.seed}.npz")
    t0 = time.time()
    if not args.no_cache and args.seed is not None and cache.exists():
        from .backend import numpy_backend as nb
        sk, dkeys = serialization.load_keys(cache)
        client = Client(params, seed=args.seed)
        client.sk = sk
        print(f"[client] loaded cached keys in {time.time()-t0:.2f}s")
    else:
        client = Client(params, seed=args.seed)
        dkeys = client.make_device_keys()
        if not args.no_cache and args.seed is not None:
            serialization.save_keys(cache, client.sk, dkeys)
        print(f"[client] keygen + packing took {time.time()-t0:.2f}s")

    pk = client.make_public_key()
    enc_key = client.encrypt_u128(args.key)
    enc_iv = client.encrypt_u128(args.iv)
    rcon = _rcon_cts(client, pk)

    import jax.numpy as jnp
    t0 = time.time()
    round_keys = fhe_aes.aes_key_expansion_jit(dkeys, jnp.asarray(enc_key),
                                               jnp.asarray(rcon))
    round_keys = jax.block_until_ready(round_keys)
    t_exp = time.time() - t0
    print(f"[server] AES key expansion took: {t_exp:.2f}s")

    n = args.number_of_outputs
    t0 = time.time()
    ks = fhe_aes.ctr_keystream(dkeys, round_keys, jnp.asarray(enc_iv), n,
                               offset=0)
    ks = jax.block_until_ready(ks)
    t_ctr = time.time() - t0
    pbs_count = n * (16 * 9 + 2560)  # add_scalar CBS + encrypt bootstraps
    print(f"[server] AES of #{n} outputs computed in: {t_ctr:.2f}s "
          f"({n / t_ctr * 60:.2f} blocks/min)")

    if not args.no_verify:
        got = client.decrypt_and_verify_ctr(np.asarray(ks), args.key, args.iv)
        print(f"[client] verified {n} blocks bit-exact vs plaintext AES")
        print(f"[client] first block: {got[0]:#034x}")

    if args.decrypt:
        t0 = time.time()
        back = fhe_aes.aes_decrypt_jit(dkeys, round_keys, ks[:1])
        back = jax.block_until_ready(back)
        print(f"[server] homomorphic decrypt (1 block) took "
              f"{time.time()-t0:.2f}s")
        got = client.decrypt_state_u128(np.asarray(back)[0])
        assert got == args.iv % (1 << 128), "decrypt round-trip failed"
        print("[client] homomorphic decryption round-trip verified")
    return 0


if __name__ == "__main__":
    sys.exit(main())
