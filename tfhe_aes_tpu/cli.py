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

from .params import PARAM_OPT, PARAM_TPU, PARAM_TOY
from .client.client import Client
from .models import aes_plain, fhe_aes
from .server import Server
from .utils import profiling, serialization


def run_test_harness(params, n_random: int, seed: int | None = None) -> None:
    """The reference's hidden `test()` (main.rs:76-142): 4 NIST-style
    vectors under key 2b7e...4f3c plus random key/plaintext cases; each
    case runs key expansion -> encrypt -> decrypt round-trip -> verify
    against plaintext AES (test_verify, client.rs:178-216).

    TPU-shaped deviations (documented): one FHE keyset serves every case
    (evaluation keys are independent of the AES inputs; the reference
    regenerates them per case), and the four shared-key vectors run as ONE
    batch of 4 states instead of four serial evaluations.
    """
    import jax
    import jax.numpy as jnp

    client = Client(params, seed=seed)
    # Trust boundary (main.rs:43-45): the server receives only evaluation
    # keys + the public key; RCON is pk-encrypted server-side.
    server = Server(client.make_device_keys(), client.make_public_key())

    def one_case(key: int, plains: list[int]) -> None:
        enc_key = jnp.asarray(client.encrypt_u128(key))
        rks = server.aes_key_expansion(enc_key, pk_rcon=True)
        state = jnp.asarray(np.stack([client.encrypt_u128(p)
                                      for p in plains]))
        ct = server.aes_encrypt(rks, state)
        pt = np.asarray(server.aes_decrypt(rks, ct))
        ct = np.asarray(ct)
        kb = aes_plain.u128_to_bytes_be(key)
        for i, plain in enumerate(plains):
            want = aes_plain.bytes_be_to_u128(aes_plain.encrypt_block(
                kb, aes_plain.u128_to_bytes_be(plain)))
            got_ct = client.decrypt_state_u128(ct[i])
            got_pt = client.decrypt_state_u128(pt[i])
            assert got_ct == want, (
                f"key={key:#x} plain={plain:#x}: FHE ct {got_ct:#x} "
                f"!= AES {want:#x}")
            assert got_pt == plain, (
                f"key={key:#x}: decrypt round-trip {got_pt:#x} "
                f"!= {plain:#x}")
            print(f"Passed test case. key={key:032x} plain={plain:032x}")

    nist_key = 0x2B7E151628AED2A6ABF7158809CF4F3C
    nist_plains = [0x6BC1BEE22E409F96E93D7E117393172A,
                   0xAE2D8A571E03AC9C9EB76FAC45AF8E51,
                   0x30C81C46A35CE411E5FBC1191A0A52EF,
                   0xF69F2445DF4F9B17AD2B417BE66C3710]
    one_case(nist_key, nist_plains)
    rng = np.random.default_rng(seed)
    for _ in range(n_random):
        key = int.from_bytes(rng.bytes(16), "big")
        plain = int.from_bytes(rng.bytes(16), "big")
        one_case(key, [plain])
    print(f"All {4 + n_random} test cases passed.")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="tfhe-aes-tpu",
        description="TPU-native fully homomorphic AES-128 CTR (WoPBS/TFHE)")
    ap.add_argument("--number-of-outputs", type=int,
                    help="number of CTR keystream blocks")
    ap.add_argument("--iv", type=lambda s: int(s, 0),
                    help="u128 initialization vector / counter start")
    ap.add_argument("--key", type=lambda s: int(s, 0),
                    help="u128 AES key")
    ap.add_argument("--test", action="store_true",
                    help="run the reference's hidden test harness "
                         "(NIST vectors + random encrypt/decrypt "
                         "round-trips, main.rs:76-142) and exit")
    ap.add_argument("--test-random", type=int, default=10,
                    help="number of random cases for --test")
    ap.add_argument("--params", choices=["prod", "tpu", "toy"],
                    default="prod",
                    help="prod = reference PARAM_OPT; tpu = PARAM_TPU (same "
                         "security surface, TPU-native base-2^12 BSK "
                         "decomposition, certified p_fail <= 2^-64 — "
                         "params.py)")
    ap.add_argument("--seed", type=int, default=None,
                    help="client RNG seed (default: OS entropy)")
    ap.add_argument("--no-verify", action="store_true")
    ap.add_argument("--host-verify", action="store_true",
                    help="(default since round 5) decrypt + verify on the "
                         "client: ciphertexts are pulled to host in small "
                         "chunks and the secret key never touches the "
                         "accelerator")
    ap.add_argument("--device-verify", action="store_true",
                    help="measurement-only shortcut: decrypt on-device and "
                         "transfer only plaintext bits.  This SHIPS THE "
                         "SECRET KEY to the accelerator — it violates the "
                         "trust boundary the Server facade models and "
                         "exists because the tunneled-TPU D2H link is slow")
    ap.add_argument("--decrypt", action="store_true",
                    help="also run homomorphic decryption round-trip")
    ap.add_argument("--no-cache", action="store_true",
                    help="do not cache/load evaluation keys")
    ap.add_argument("--pk-rcon", action="store_true",
                    help="public-key-encrypt RCON server-side like the "
                         "reference (server.rs:139-140) instead of the "
                         "default trivial noise-free encodings; selects "
                         "the 3-WoPBS key-expansion schedule")
    ap.add_argument("--noise-asserts", action="store_true",
                    help="debug sanitizer (tfhe-rs noise-asserts parity, "
                         "Cargo.toml:7): measure the phase error of REAL "
                         "ciphertexts at every WoPBS input/output against "
                         "the analytic noise model and fail on violation. "
                         "Client-side + slow (per-bootstrap host "
                         "callbacks); test/debug only")
    ap.add_argument("--platform", choices=["auto", "cpu", "tpu"],
                    default="auto",
                    help="force the JAX backend (auto = whatever the "
                         "environment provides; cpu is right for --params "
                         "toy when a slow tunneled TPU is the default)")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_enable_x64", True)
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif args.platform == "tpu":
        jax.config.update("jax_platforms", "axon,tpu")

    params = {"prod": PARAM_OPT, "tpu": PARAM_TPU,
              "toy": PARAM_TOY}[args.params]

    if args.test:
        run_test_harness(params, args.test_random, seed=args.seed)
        return 0
    if None in (args.number_of_outputs, args.iv, args.key):
        ap.error("--number-of-outputs, --iv and --key are required "
                 "(or pass --test)")
    print(f"[client] parameters: {params.name}  "
          f"(n={params.lwe_dimension}, k={params.glwe_dimension}, "
          f"N={params.polynomial_size})")

    # AOT compile warm-up: the production programs compile from shapes
    # alone in background threads, overlapping keygen (utils/warmup.py;
    # the reference binary starts computing immediately, main.rs:48-51 —
    # this hides most of the XLA/Mosaic cold start behind key material).
    from .utils import warmup
    warm_report: dict = {}
    warm_thread = warmup.precompile(params, args.number_of_outputs,
                                    report=warm_report)

    cache = serialization.cache_path(params, args.seed)
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

    if args.noise_asserts:
        from .utils import noise_asserts
        noise_asserts.enable(client.sk)

    enc_key = client.encrypt_u128(args.key)
    enc_iv = client.encrypt_u128(args.iv)
    # Trust boundary (main.rs:43-45): only eval keys, the public key and
    # encrypted inputs cross to the server; pk-RCON happens server-side.
    server = Server(dkeys,
                    client.make_public_key() if args.pk_rcon else None)

    warm_thread.join()
    if warm_report:
        print(f"[server] compile warm-up (overlapped): {warm_report}")

    import jax.numpy as jnp
    t0 = time.time()
    round_keys = server.aes_key_expansion(jnp.asarray(enc_key),
                                          pk_rcon=args.pk_rcon)
    round_keys = profiling.device_fence(round_keys)
    t_exp = time.time() - t0
    print(f"[server] AES key expansion took: {t_exp:.2f}s")

    n = args.number_of_outputs
    t0 = time.time()
    ks = server.ctr_keystream(round_keys, jnp.asarray(enc_iv), n, offset=0)
    ks = profiling.device_fence(ks)
    t_ctr = time.time() - t0
    pbs_count = n * profiling.count_pbs_per_block(params)
    print(f"[server] AES of #{n} outputs computed in: {t_ctr:.2f}s "
          f"({n / t_ctr * 60:.2f} blocks/min, "
          f"{pbs_count / t_ctr:.0f} PBS/s)")

    if not args.no_verify:
        if args.device_verify:
            got = client.verify_ctr_device(ks, args.key, args.iv)
        else:
            got = client.fetch_and_verify_ctr(ks, args.key, args.iv)
        print(f"[client] verified {n} blocks bit-exact vs plaintext AES")
        print(f"[client] first block: {got[0]:#034x}")

    if args.decrypt:
        t0 = time.time()
        back = server.aes_decrypt(round_keys, ks[:1])
        back = jax.block_until_ready(back)
        print(f"[server] homomorphic decrypt (1 block) took "
              f"{time.time()-t0:.2f}s")
        got = client.decrypt_state_u128(np.asarray(back)[0])
        assert got == args.iv % (1 << 128), "decrypt round-trip failed"
        print("[client] homomorphic decryption round-trip verified")

    if args.noise_asserts:
        from .utils import noise_asserts
        n_checks = len(noise_asserts.checks())
        noise_asserts.assert_clean()
        print(f"[client] noise asserts: {n_checks} checkpoints, "
              f"all within modeled sigma")
    return 0


if __name__ == "__main__":
    sys.exit(main())
