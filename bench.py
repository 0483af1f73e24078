#!/usr/bin/env python
"""Benchmark: FHE AES-128 CTR throughput on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published 84 s/block single-core (README.md:184-186)
= 0.714 blocks/min.  Metric: CTR keystream blocks/min at production
parameters (128-bit security, p_fail <= 2^-64), bit-exact decryption
verified against the plaintext AES oracle.

Default parameter set: PARAM_TPU — the framework's own production set:
identical security surface to the reference's PARAM_OPT (same dimensions
and noise distributions) with a TPU-native base-2^12 BSK decomposition,
p_fail certified analytically (utils/noise_model.py, tests/
test_noise_model.py) and measured on device (NOISE_REPORT_TPU.md, 82.7
sigma decrypt margin).  `--params prod` benches the reference-parity
PARAM_OPT set.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_BLOCKS_PER_MIN = 60.0 / 84.0  # reference: 84 s/block, 1 CPU core


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=64,
                    help="CTR blocks per timed batch (33.2 blocks/min at "
                         "16, 42.8 at 32, 43.9 at 64; above 32 the AES "
                         "rounds run as chunked <=32-block dispatches — "
                         "the single-dispatch device ceiling)")
    ap.add_argument("--params", choices=["prod", "tpu", "toy"],
                    default="tpu",
                    help="prod = reference PARAM_OPT; tpu = PARAM_TPU (same "
                         "security surface, TPU-native base-2^12 BSK "
                         "decomposition, certified p_fail <= 2^-64 — "
                         "params.py)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--skip-verify", action="store_true")
    ap.add_argument("--device-verify", action="store_true",
                    help="measurement-only shortcut: decrypt on-device "
                         "(ships the secret key to the accelerator).  The "
                         "default verifies on the CLIENT via chunked D2H — "
                         "the trust boundary the Server facade models")
    ap.add_argument("--decrypt", type=int, default=0, metavar="N",
                    help="also time homomorphic AES decryption of N blocks "
                         "of the produced keystream (reference: ~2x encrypt "
                         "cost, README.md:161-163) and verify the "
                         "round-trip; reported on stderr, the stdout metric "
                         "stays the encrypt headline")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_enable_x64", True)
    # Persistent compilation cache: the CTR program is large (10 AES rounds
    # of fused Pallas CMux steps); caching its XLA binary cuts warmup from
    # minutes to seconds on repeat bench runs.
    from tfhe_aes_tpu.utils import serialization
    jax.config.update("jax_compilation_cache_dir",
                      str(serialization.default_cache_dir() / "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tfhe_aes_tpu.params import PARAM_OPT, PARAM_TPU, PARAM_TOY
    from tfhe_aes_tpu.client.client import Client
    from tfhe_aes_tpu.models import fhe_aes

    params = {"prod": PARAM_OPT, "tpu": PARAM_TPU,
              "toy": PARAM_TOY}[args.params]
    dev = jax.devices()[0]
    print(f"# device: {dev}, params: {params.name}, blocks: {args.blocks}",
          file=sys.stderr)

    # Cold-start overlap (VERDICT r4 #3): AOT-compile the production
    # programs from shapes alone, in background threads, while keygen runs.
    # The real calls below hit the persistent compilation cache the AOT
    # compiles seeded (same process, identical HLO).
    from tfhe_aes_tpu.utils import warmup
    warm: dict = {}
    t0w = time.time()
    wth = warmup.precompile(params, args.blocks, report=warm)

    cache = serialization.cache_path(params, 0)
    t0 = time.time()
    save_th = None
    if cache.exists():
        sk, dkeys = serialization.load_keys(cache)
        client = Client(params, seed=0)
        client.sk = sk
    else:
        client = Client(params, seed=0)
        dkeys = client.make_device_keys()
        # Save in the background (atomic tmp+rename): the D2H pull for the
        # npz must not sit between keygen and the first real dispatch.
        import threading as _threading
        save_th = _threading.Thread(
            target=serialization.save_keys,
            args=(cache, client.sk, dkeys), daemon=True)
        save_th.start()
    dkeys = jax.device_put(dkeys)   # stage eval keys in HBM once
    print(f"# keys ready in {time.time()-t0:.1f}s", file=sys.stderr)
    wth.join()
    print(f"# AOT compile warm-up (overlapped with keygen): {warm} "
          f"joined at {time.time()-t0w:.1f}s", file=sys.stderr)

    KEY = 0x2B7E151628AED2A6ABF7158809CF4F3C
    IV = 0x00112233445566778899AABBCCDDEEFF
    enc_key = jnp.asarray(client.encrypt_u128(KEY))
    enc_iv = jnp.asarray(client.encrypt_u128(IV))

    # Key expansion runs and is timed EVERY bench run, like the reference
    # (main.rs:48-51).  The staged driver compiles ONE WoPBS program and
    # reuses it for all 11 dispatches (fast cold start, fhe_aes.
    # aes_key_expansion_staged); first number includes that compile (also
    # cached across runs by the persistent compilation cache), the second
    # is the warm execution — the deployment latency for a long-lived
    # server.
    from tfhe_aes_tpu.utils import profiling
    t0 = time.time()
    rks = profiling.device_fence(
        fhe_aes.aes_key_expansion_staged(dkeys, enc_key))
    print(f"# key expansion (incl. compile): {time.time()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    rks = profiling.device_fence(
        fhe_aes.aes_key_expansion_staged(dkeys, enc_key))
    print(f"# key expansion (warm): {time.time()-t0:.1f}s", file=sys.stderr)

    B = args.blocks

    def sync(x):
        # Under the tunneled TPU backend block_until_ready can return at
        # ENQUEUE time; a (tiny) device->host read cannot complete before
        # the producing program does, so it is the honest fence.
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x[0, 0, 0, -1:]))
        return x

    # Each timed batch uses a DIFFERENT counter offset: repeats are distinct
    # keystream work, so no runtime/tunnel layer can satisfy them from a
    # cache (an earlier revision repeated identical inputs and the device
    # tunnel returned them in 0.00s).  Host LUT construction is INSIDE the
    # timed region (a deployment pays it per batch; vectorized numpy,
    # ~0.1 s at 128 blocks — models/luts.py).  Batches > 32 blocks run the
    # ripple at full batch plus chunked AES dispatches (fhe_aes.
    # ctr_keystream — the single-dispatch device ceiling is 32 blocks).
    def run(offset):
        return sync(fhe_aes.ctr_keystream(dkeys, rks, enc_iv, B,
                                          offset=offset))

    t0 = time.time()
    out = run(0)  # warmup (includes compiles)
    print(f"# warmup batch: {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    last_offset = 0
    for i in range(args.repeats):
        last_offset = (i + 1) * B
        t0 = time.time()
        out = run(last_offset)
        times.append(time.time() - t0)
        print(f"# repeat {i}: {times[-1]:.2f}s", file=sys.stderr)
    t_batch = min(times)
    blocks_per_min = B / t_batch * 60.0

    # Emit the metric BEFORE any further device interaction: large D2H /
    # extra programs right after long runs have faulted the device tunnel,
    # and a fault must not cost the bench result.
    from tfhe_aes_tpu.utils import profiling
    pbs_per_block = profiling.count_pbs_per_block(params)
    print(f"# steady-state: {t_batch:.2f}s/batch, "
          f"{B / t_batch * pbs_per_block:.0f} PBS/s/chip", file=sys.stderr)
    print(json.dumps({
        "metric": "aes128_ctr_blocks_per_min",
        "value": round(blocks_per_min, 3),
        "unit": "blocks/min",
        "vs_baseline": round(blocks_per_min / BASELINE_BLOCKS_PER_MIN, 2),
        # Self-describing run conditions (round-4 ADVICE): which parameter
        # set produced the number, so recorded BENCH_r*.json stand alone.
        "params": params.name,
        "blocks": B,
    }))
    sys.stdout.flush()

    if not args.skip_verify:
        t0 = time.time()
        if args.device_verify:
            # Measurement-only: decrypt on-device, pull just plaintext bits.
            client.verify_ctr_device(out, KEY, IV, offset=last_offset)
        else:
            # Default: ciphertexts cross to the client in small chunks and
            # are decrypted on host — the secret key never touches the
            # accelerator (VERDICT r4 #8; chunked because one large D2H
            # after a long program has faulted the tunnel).
            client.fetch_and_verify_ctr(out, KEY, IV, offset=last_offset)
        print(f"# verified bit-exact vs plaintext AES "
              f"({'device' if args.device_verify else 'host'} decrypt, "
              f"{time.time()-t0:.1f}s, outside the metric)", file=sys.stderr)

    if args.decrypt:
        # Homomorphic decryption benchmark (server.rs:67-105; the reference
        # documents ~2x encrypt cost, README.md:161-163).  Round keys are
        # reused; the round-trip must recover the counter plaintexts.
        nd = min(args.decrypt, B)
        ct = out[:nd]
        t0 = time.time()
        back = sync(fhe_aes.aes_decrypt_jit(dkeys, rks, ct))
        print(f"# decrypt warmup ({nd} blocks): {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        back = sync(fhe_aes.aes_decrypt_jit(dkeys, rks, ct))
        t_dec = time.time() - t0
        print(f"# homomorphic decrypt: {t_dec:.2f}s for {nd} blocks = "
              f"{nd / t_dec * 60:.2f} blocks/min "
              f"(encrypt: {blocks_per_min:.2f})", file=sys.stderr)
        if not args.skip_verify:
            from tfhe_aes_tpu.models import aes_plain
            if args.device_verify:
                bits = client.decrypt_bits_device(back).astype(np.int64)
                byts = (bits << np.arange(8)).sum(axis=-1)
                got_all = [aes_plain.bytes_be_to_u128(
                    [int(b) for b in byts[i]]) for i in range(nd)]
            else:
                arr = np.asarray(jax.device_get(back))
                got_all = [client.decrypt_state_u128(arr[i])
                           for i in range(nd)]
            for i, got in enumerate(got_all):
                want = (IV + last_offset + i) % (1 << 128)
                assert got == want, f"decrypt round-trip block {i}"
            print(f"# decrypt round-trip verified ({nd} blocks)",
                  file=sys.stderr)

    if save_th is not None:
        save_th.join()              # finish the atomic key-cache write
    return 0


if __name__ == "__main__":
    sys.exit(main())
