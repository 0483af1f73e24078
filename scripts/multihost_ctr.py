"""Multi-host FHE-AES CTR (BASELINE config #5).

Runs the dp-sharded CTR keystream across N REAL processes ("hosts") with
jax.distributed over localhost — the same SPMD program that runs over DCN on
a pod.  Each process owns a slice of the global CTR batch, LUT stacks are
built process-locally and assembled into global arrays, evaluation keys are
replicated (generated deterministically per process from the shared seed),
and every process decrypt-verifies ITS OWN blocks against the plaintext AES
oracle.  Optionally the keyswitch-key contraction axes are sharded over an
'mp' axis (sharded LUT evaluation + all-reduce, parallel/mesh.py).

Launcher mode (no --process-id): spawns N workers, parses their throughput,
and prints a scaling table vs the 1-process run.

  python scripts/multihost_ctr.py --procs 2 --blocks 32 --params dryrun
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def tiny_params():
    from tfhe_aes_tpu.params import ParamSet
    return ParamSet(
        name="PARAM_DRYRUN", lwe_dimension=8, glwe_dimension=1,
        polynomial_size=64, lwe_noise_std=2.0 ** -30,
        glwe_noise_std=2.0 ** -40, pbs_base_log=8, pbs_level=4,
        ks_base_log=4, ks_level=2, pfks_base_log=12, pfks_level=2,
        cbs_base_log=10, cbs_level=1)


def worker(args) -> None:
    import jax
    # The env var alone is NOT enough: a sitecustomize.py may force the
    # tunneled-TPU platform back on (same workaround as tests/conftest.py).
    # Without this, workers silently attach to the ONE real chip and the
    # "multi-host" measurement measures nothing.
    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: --pin-cores runs compile on ONE core, which
    # is brutal for the CTR program — warm the cache with an unpinned pass
    # first and the pinned (measured) pass compiles from disk.
    from tfhe_aes_tpu.utils import serialization
    jax.config.update("jax_compilation_cache_dir",
                      str(serialization.default_cache_dir() / "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.procs,
                               process_id=args.process_id)
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tfhe_aes_tpu.params import PARAM_TOY, PARAM_TOY_N512, PARAM_OPT, PARAM_TPU
    from tfhe_aes_tpu.client.client import Client
    from tfhe_aes_tpu.models import aes_plain, fhe_aes
    from tfhe_aes_tpu.parallel import mesh as mesh_mod

    params = {"toy": PARAM_TOY, "toy512": PARAM_TOY_N512,
              "prod": PARAM_OPT, "tpu": PARAM_TPU}.get(args.params) \
        or tiny_params()
    n_mp = args.mp
    devs = jax.devices()
    n_dp = len(devs) // n_mp
    mesh = Mesh(np.asarray(devs[: n_dp * n_mp]).reshape(n_dp, n_mp),
                axis_names=("dp", "mp"))
    rep = NamedSharding(mesh, P())

    # Keys are a deterministic function of the seed: every process generates
    # the same material locally — the multi-host analog of replicating ~1 GB
    # of evaluation keys without moving them over DCN.  Staging MUST go
    # through make_array_from_callback in multi-process SPMD (device_put to
    # a sharding with non-addressable devices deadlocks/errors); each
    # process feeds only its addressable shards.
    import dataclasses
    client = Client(params, seed=args.seed)
    cache = serialization.cache_path(params, args.seed)
    if args.params in ("prod", "tpu") and cache.exists():
        # Production keygen is minutes-scale; every process loads the same
        # cached key material (still the replicate-everywhere strategy).
        client.sk, raw = serialization.load_keys(cache)
    else:
        raw = client.make_device_keys()
    row = NamedSharding(mesh, P("mp"))
    sharded_fields = {"ksk_limbs", "pfpksk_limbs"} if args.shard_keys \
        else set()

    def stage(name, x):
        x = np.asarray(x)
        sh = row if name in sharded_fields else rep
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    dkeys = dataclasses.replace(raw, **{
        f.name: stage(f.name, getattr(raw, f.name))
        for f in dataclasses.fields(raw) if not f.metadata.get("static")})

    KEY = 0x2B7E151628AED2A6ABF7158809CF4F3C
    IV = 0x99
    rks_plain = aes_plain.key_expansion(aes_plain.u128_to_bytes_be(KEY))
    rks_host = np.stack([np.stack([client.encrypt_byte(b) for b in rk])
                         for rk in rks_plain])
    enc_iv_host = client.encrypt_u128(IV)

    def replicated(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])

    rks = replicated(rks_host)
    enc_iv = replicated(enc_iv_host)

    B = args.blocks
    assert B % n_dp == 0, "blocks must divide the global dp axis"
    lut_lsb_h, luts_rest_h = fhe_aes.add_scalar_luts(
        params, fhe_aes.counter_bytes(B))
    dp = NamedSharding(mesh, P("dp"))
    dp1 = NamedSharding(mesh, P(None, "dp"))
    lut_lsb = jax.make_array_from_callback(
        lut_lsb_h.shape, dp, lambda idx: lut_lsb_h[idx])
    luts_rest = jax.make_array_from_callback(
        luts_rest_h.shape, dp1, lambda idx: luts_rest_h[idx])

    print(f"# proc {args.process_id}: keys staged, compiling...",
          file=sys.stderr, flush=True)
    fn = mesh_mod.sharded_ctr_fn(mesh, dkeys, B)
    # Compile BEFORE any collective execution, then rendezvous through the
    # coordination service (KV barrier, no gloo): compile-time skew across
    # hosts otherwise parks the fast host inside gloo context init, whose
    # peer-address GetKeyValue times out at 30 s while the slow host is
    # still compiling (observed round 5: 2/3 quiet-box runs failed this
    # way).  On real pods the same discipline avoids burning the collective
    # timeout budget on compilation skew.
    fn.lower(rks, enc_iv, lut_lsb, luts_rest).compile()
    from jax._src import distributed
    if distributed.global_state.client is not None:
        # coordination-service barrier, NOT a device collective — it must
        # work precisely when gloo is not up yet
        distributed.global_state.client.wait_at_barrier(
            "tfhe_aes_tpu_multihost_compiled", 600_000)
    out = jax.block_until_ready(fn(rks, enc_iv, lut_lsb, luts_rest))  # warm
    print(f"# proc {args.process_id}: warm", file=sys.stderr, flush=True)
    t0 = time.time()
    out = jax.block_until_ready(fn(rks, enc_iv, lut_lsb, luts_rest))
    dt = time.time() - t0

    # Every process verifies the blocks it owns (global indices from the
    # addressable shards) — the reference verifies every block likewise
    # (client.rs:147-175).
    verified = set()
    for shard in out.addressable_shards:
        blk0 = shard.index[0].start or 0
        data = np.asarray(shard.data)
        for i in range(data.shape[0]):
            got = client.decrypt_state_u128(data[i])
            want = aes_plain.bytes_be_to_u128(aes_plain.encrypt_block(
                aes_plain.u128_to_bytes_be(KEY),
                aes_plain.u128_to_bytes_be((IV + blk0 + i) % (1 << 128))))
            assert got == want, f"block {blk0 + i}: {got:#x} != {want:#x}"
            verified.add(blk0 + i)
    print(json.dumps({
        "process": args.process_id, "procs": args.procs,
        "blocks": B, "verified_local": sorted(verified),
        "seconds": round(dt, 3),
        "blocks_per_min": round(B / dt * 60.0, 2),
        "shard_keys": bool(args.shard_keys),
    }), flush=True)


def launch(args) -> int:
    port = 37741 + (os.getpid() % 1000)
    results = {}
    n_cores = os.cpu_count() or 1
    # Hardware parallelism actually granted to the N-proc run: with more
    # emulated hosts than cores, workers are pinned round-robin (pid %
    # n_cores) and the ideal speedup vs the 1-proc baseline is n_cores, not
    # N — efficiency below normalizes by this, so 4- and 8-process runs on
    # a small box still measure what they should: per-process SPMD overhead
    # (gRPC coordination, compile skew, collective fan-in) at fixed
    # hardware.
    hw_par = min(args.procs, n_cores) if args.pin_cores else args.procs
    if args.pin_cores and args.procs > n_cores:
        print(f"# oversubscribed: {args.procs} emulated hosts round-robin-"
              f"pinned onto {n_cores} cores (ideal speedup {hw_par}x)",
              file=sys.stderr)
    for procs in ([1, args.procs] if args.scaling else [args.procs]):
        outs = []
        children = []
        for pid in range(procs):
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                f"--xla_force_host_platform_device_count="
                f"{args.devices_per_proc}")
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--process-id", str(pid), "--procs", str(procs),
                   "--coordinator", f"localhost:{port + procs}",
                   "--blocks", str(args.blocks), "--params", args.params,
                   "--mp", str(args.mp), "--seed", str(args.seed),
                   "--devices-per-proc", str(args.devices_per_proc)]
            if args.shard_keys:
                cmd.append("--shard-keys")
            if args.pin_cores:
                # One distinct core per emulated host: without pinning, the
                # 1-proc baseline already saturates every core via XLA's
                # intra-op threads and the N-proc run can't show real
                # scaling on a single machine.  Pinned, each "host" gets
                # 1/N of the hardware and the efficiency number measures
                # what it should: SPMD + collective overhead.
                cmd = ["taskset", "-c", str(pid % n_cores)] + cmd
            children.append(subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE, text=True, cwd=REPO))
        for c in children:
            out, _ = c.communicate(timeout=args.timeout)
            if c.returncode != 0:
                print(out)
                return c.returncode
            outs.extend(json.loads(ln) for ln in out.splitlines()
                        if ln.startswith("{"))
        bpm = max(o["blocks_per_min"] for o in outs)
        verified = set()
        for o in outs:
            verified.update(o["verified_local"])
        assert verified == set(range(args.blocks)), (
            sorted(verified), args.blocks)
        results[procs] = bpm
        print(f"# procs={procs}: {bpm:.2f} blocks/min, "
              f"{len(verified)}/{args.blocks} blocks verified", flush=True)
    if args.scaling and 1 in results:
        eff = results[args.procs] / (results[1] * hw_par)
        print(json.dumps({
            "metric": "multihost_scaling_efficiency",
            "procs": args.procs, "blocks": args.blocks,
            "hw_parallelism": hw_par,
            "blocks_per_min_1proc": results[1],
            "blocks_per_min_nproc": results[args.procs],
            "efficiency": round(eff, 3),
        }), flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--blocks", type=int, default=32)
    ap.add_argument("--params",
                    choices=["dryrun", "toy", "toy512", "prod", "tpu"],
                    default="dryrun")
    ap.add_argument("--mp", type=int, default=1)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shard-keys", action="store_true",
                    help="shard KSK/PFPKSK contraction axes over 'mp' "
                         "(sharded LUT evaluation + all-reduce)")
    ap.add_argument("--scaling", action="store_true",
                    help="also run 1 process and report scaling efficiency")
    ap.add_argument("--pin-cores", action="store_true",
                    help="pin each worker to its own CPU core (honest "
                         "single-machine scaling emulation)")
    ap.add_argument("--timeout", type=int, default=2400)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    args = ap.parse_args()
    if args.process_id is None:
        return launch(args)
    worker(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
