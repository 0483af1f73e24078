"""Compile-and-load warm-up: overlap the cold start with key generation.

The reference binary computes immediately (main.rs:48-51) because its hot
loops are precompiled Rust; this framework's equivalents are XLA/Mosaic
programs with two cold costs per program on the tunneled TPU backend:

  * the compile itself (~40-110 s for the blind-rotate-bearing programs —
    compile time scales with the Pallas kernel's tile width, PERF.md r5);
  * the FIRST execution, which additionally pays device program load
    (~9-11 s per big program on the tunnel).

Only the COMPILE is warmed here, from shape-faithful zero key material
(ops.keys.device_keys_shapes), in background threads while real keygen
runs: XLA compilation releases the GIL, so the compiles overlap keygen
and each other on the host CPUs.  Executing the programs on zero keys to
also pre-load them was MEASURED SLOWER end-to-end (round-5 study): every
byte and every dispatch shares the single tunnel stream, so a zero-key
execution (~45 s of device/tunnel time) delays real keygen uploads by
more than the ~10 s/program load it saves.  The later real calls hit the
in-process executable cache directly: every leaf is a traced argument
(never a baked constant) and the NTT plans are identity-stable across
threads (ops.ntt.make_plan locks its cache — a plan-object race here
silently recompiles everything).  Real-key H2D (~1 GB at ~20 MB/s
effective) is likewise started eagerly per component inside
client.keygen_fast.make_device_keys_fast.

precompile() mirrors exactly the programs bench/cli dispatch:
aes_key_expansion_staged's many-LUT WoPBS, and ctr_keystream's
single-fused-step (<= block_chunk blocks) or ripple + chunked-AES (above).
"""

from __future__ import annotations

import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..params import ParamSet

U64 = jnp.uint64


def _materialize(tree):
    """ShapeDtypeStruct leaves -> device zeros (other leaves pass through)."""
    return jax.tree_util.tree_map(
        lambda l: (jnp.zeros(l.shape, l.dtype)
                   if isinstance(l, jax.ShapeDtypeStruct) else l), tree)


def _targets(params: ParamSet, n_blocks: int, block_chunk: int):
    """(name, jitted_fn, arg pytree) for every cold-start program."""
    from ..models import fhe_aes
    from ..ops import keys as keys_mod, wopbs

    p = params
    keys_z = _materialize(keys_mod.device_keys_shapes(p))
    big = p.big_lwe_dimension
    state1 = jnp.zeros((16, 8, big + 1), U64)

    refresh_lut = jnp.asarray(fhe_aes._refresh_sbox_lut(p))
    targets = [("keyexp_wopbs", wopbs.many_wopbs_jit,
                (keys_z, state1, refresh_lut))]

    i_bytes = fhe_aes.counter_bytes(n_blocks)
    lut_lsb, luts_rest = fhe_aes.add_scalar_luts(p, i_bytes)
    lut_lsb, luts_rest = jnp.asarray(lut_lsb), jnp.asarray(luts_rest)
    rks = jnp.zeros((11, 16, 8, big + 1), U64)
    if n_blocks <= block_chunk:
        targets.append(("ctr_step", fhe_aes.ctr_step_jit,
                        (keys_z, rks, state1, lut_lsb, luts_rest)))
    else:
        from ..ops.wopbs import _chunk_size
        bc = _chunk_size(n_blocks, block_chunk)
        stateB = jnp.zeros((n_blocks, 16, 8, big + 1), U64)
        stateC = jnp.zeros((bc, 16, 8, big + 1), U64)
        targets.append(("ripple_add", fhe_aes.add_scalar_device_jit,
                        (keys_z, stateB, lut_lsb, luts_rest)))
        targets.append(("aes_encrypt", fhe_aes.aes_encrypt_jit,
                        (keys_z, rks, stateC)))
    return targets


def precompile(params: ParamSet, n_blocks: int, *, block_chunk: int = 32,
               report: dict | None = None) -> threading.Thread:
    """Start compiling+loading the production programs in the background.

    Returns a thread to .join() once the (cheap) real-call path is about to
    need the executables.  `report` (optional dict) receives per-program
    warm seconds, or an 'err' entry — a warm-up failure must never take
    the real run down, so exceptions are recorded, not raised.
    """
    rep = report if report is not None else {}

    def warm_one(name, fn, args):
        t0 = time.time()
        try:
            fn.lower(*args).compile()       # compile only — see note below
            rep[name] = round(time.time() - t0, 1)
        except Exception as e:      # pragma: no cover - diagnostics only
            rep[f"{name}_err"] = repr(e)

    # Build the targets SYNCHRONOUSLY: this constructs the NTT plans
    # before keygen can race them (see module docstring), and stages the
    # zero keys in HBM (~0.6 GB at production parameters, freed with the
    # thread).
    try:
        targets = _targets(params, n_blocks, block_chunk)
    except Exception as e:          # pragma: no cover - diagnostics only
        rep["err"] = repr(e)
        th = threading.Thread(target=lambda: None, daemon=True)
        th.start()
        return th

    def run():
        threads = [threading.Thread(target=warm_one, args=t, daemon=True)
                   for t in targets]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    return th
