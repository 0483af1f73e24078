"""Timing / throughput observability.

The reference's entire telemetry is two wall-clock printlns (main.rs:48-67);
here: an honest device completion fence and the ONE PBS-per-block accounting
used by cli.py and bench.py.  (jax.profiler timeline capture lives in
scripts/tpu_profile_pbs.py.)
"""

from __future__ import annotations


def device_fence(x):
    """Honest completion fence for timing: block_until_ready PLUS a tiny
    device->host read.  Tunneled TPU backends (axon) have returned from
    block_until_ready at enqueue time; a D2H read of one element cannot
    complete before the producing program does."""
    import numpy as np
    import jax
    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[-1:]))
    return x


def count_pbs_per_block(params) -> int:
    """PBS-class bootstraps per AES-128 CTR block in this framework.

    The ONE accounting used by cli.py and bench.py.  Each circuit-bootstrapped
    bit costs ``cbs_level`` blind rotates; bit extraction costs zero PBS here
    (1-bit radix blocks degenerate to a keyswitch, SURVEY.md 2b):
      encrypt: 10 rounds x 128 bits; add_scalar ripple: 8 + 15 x 9 bits."""
    return (10 * 128 + 8 + 15 * 9) * params.cbs_level
