"""Cold-start warm-up: shape fidelity and end-to-end precompile.

The warm-up (utils/warmup.py) only works if ops.keys.device_keys_shapes
reports EXACTLY the avals real packed keys have — a silent drift would
recompile every production program after the warm-up already "paid" for
them (the round-5 cold-start root causes: a plan-identity race, then
first-execution program load).  These tests pin both halves on PARAM_TOY.
"""

import dataclasses

import jax
import numpy as np
import pytest

from tfhe_aes_tpu.params import PARAM_TOY
from tfhe_aes_tpu.client import keygen_fast
from tfhe_aes_tpu.ops import keys as keys_mod
from tfhe_aes_tpu.utils import warmup


def test_device_keys_shapes_match_packed_zero_keys():
    zk = keygen_fast.zero_device_keys(PARAM_TOY)
    sh = keys_mod.device_keys_shapes(PARAM_TOY)
    for f in dataclasses.fields(keys_mod.DeviceKeys):
        real, spec = getattr(zk, f.name), getattr(sh, f.name)
        if f.name in ("params", "plan", "rplan"):
            # identity-stable statics: the same OBJECT, or every program
            # the warm-up compiled silently recompiles on the real call
            assert real is spec, f.name
            continue
        assert tuple(np.shape(real)) == tuple(spec.shape), f.name
        assert np.asarray(real).dtype == spec.dtype, f.name


def test_zero_keys_plan_identity_is_thread_race_free():
    # ops.ntt.make_plan must return the SAME object under concurrent first
    # calls (it is an identity-hashed jit static) — regression for the
    # round-5 cold-start bug where keygen raced the warm-up thread.
    import threading
    from tfhe_aes_tpu.ops import ntt
    ntt._make_plan.cache_clear()
    out = []
    barrier = threading.Barrier(4)

    def grab():
        barrier.wait()
        out.append(ntt.make_plan(PARAM_TOY.polynomial_size))

    ts = [threading.Thread(target=grab) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(o is out[0] for o in out)


@pytest.mark.slow
def test_precompile_end_to_end_toy():
    rep = {}
    th = warmup.precompile(PARAM_TOY, 2, report=rep)
    th.join()
    assert "err" not in rep, rep
    assert not [k for k in rep if k.endswith("_err")], rep
    assert "keyexp_wopbs" in rep and "ctr_step" in rep, rep
