"""Multi-chip sharding validation on the 8-device virtual CPU mesh."""

import numpy as np
import jax

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def test_mesh_construction():
    from tfhe_aes_tpu.parallel import mesh as mesh_mod
    m = mesh_mod.make_mesh(n_dp=4, n_mp=2)
    assert m.devices.shape == (4, 2)
    assert m.axis_names == ("dp", "mp")


def test_dryrun_multichip_8():
    """The driver's multi-chip dry run: full CTR step, dp x mp sharding."""
    import __graft_entry__ as ge
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    ge.dryrun_multichip(8)
