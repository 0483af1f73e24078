"""Multi-host scaling-efficiency floor (BASELINE.md's >85% target, CI floor).

Runs the real 2-process jax.distributed launcher in --scaling mode with each
emulated host PINNED to its own CPU core (scripts/multihost_ctr.py
--pin-cores): without pinning, the 1-process baseline already saturates
every core through XLA's intra-op threads and no single-machine efficiency
number is meaningful.  The launcher verifies every block against the
plaintext AES oracle in each worker before reporting throughput.

The CI floor is 0.7 (not BASELINE's 0.85): the virtual-CPU-mesh emulation
pays real gRPC-coordination and compile-skew overheads a pod does not, and
the point of the assertion is to fail loudly on a collective regression
(e.g. a sharding change that silently all-gathers the batch), not to
certify pod-scale efficiency.  The measured artifact for the record lives
in MULTIHOST_SCALING.json at the repo root.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCHER = os.path.join(REPO, "scripts", "multihost_ctr.py")


@pytest.mark.slow
def test_two_process_scaling_efficiency_floor():
    if (os.cpu_count() or 1) < 2:
        pytest.skip("needs >= 2 cores to pin one per emulated host")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # launcher sets cpu itself
    # Blocks must be large enough that per-block compute dominates the
    # fixed dispatch/collective overhead: at 16 blocks both configurations
    # saturate at the same ~0.36 s floor and efficiency reads ~0.5
    # regardless of scaling quality (measured 2026-08; see
    # MULTIHOST_SCALING.json for the compute-bound artifact).
    out = subprocess.run(
        [sys.executable, LAUNCHER, "--procs", "2", "--blocks", "512",
         "--params", "dryrun", "--scaling", "--pin-cores",
         "--devices-per-proc", "1"],
        capture_output=True, text=True, timeout=2700, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    rows = [json.loads(ln) for ln in out.stdout.splitlines()
            if ln.startswith("{")]
    scaling = [r for r in rows if r.get("metric")
               == "multihost_scaling_efficiency"]
    assert scaling, out.stdout
    eff = scaling[-1]["efficiency"]
    assert eff >= 0.7, f"2-process scaling efficiency {eff} < 0.7 floor"
