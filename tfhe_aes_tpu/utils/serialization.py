"""Key serialization / caching.

The reference keeps everything in memory and regenerates keys per run
(SURVEY.md section 5 "Checkpoint / resume: none"); at production parameters
keygen + packing is expensive (~1.2 GB of evaluation keys), so we persist
both secret and packed evaluation keys once per (params, seed) and mmap them
back.
"""

from __future__ import annotations

import os
import pathlib

import numpy as np

from ..params import ParamSet, PARAM_OPT, PARAM_TOY, PARAM_TOY_N512
from ..backend.numpy_backend import SecretKeys
from ..ops import ntt
from ..ops.keys import DeviceKeys
from ..utils import crt

_PARAM_SETS = {p.name: p for p in (PARAM_OPT, PARAM_TOY, PARAM_TOY_N512)}


def default_cache_dir() -> pathlib.Path:
    return pathlib.Path(os.environ.get(
        "TFHE_AES_TPU_CACHE", os.path.expanduser("~/.cache/tfhe_aes_tpu")))


def save_keys(path: pathlib.Path, sk: SecretKeys, dkeys: DeviceKeys) -> None:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path,
        params_name=np.array(sk.params.name),
        primes=np.array(dkeys.plan.primes, dtype=np.int64),
        lwe_key=sk.lwe_key,
        glwe_key=sk.glwe_key,
        bsk_ntt=np.asarray(dkeys.bsk_ntt),
        ksk_limbs=np.asarray(dkeys.ksk_limbs),
        pfpksk_limbs=np.asarray(dkeys.pfpksk_limbs),
    )


def load_keys(path: pathlib.Path) -> tuple[SecretKeys, DeviceKeys]:
    z = np.load(path, mmap_mode="r")
    params = _PARAM_SETS[str(z["params_name"])]
    sk = SecretKeys(params, np.asarray(z["lwe_key"]),
                    np.asarray(z["glwe_key"]))
    plan = ntt.make_plan(params.polynomial_size,
                         tuple(int(p) for p in z["primes"]))
    dkeys = DeviceKeys(
        params=params, plan=plan,
        bsk_ntt=np.asarray(z["bsk_ntt"]),
        ksk_limbs=np.asarray(z["ksk_limbs"]),
        pfpksk_limbs=np.asarray(z["pfpksk_limbs"]),
        fwd_limbs=plan.fwd_limbs,
        inv_crt_limbs=plan.inv_crt_limbs,
        rot_table=plan.rot_table,
    )
    return sk, dkeys
