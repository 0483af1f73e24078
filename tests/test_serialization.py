"""Key-cache roundtrips: v2 (device-layout int8 BSK, zero load-time math)
and the v1 int16-NTT-residue interchange format must load back identically.

The reference never serializes keys (SURVEY.md section 5); this subsystem
exists because production keygen + packing is minutes of work per process.
"""

import numpy as np
import pytest

from tfhe_aes_tpu.params import PARAM_TOY
from tfhe_aes_tpu.client.client import Client
from tfhe_aes_tpu.utils import serialization


@pytest.fixture(scope="module")
def toy_keys():
    client = Client(PARAM_TOY, seed=7)
    return client.sk, client.make_device_keys()


def _assert_same(dk_a, dk_b):
    np.testing.assert_array_equal(np.asarray(dk_a.bsk_limbs),
                                  np.asarray(dk_b.bsk_limbs))
    np.testing.assert_array_equal(np.asarray(dk_a.ksk_limbs),
                                  np.asarray(dk_b.ksk_limbs))
    np.testing.assert_array_equal(np.asarray(dk_a.pfpksk_limbs),
                                  np.asarray(dk_b.pfpksk_limbs))
    assert dk_a.plan.primes == dk_b.plan.primes


@pytest.mark.parametrize("interchange", [False, True],
                         ids=["v2_device_layout", "v1_interchange"])
def test_roundtrip(tmp_path, toy_keys, interchange):
    sk, dkeys = toy_keys
    path = tmp_path / "keys.npz"
    serialization.save_keys(path, sk, dkeys, interchange=interchange)
    sk2, dkeys2 = serialization.load_keys(path)
    np.testing.assert_array_equal(sk.lwe_key, sk2.lwe_key)
    np.testing.assert_array_equal(sk.glwe_key, sk2.glwe_key)
    _assert_same(dkeys, dkeys2)


def test_formats_agree(tmp_path, toy_keys):
    """A v1 file and a v2 file of the same keys load to identical DeviceKeys
    (bsk_residues_to_device is the exact inverse of _bsk_limbs_to_residues)."""
    sk, dkeys = toy_keys
    p1, p2 = tmp_path / "v1.npz", tmp_path / "v2.npz"
    serialization.save_keys(p1, sk, dkeys, interchange=True)
    serialization.save_keys(p2, sk, dkeys, interchange=False)
    _, dk1 = serialization.load_keys(p1)
    _, dk2 = serialization.load_keys(p2)
    _assert_same(dk1, dk2)
