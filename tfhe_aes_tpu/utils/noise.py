"""Noise-budget auditing derived from the REAL circuits.

tfhe-rs's noise-asserts feature (reference Cargo.toml:7) tracks a NoiseLevel
per ciphertext at runtime and asserts it stays <= max_noise_level (5: at most
five leveled additions between bootstraps, README.md:176-180).  This module
provides the same guarantee by *executing the actual circuit code* — not a
hand-replayed ledger — with every ciphertext replaced by a tiny array holding
its noise level and the WoPBS primitive mocked to (a) record the level of
every bootstrap input and (b) return fresh level-1 outputs (the reference
stamps NoiseLevel::NOMINAL likewise, many_wopbs.rs:101-108).

NoiseLevel semantics (matching tfhe-rs): a fresh encryption or bootstrap
output is level 1; adding two ciphertexts adds their levels.  The budget must
hold wherever a ciphertext's noise matters: at every WoPBS input (the blind
rotate's modswitch rounds it) and at circuit outputs (the client decrypts
them).  Because the circuits run eagerly (jax.disable_jit), lax.fori_loop /
lax.scan bodies execute with concrete values and any change to the real
add/refresh structure of fhe_aes.py shows up here — the audit derives the
levels from the circuit, it cannot agree with it by construction.
"""

from __future__ import annotations

import contextlib
from unittest import mock

import numpy as np
import jax
import jax.numpy as jnp

from ..params import ParamSet

U64 = jnp.uint64


class _Ledger:
    """Records the maximum noise level fed into any WoPBS."""

    def __init__(self):
        self.max_wopbs_in = 0

    def observe(self, lvl: int) -> None:
        self.max_wopbs_in = max(self.max_wopbs_in, lvl)


class _StubKeys:
    """DeviceKeys stand-in: with WoPBS mocked, circuits only read .params."""

    def __init__(self, params: ParamSet):
        self.params = params


def _mock_many_wopbs(ledger: _Ledger):
    def f(keys, byte_bits, lut_polys):
        ledger.observe(int(np.asarray(jnp.max(byte_bits))))
        n_lut = int(lut_polys.shape[-3])
        return jnp.ones((int(byte_bits.shape[0]), n_lut, 1), U64)
    return f


@contextlib.contextmanager
def _audit_context(ledger: _Ledger):
    from ..ops import wopbs
    f = _mock_many_wopbs(ledger)
    with mock.patch.object(wopbs, "many_wopbs", f), \
            mock.patch.object(wopbs, "many_wopbs_jit", f), \
            jax.disable_jit():
        yield


def _fresh(*shape) -> jnp.ndarray:
    """A level-1 (fresh encryption / bootstrap output) ciphertext stand-in."""
    return jnp.ones(shape, U64)


def audit_encrypt(params: ParamSet) -> dict[str, int]:
    from ..models import fhe_aes
    ledger = _Ledger()
    with _audit_context(ledger):
        out = fhe_aes.aes_encrypt(_StubKeys(params), _fresh(11, 16, 8, 1),
                                  _fresh(1, 16, 8, 1))
    return {"wopbs_in": ledger.max_wopbs_in,
            "output": int(np.asarray(jnp.max(out)))}


def audit_decrypt(params: ParamSet) -> dict[str, int]:
    from ..models import fhe_aes
    ledger = _Ledger()
    with _audit_context(ledger):
        out = fhe_aes.aes_decrypt(_StubKeys(params), _fresh(11, 16, 8, 1),
                                  _fresh(1, 16, 8, 1))
    return {"wopbs_in": ledger.max_wopbs_in,
            "output": int(np.asarray(jnp.max(out)))}


def audit_key_expansion(params: ParamSet) -> dict[str, int]:
    """Default schedule: trivial noise-FREE RCON encodings (level 0)."""
    from ..models import fhe_aes
    ledger = _Ledger()
    with _audit_context(ledger):
        rks = fhe_aes.aes_key_expansion(
            _StubKeys(params), _fresh(16, 8, 1),
            jnp.zeros((10, 8, 1), U64), rcon_fresh=False)
    return {"wopbs_in": ledger.max_wopbs_in,
            "output": int(np.asarray(jnp.max(rks)))}


def audit_key_expansion_pk(params: ParamSet) -> dict[str, int]:
    """Reference-faithful schedule: public-key RCON, fresh level 1."""
    from ..models import fhe_aes
    ledger = _Ledger()
    with _audit_context(ledger):
        rks = fhe_aes.aes_key_expansion(_StubKeys(params), _fresh(16, 8, 1),
                                        _fresh(10, 8, 1), rcon_fresh=True)
    return {"wopbs_in": ledger.max_wopbs_in,
            "output": int(np.asarray(jnp.max(rks)))}


def audit_ctr_step(params: ParamSet) -> dict[str, int]:
    """The bench/CLI unit: ripple-carry counter add + full AES encrypt."""
    from ..models import fhe_aes
    ledger = _Ledger()
    with _audit_context(ledger):
        # LUT stands-ins only need the n_lut axis (shape[-3]) the mock reads:
        # {8 sum bits + 1 carry} per ripple step (fhe_aes.add_scalar_luts).
        lut_lsb = jnp.zeros((1, 9, 1, 1), U64)
        luts_rest = jnp.zeros((15, 1, 9, 1, 1), U64)
        out = fhe_aes.ctr_step(_StubKeys(params), _fresh(11, 16, 8, 1),
                               _fresh(16, 8, 1), lut_lsb, luts_rest)
    return {"wopbs_in": ledger.max_wopbs_in,
            "output": int(np.asarray(jnp.max(out)))}


def audit_all(params: ParamSet) -> dict[str, dict[str, int]]:
    """Audit every circuit the framework ships; assert the noise budget.

    Raises AssertionError if any WoPBS input or client-visible output
    exceeds params.max_noise_level.
    """
    out = {
        "encrypt": audit_encrypt(params),
        "decrypt": audit_decrypt(params),
        "key_expansion": audit_key_expansion(params),
        "key_expansion_pk": audit_key_expansion_pk(params),
        "ctr_step": audit_ctr_step(params),
    }
    for name, levels in out.items():
        for where, lvl in levels.items():
            assert lvl <= params.max_noise_level, (
                f"{name}/{where}: noise level {lvl} exceeds budget "
                f"{params.max_noise_level}")
    return out
