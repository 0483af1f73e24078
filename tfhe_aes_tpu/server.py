"""Server (untrusted evaluator) facade — the trust-boundary API.

Reference counterpart: `Server::new(public_key, sks, wopbs_key)`
(/root/reference/src/server/server.rs:31-35, constructed at main.rs:43-45).
A Server holds ONLY material that crosses the client->server trust boundary:

  * the evaluation keys (BSK/KSK/PFPKSK in device layout, ops/keys.DeviceKeys),
  * the LWE public key (client.PublicKey — zero-encryptions, no secrets),
  * its own RNG for public-key encryption randomness (non-secret).

Everything it computes takes encrypted inputs (the bit-encrypted AES key and
IV) and public constants.  In particular RCON is public-key-encrypted HERE,
on the server side, with the server's randomness — the reference does the
same at server.rs:139-140 (`public_key.encrypt_radix_without_padding`);
earlier rounds of this framework encrypted RCON in the CLI with the client's
RNG, which blurred the boundary the reference models.

The compute methods are thin, stateful-key-binding wrappers over the
functional batched circuits in models/fhe_aes.py (which remain the unit the
bench/mesh runners jit and shard).
"""

from __future__ import annotations

import numpy as np

from .ops.keys import DeviceKeys
from .models import fhe_aes, tables


class Server:
    def __init__(self, dkeys: DeviceKeys, public_key=None,
                 rng: np.random.Generator | None = None):
        """public_key: client.client.PublicKey (optional — only needed for
        the reference-faithful pk-RCON key-expansion schedule); rng: server
        randomness for pk encryption (OS entropy by default)."""
        from .utils import csprng
        self.dkeys = dkeys
        self.public_key = public_key
        self.rng = rng if rng is not None else csprng.default_rng(None)

    # -- server-side constant encryption (server.rs:139-140) ----------------
    def encrypt_rcon(self) -> np.ndarray:
        """Public-key-encrypt the 10 RCON bytes: [10, 8, big+1] u64.

        RCON is a public constant (key_expansion_utils.rs:10-12); the server
        encrypts it itself so key expansion can add it to ciphertexts —
        no client involvement, no secret key."""
        assert self.public_key is not None, "pk-RCON needs the public key"
        rcon_bits = np.stack([
            np.array([(int(r) >> j) & 1 for j in range(8)], dtype=np.uint64)
            for r in tables.RCON])
        return self.public_key.encrypt_bits(rcon_bits, self.rng)

    # -- AES circuit (server.rs:39-167) -------------------------------------
    def aes_key_expansion(self, enc_key, *, pk_rcon: bool = False):
        """enc_key [16, 8, big+1] -> round keys [11, 16, 8, big+1].

        pk_rcon=False (default): trivial noise-free RCON encodings and the
        1-WoPBS/round schedule (documented deviation, fhe_aes.trivial_rcon),
        dispatched through the staged single-compiled-WoPBS driver (fast
        cold start).  pk_rcon=True: reference-faithful — RCON public-key-
        encrypted by THIS server object (3-WoPBS schedule)."""
        if pk_rcon:
            import jax.numpy as jnp
            rcon = jnp.asarray(self.encrypt_rcon())
            return fhe_aes.aes_key_expansion_jit(self.dkeys, enc_key, rcon)
        return fhe_aes.aes_key_expansion_staged(self.dkeys, enc_key)

    def aes_encrypt(self, round_keys, state):
        return fhe_aes.aes_encrypt_jit(self.dkeys, round_keys, state)

    def aes_decrypt(self, round_keys, state):
        return fhe_aes.aes_decrypt_jit(self.dkeys, round_keys, state)

    def add_scalar(self, state, i_bytes: np.ndarray):
        """Homomorphic counter add (server.rs:172-274, exact-carry)."""
        return fhe_aes.add_scalar(self.dkeys, state, i_bytes)

    def ctr_keystream(self, round_keys, enc_iv, n_blocks: int,
                      offset: int = 0):
        """FHE keystream AES(key, iv + offset + t), t < n_blocks."""
        return fhe_aes.ctr_keystream(self.dkeys, round_keys, enc_iv,
                                     n_blocks, offset)
