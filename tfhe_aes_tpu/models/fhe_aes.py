"""FHE AES-128 (CTR) on the batched WoPBS primitive layer — the "Server".

Reference counterpart: src/server/server.rs (facade), encrypt/decrypt modules
and key_expansion.  Layout: the state is [B, 16, 8, big+1] u64 — B CTR
blocks, 16 bytes column-major (state[4*col + row], shift_rows.rs:5-21), 8
one-bit blocks per byte LSB-first, each a big-LWE row.

XOR is u64 addition of ciphertext rows (message_modulus 2, no carry — the
reference's unchecked_add, server.rs:278-282).  All nonlinearity runs through
many-LUT WoPBS with the GF(2^8) multiple tables fused into the S-box LUTs
(sbox.rs:68-97), so MixColumns costs addition depth 4 and AddRoundKey 1 —
exactly the <=5-additions noise budget the parameters were optimized for
(README.md:176-180).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import wopbs
from ..ops.keys import DeviceKeys
from . import aes_plain, luts, tables

U64 = jnp.uint64

# Column-major ShiftRows permutation: new[i] = old[_SHIFT[i]].
SHIFT = tuple(aes_plain._SHIFT)
INV_SHIFT = tuple(aes_plain._INV_SHIFT)

# MixColumns as (byte index, variant) gathers over the fused-LUT outputs
# [x, mul2(x), mul3(x)] (variant order of many_sbox, sbox.rs:78-94).
# Row r of column c sums variants per the circulant matrix [2 3 1 1].
_MC_VAR = np.array([[1, 2, 0, 0],
                    [0, 1, 2, 0],
                    [0, 0, 1, 2],
                    [2, 0, 0, 1]])  # [row, which-input-byte] -> variant
# Inverse MixColumns over variants [mul9, mul11, mul13, mul14] (sbox.rs:73-77):
# matrix rows (14 11 13 9; 9 14 11 13; 13 9 14 11; 11 13 9 14).
_IMC_VAR = np.array([[3, 1, 2, 0],
                     [0, 3, 1, 2],
                     [2, 0, 3, 1],
                     [1, 2, 0, 3]])


def _mix_indices(var_table: np.ndarray):
    byte_idx = np.zeros((16, 4), dtype=np.int32)
    var_idx = np.zeros((16, 4), dtype=np.int32)
    for col in range(4):
        for row in range(4):
            o = 4 * col + row
            byte_idx[o] = 4 * col + np.arange(4)
            var_idx[o] = var_table[row]
    return byte_idx, var_idx


@functools.lru_cache(maxsize=None)
def _fwd_luts(params) -> np.ndarray:
    """3 fused LUTs {SBOX, mul2 o SBOX, mul3 o SBOX} -> [1, 24, C, N]."""
    s = tables.sbox()
    return luts.lut_polys_from_tables(
        params, np.stack([s, tables.gf_mul_table(2)[s],
                          tables.gf_mul_table(3)[s]]), 8)


@functools.lru_cache(maxsize=None)
def _inv_mul_luts(params) -> np.ndarray:
    """4 LUTs {mul9, mul11, mul13, mul14} (decrypt path)."""
    return luts.lut_polys_from_tables(
        params, np.stack([tables.gf_mul_table(c) for c in (9, 11, 13, 14)]), 8)


@functools.lru_cache(maxsize=None)
def _sbox_lut(params, inv: bool) -> np.ndarray:
    t = tables.inv_sbox() if inv else tables.sbox()
    return luts.lut_polys_from_tables(params, t[None], 8)


@functools.lru_cache(maxsize=None)
def _identity_lut(params) -> np.ndarray:
    """Noise-refresh LUT for key expansion (server.rs:118-119)."""
    return luts.lut_polys_from_tables(
        params, np.arange(256, dtype=np.uint64)[None], 8)


def add_round_key(state, rk):
    """XOR = componentwise u64 LWE addition (server.rs:278-282)."""
    return state + rk


def shift_rows(state):
    return state[:, SHIFT, ...]


def inv_shift_rows(state):
    return state[:, INV_SHIFT, ...]


def _byte_wopbs(keys: DeviceKeys, state, lut):
    """Apply a LUT stack to every byte: [B,16,8,big+1] -> [B,16,L,big+1]."""
    B = state.shape[0]
    flat = state.reshape((B * 16,) + state.shape[2:])
    out = wopbs.many_wopbs_jit(keys, flat, jnp.asarray(lut))
    return out.reshape((B, 16) + out.shape[1:])


def _mix(mul_state, var_table):
    """mul_state [B,16,V,8,big+1] -> state [B,16,8,big+1] via 4-term sums."""
    byte_idx, var_idx = _mix_indices(var_table)
    gathered = mul_state[:, byte_idx, var_idx]     # [B,16,4,8,big+1]
    return gathered.sum(axis=2, dtype=U64)


def aes_encrypt(keys: DeviceKeys, round_keys, state):
    """Batched AES-128 encryption (server.rs:39-64).

    round_keys: [11, 16, 8, big+1]; state: [B, 16, 8, big+1]."""
    p = keys.params
    state = add_round_key(state, round_keys[0])
    for rnd in range(1, 10):
        mul = _byte_wopbs(keys, state, _fwd_luts(p))       # [B,16,24,big+1]
        mul = mul.reshape(mul.shape[:2] + (3, 8) + mul.shape[3:])
        mul = shift_rows(mul)                              # permute bytes
        state = _mix(mul, _MC_VAR)                         # depth-4 adds
        state = add_round_key(state, round_keys[rnd])
    out = _byte_wopbs(keys, state, _sbox_lut(p, inv=False))  # final SubBytes
    state = shift_rows(out)
    return add_round_key(state, round_keys[10])


def aes_decrypt(keys: DeviceKeys, round_keys, state):
    """Batched AES-128 decryption (server.rs:67-105): ~2x encrypt cost —
    the round-key add between InvSubBytes and InvMixColumns forces a second
    many-LUT pass for the mul9/11/13/14 multiples."""
    p = keys.params
    state = add_round_key(state, round_keys[10])
    for rnd in range(10, 1, -1):
        state = inv_shift_rows(state)
        state = _byte_wopbs(keys, state, _sbox_lut(p, inv=True))
        state = add_round_key(state, round_keys[rnd - 1])
        mul = _byte_wopbs(keys, state, _inv_mul_luts(p))   # [B,16,32,big+1]
        mul = mul.reshape(mul.shape[:2] + (4, 8) + mul.shape[3:])
        state = _mix(mul, _IMC_VAR)
    state = inv_shift_rows(state)
    state = _byte_wopbs(keys, state, _sbox_lut(p, inv=True))
    return add_round_key(state, round_keys[0])


# ---------------------------------------------------------------------------
# Key expansion (server.rs:107-167)
# ---------------------------------------------------------------------------

def aes_key_expansion(keys: DeviceKeys, enc_key, rcon_cts):
    """enc_key [16, 8, big+1] -> round keys [11, 16, 8, big+1].

    rcon_cts: [10, 8, big+1] — RCON bytes encrypted server-side with the
    public key (server.rs:139-140).  Every generated word is noise-refreshed
    through an identity WoPBS (server.rs:150), so all round-key bytes exit at
    nominal noise.
    """
    p = keys.params
    ident = jnp.asarray(_identity_lut(p))
    sbox_l = jnp.asarray(_sbox_lut(p, inv=False))
    w = [enc_key[4 * i:4 * i + 4] for i in range(4)]   # words: [4,8,big+1]
    for i in range(4, 44):
        temp = w[i - 1]
        if i % 4 == 0:
            temp = temp[np.array([1, 2, 3, 0])]        # RotWord (free)
            temp = wopbs.many_wopbs_jit(keys, temp, sbox_l)  # SubWord
            temp = temp.at[0].add(rcon_cts[i // 4 - 1])
        new = w[i - 4] + temp
        new = wopbs.many_wopbs_jit(keys, new, ident)   # noise refresh
        w.append(new)
    rks = [jnp.concatenate(w[4 * i:4 * i + 4], axis=0) for i in range(11)]
    return jnp.stack(rks)


# ---------------------------------------------------------------------------
# Homomorphic CTR increment (server.rs:172-274), exact-carry version
# ---------------------------------------------------------------------------

def add_scalar_luts(params, i_bytes: np.ndarray):
    """Host-side LUT construction for add_scalar.

    i_bytes: numpy [B, 16], byte decomposition (MSB-first) of each block's
    counter offset.  Returns (lut_lsb [B,9,C8,N], luts_rest [15,B,9,C9,N]):
    per-block {sum, carry} tables — 8 sum bits + 1 carry bit per step.
    """
    x8 = np.arange(256)
    i_lsb = i_bytes[:, 15].astype(np.uint64)
    t_sum = ((x8[None] + i_lsb[:, None]) % 256).astype(np.uint64)
    t_car = ((x8[None] + i_lsb[:, None]) > 255).astype(np.uint64)
    lut_lsb = np.concatenate([
        luts.lut_polys_per_batch(params, t_sum[:, None], 8, out_bits=8),
        luts.lut_polys_per_batch(params, t_car[:, None], 8, out_bits=1)],
        axis=1)

    x9 = np.arange(512)
    rest = []
    for idx in range(14, -1, -1):
        ib = i_bytes[:, idx].astype(np.uint64)
        val = (x9[None] & 0xFF) + (x9[None] >> 8) + ib[:, None]
        t_sum = (val % 256).astype(np.uint64)
        t_car = (val > 255).astype(np.uint64)
        rest.append(np.concatenate([
            luts.lut_polys_per_batch(params, t_sum[:, None], 9, out_bits=8),
            luts.lut_polys_per_batch(params, t_car[:, None], 9, out_bits=1)],
            axis=1))
    return lut_lsb, np.stack(rest)


def add_scalar_device(keys: DeviceKeys, state, lut_lsb, luts_rest):
    """Pure-JAX ripple-carry add: state [B,16,8,big+1] += counters.

    16 sequential 9-bit many-LUT WoPBS steps, one CBS each (the reference's
    structure, server.rs:181-252).

    Deviation from the reference (documented): the reference's LSB carry LUT
    tests `x + i > 255` with the FULL scalar i (server.rs:182), which is only
    correct for i < 256; we use the exact per-byte carry (SURVEY.md 3.4).
    """
    out = wopbs.many_wopbs_jit(keys, state[:, 15], lut_lsb)
    new_bytes = {15: out[:, :8]}
    carry = out[:, 8:9]                                # [B,1,big+1]
    for step, idx in enumerate(range(14, -1, -1)):
        bits9 = jnp.concatenate([state[:, idx], carry], axis=1)
        out = wopbs.many_wopbs_jit(keys, bits9, luts_rest[step])
        new_bytes[idx] = out[:, :8]
        carry = out[:, 8:9]
    return jnp.stack([new_bytes[i] for i in range(16)], axis=1)


def add_scalar(keys: DeviceKeys, state, i_bytes: np.ndarray):
    """Convenience wrapper: build LUTs on host, run the device ripple-add."""
    lut_lsb, luts_rest = add_scalar_luts(keys.params, i_bytes)
    return add_scalar_device(keys, state, jnp.asarray(lut_lsb),
                             jnp.asarray(luts_rest))


def ctr_keystream(keys: DeviceKeys, round_keys, enc_iv, n_blocks: int,
                  offset: int = 0):
    """FHE keystream blocks AES(key, iv + offset + t), t = 0..n_blocks-1.

    The CTR batch axis is the framework's data-parallel axis (main.rs:55-64's
    rayon loop, reborn as one device batch / shard_map axis).
    """
    state = jnp.broadcast_to(enc_iv[None], (n_blocks,) + enc_iv.shape)
    i_bytes = counter_bytes(n_blocks, offset)
    state = add_scalar(keys, state, i_bytes)
    return aes_encrypt(keys, round_keys, state)


def counter_bytes(n_blocks: int, offset: int = 0) -> np.ndarray:
    """[B, 16] MSB-first byte decomposition of offsets offset..offset+B-1."""
    return np.stack([
        np.array(aes_plain.u128_to_bytes_be((offset + t) % (1 << 128)),
                 dtype=np.uint64)
        for t in range(n_blocks)])
