"""Device-accelerated key generation.

Production keygen is dominated by GLWE mask-times-secret negacyclic products
(~50k polynomial multiplications for BSK + PFPKSK) and by staging the BSK in
the NTT domain.  Both are exactly the workloads the device kernels already
implement, so keygen itself runs on the accelerator: masks are sampled on the
host (numpy CSPRNG), the exact u64 products a_i * S_i run through the RNS-NTT
pipeline in chunks, and noise/messages are added on the host.

Outputs are bit-for-bit the same *distribution* as backend.numpy_backend's
generators (same layouts, same conventions) — validated in tests by phase
roundtrips and by running the full WoPBS pipeline on fast-generated keys.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..params import ParamSet
from ..utils import crt, torus
from ..backend import numpy_backend as nb
from ..ops import keys as keys_mod
from ..ops import ntt

U64 = np.uint64


def _make_mask_dot(plan: ntt.NttPlan):
    """Returns jitted fn: (a [M, k, N] u64, shat [P,k,1,N]) -> [M, N] u64
    computing sum_i a_i * S_i exactly mod 2^64."""

    def f(a_u64, shat, fwd_limbs, inv_crt_limbs):
        res = ntt.u64_to_residues(plan, a_u64)          # [P, M, k, N]
        ahat = ntt.ntt_fwd_residues(plan, res, fwd_limbs)
        prod = ntt.mac_shared(plan, ahat, shat)         # [P, M, 1, N]
        return ntt.intt_crt_u64(plan, prod, inv_crt_limbs)[:, 0]

    return jax.jit(f)


def glwe_encrypt_fast(plan: ntt.NttPlan, glwe_key: np.ndarray,
                      msgs: np.ndarray, std: float,
                      rng: np.random.Generator,
                      chunk: int = 4096) -> np.ndarray:
    """Device-accelerated nb.glwe_encrypt: msgs [..., N] -> [..., k+1, N]."""
    k, n = glwe_key.shape
    lead = msgs.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    msgs2 = msgs.reshape(m, n)
    a = rng.integers(0, 1 << 64, size=(m, k, n), dtype=np.uint64)
    e = torus.sample_gaussian_torus(rng, std, (m, n))

    shat_np = np.stack([
        crt.ntt_fwd_host(glwe_key.astype(np.int64), p)
        for p in plan.primes])                            # [P, k, N] canonical
    from ..ops import modular
    shat_np = np.stack([modular.host_balanced(shat_np[i], p)
                        for i, p in enumerate(plan.primes)]).astype(np.int32)
    shat = jnp.asarray(shat_np)[:, :, None, :]            # [P, k, 1, N]
    fwd = jnp.asarray(plan.fwd_limbs)
    inv_crt = jnp.asarray(plan.inv_crt_limbs)
    dot = _make_mask_dot(plan)

    b = msgs2 + e
    for lo in range(0, m, chunk):
        hi = min(lo + chunk, m)
        conv = np.asarray(dot(jnp.asarray(a[lo:hi]), shat, fwd, inv_crt))
        b[lo:hi] += conv
    out = np.concatenate([a, b[:, None, :]], axis=1)      # [m, k+1, n]
    return out.reshape(lead + (k + 1, n))


def bsk_gen_fast(sk: nb.SecretKeys, rng: np.random.Generator,
                 plan: ntt.NttPlan) -> np.ndarray:
    p = sk.params
    k, n = p.glwe_dimension, p.polynomial_size
    lev = p.pbs_level
    zeros = glwe_encrypt_fast(
        plan, sk.glwe_key,
        np.zeros((p.lwe_dimension, lev, k + 1, n), np.uint64),
        p.glwe_noise_std, rng)
    for l in range(lev):
        g = U64((1 << (64 - p.pbs_base_log * (l + 1))) % (1 << 64))
        for u in range(k + 1):
            zeros[:, l, u, u, 0] += sk.lwe_key * g
    return zeros


def pfpksk_gen_fast(sk: nb.SecretKeys, rng: np.random.Generator,
                    plan: ntt.NttPlan) -> np.ndarray:
    p = sk.params
    k, n = p.glwe_dimension, p.polynomial_size
    big = p.big_lwe_dimension
    bigkey = sk.big_lwe_key
    msgs = np.zeros((k + 1, big + 1, p.pfks_level, n), dtype=np.uint64)
    for u in range(k + 1):
        if u < k:
            sigma = (U64(0) - sk.glwe_key[u])
        else:
            sigma = np.zeros(n, dtype=np.uint64)
            sigma[0] = U64(1)
        for l in range(p.pfks_level):
            g = U64((1 << (64 - p.pfks_base_log * (l + 1))) % (1 << 64))
            msgs[u, :big, l] = (U64(0) - bigkey[:, None]) * sigma[None, :] * g
            msgs[u, big, l] = sigma * g
    return glwe_encrypt_fast(plan, sk.glwe_key, msgs, p.glwe_noise_std, rng)


def make_device_keys_fast(sk: nb.SecretKeys, rng: np.random.Generator,
                          primes=None) -> keys_mod.DeviceKeys:
    """Device-accelerated equivalent of keys.make_device_keys."""
    p = sk.params
    plan = ntt.make_plan(p.polynomial_size, primes or crt.ntt_primes())
    rplan = keys_mod.make_rotate_plan(p)

    bsk = bsk_gen_fast(sk, rng, plan)
    ksk = nb.ksk_gen(sk, rng)          # LWE-level: already cheap on host
    pfp = pfpksk_gen_fast(sk, rng, plan)

    # BSK NTT staging on device, preserving pack_bsk's layout and values:
    # cancel mask rounding errors into the bodies (host, exact f64 convs),
    # round to the rotate domain's q' bits, take balanced residues of the
    # scaled-back value, unscale by (2^(64-q'))^-1 mod p (== host
    # poly_to_ntt_residues_host's shift trick), forward NTT.
    n_lwe, lev, kp1, _, n = bsk.shape
    rows = bsk.transpose(0, 2, 1, 3, 4).reshape(-1, kp1, n)
    rows = keys_mod.cancel_mask_rounding(rows, sk.glwe_key, rplan.q_bits)
    rows = rows.reshape(-1, n)
    rfwd = jnp.asarray(rplan.fwd_limbs)
    q = rplan.q_bits
    from ..ops import modular
    inv2s = np.stack([modular.host_balanced(
        pow(pow(2, 64 - q, pk), pk - 2, pk), pk)
        for pk in rplan.primes]).astype(np.int32) if q < 64 else None
    p_c = rplan.p_i32.reshape(-1, 1, 1)
    ip_c = rplan.inv_f32.reshape(-1, 1, 1)

    @jax.jit
    def stage(x):
        if q < 64:
            x = (x + (jnp.uint64(1) << jnp.uint64(63 - q))) \
                >> jnp.uint64(64 - q)
            x = x << jnp.uint64(64 - q)
        res = ntt.u64_to_residues(rplan, x)             # [P, M, N] balanced
        if q < 64:   # |res * inv2| <= (p/2)^2 < 2^30: one Barrett
            res = modular.barrett_reduce(
                res * jnp.asarray(inv2s).reshape(-1, 1, 1),
                jnp.asarray(p_c), jnp.asarray(ip_c))
        return ntt.ntt_fwd_residues(rplan, res, rfwd).astype(jnp.int16)

    outs = []
    chunk = 16384
    for lo in range(0, rows.shape[0], chunk):
        outs.append(np.asarray(stage(jnp.asarray(rows[lo:lo + chunk]))))
    res = np.concatenate(outs, axis=1)                  # [P, M, N]
    bsk_ntt = np.ascontiguousarray(
        res.reshape(rplan.n_primes, n_lwe, kp1 * lev, kp1, n)
        .transpose(1, 0, 2, 3, 4).astype(np.int16))

    return keys_mod.DeviceKeys(
        params=p, plan=plan, rplan=rplan,
        bsk_limbs=keys_mod.bsk_residues_to_device(bsk_ntt),
        ksk_limbs=keys_mod.pack_ksk(p, ksk),
        pfpksk_limbs=keys_mod.pack_pfpksk(p, pfp),
        fwd_limbs=plan.fwd_limbs,
        inv_crt_limbs=plan.inv_crt_limbs,
        rfwd_limbs=rplan.fwd_limbs,
        rinv_crt_limbs=rplan.inv_crt_limbs,
        fwd_full=ntt.fwd_cat_for(rplan, p.pbs_base_log),
        inv_crt_full=ntt.inv_crt_full_host(rplan),
        rot_table=ntt.rot_table_merged(rplan),
        vp_fwd3=ntt.fwd_cat3_host(plan),
        vp_inv_full=ntt.inv_crt_full_host(plan),
    )
