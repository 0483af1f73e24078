"""Roofline study of the fused Pallas CMux kernel (VERDICT r1, weak #5).

Times blind_rotate at production parameters on the TPU, then re-times with
individual kernel stages stubbed out (script-local kernel variants) to
attribute the per-step cost: forward-NTT MXU dots, the r-unrolled VPU MAC
loop, twiddle+limb split, inverse-NTT MXU dot, explicit-CRT accumulate.

Usage: python scripts/tpu_kernel_ablate.py [batch [tb ...]]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def time_rotate(dkeys, params, small, test, label):
    from tfhe_aes_tpu.ops import pallas_blind_rotate as pbr
    from tfhe_aes_tpu.utils import profiling
    pbr._build_call.cache_clear()
    fn = jax.jit(lambda k, s, t: pbr.blind_rotate_pallas(
        k.rplan, params, k.bsk_limbs, s, t, k.fwd_full, k.inv_crt_full,
        k.rot_table))
    profiling.device_fence(fn(dkeys, small, test))  # compile+warm
    t0 = time.time()
    profiling.device_fence(fn(dkeys, small, test))
    dt = time.time() - t0
    n_steps = params.lwe_dimension
    print(f"{label:28s} {dt*1e3:9.1f} ms  ({dt/n_steps*1e6:7.1f} us/step)",
          flush=True)
    return dt


def make_ablated_kernel(ablate: set):
    """A copy of pallas_blind_rotate._kernel with stages stubbed."""
    from tfhe_aes_tpu.ops import ntt
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    I32 = jnp.int32
    U32 = jnp.uint32

    def _u32c(x):
        return jnp.uint32(x)

    def _kernel(params, plan, tb):
        n = params.polynomial_size
        kp1 = params.glwe_dimension + 1
        lev = params.pbs_level
        blog = params.pbs_base_log
        r_rows = kp1 * lev
        pcount = plan.n_primes
        q = plan.q_bits
        nbytes = (q + 7) // 8
        shift = q - blog * lev
        half_b = 1 << (blog - 1)
        wide = blog > 8
        dn = 2 * n if wide else n

        def kernel(consts_ref, m64b_ref, invp_ref,
                   acc_hi_ref, acc_lo_ref, wf_ref, inv_ref, g_ref, tw_ref,
                   out_hi_ref, out_lo_ref,
                   digits, s_lo, s_hi, acc64_hi,
                   acc64_lo, alpha):
            k = pl.program_id(1)
            p = consts_ref[k, 0]
            fp24 = consts_ref[k, 1]
            inv_p = invp_ref[k, 0]

            # Mirrors the production barrett exactly, including the
            # clamp=False call sites (ADVICE r3: the ablate copy must not
            # run extra correction selects the production kernel skips).
            def barrett(t, clamp=True):
                q = jnp.round(t.astype(jnp.float32) * inv_p).astype(I32)
                r = t - q * p
                if not clamp:
                    return r
                half = (p - 1) >> 1
                r = jnp.where(r > half, r - p, r)
                return jnp.where(r < -half, r + p, r)

            @pl.when(k == 0)
            def _decompose():
                if "decompose" not in ablate:
                    for u in range(kp1):
                        vhi = acc_hi_ref[u].astype(U32)
                        vlo = acc_lo_ref[u].astype(U32)
                        if shift > 0:
                            lo1 = vlo + _u32c(1 << (shift - 1))
                            hi1 = vhi + jnp.where(lo1 < vlo, _u32c(1),
                                                  _u32c(0))
                            vlo = ((hi1 << _u32c(32 - shift))
                                   | (lo1 >> _u32c(shift)))
                            vhi = hi1 >> _u32c(shift)
                        carry = jnp.zeros_like(vlo)
                        for l in range(lev - 1, -1, -1):
                            sh = blog * (lev - 1 - l)
                            if sh < 32:
                                raw = ((vlo >> _u32c(sh))
                                       & _u32c((1 << blog) - 1))
                                if sh + blog > 32:
                                    raw = raw | ((vhi << _u32c(32 - sh))
                                                 & _u32c((1 << blog) - 1))
                            else:
                                raw = ((vhi >> _u32c(sh - 32))
                                       & _u32c((1 << blog) - 1))
                            t = raw + carry
                            carry = jnp.where(t >= _u32c(half_b), _u32c(1),
                                              _u32c(0))
                            d = t.astype(I32) - (carry.astype(I32)
                                                 << jnp.int32(blog))
                            if wide:
                                h6 = (d + jnp.int32(32)) >> jnp.int32(6)
                                digits[u * lev + l, :, :n] = \
                                    (d - (h6 << jnp.int32(6))).astype(jnp.int8)
                                digits[u * lev + l, :, n:] = h6.astype(jnp.int8)
                            else:
                                digits[u * lev + l] = d.astype(jnp.int8)
                acc64_hi[...] = jnp.zeros_like(acc64_hi)
                acc64_lo[...] = jnp.zeros_like(acc64_lo)
                alpha[...] = jnp.zeros_like(alpha)

            # Interleaved dot/MAC per u (mirrors the production kernel,
            # incl. the round-4 unclamped fwd recombine)
            s_lo[...] = jnp.zeros_like(s_lo)
            s_hi[...] = jnp.zeros_like(s_hi)
            for u in range(kp1):
                if "fwd" not in ablate:
                    block = digits[u * lev:(u + 1) * lev].reshape(
                        lev * tb, dn)
                    out = jax.lax.dot_general(
                        block, wf_ref[k], (((1,), (0,)), ((), ())),
                        preferred_element_type=I32)
                    t = barrett(out[:, :n] + (out[:, n:] << jnp.int32(8)),
                                clamp=False)
                    dh = t.reshape(lev, tb, n)
                else:
                    dh = digits[u * lev:(u + 1) * lev, :, :n].astype(I32)
                if "mac" in ablate:
                    continue
                for l in range(lev):
                    r = u * lev + l
                    if "mac8" in ablate and r % 8:
                        continue
                    dr = dh[l]
                    for j in range(kp1):
                        glo = g_ref[0, r * 2 * kp1 + j].astype(I32)[None, :]
                        ghi = g_ref[0, r * 2 * kp1 + kp1 + j].astype(
                            I32)[None, :]
                        s_lo[j] += dr * glo
                        s_hi[j] += dr * ghi

            # Per-j software pipeline (production round-4 structure):
            # chain(j+1) emitted between dot(j) and crt(j).
            tw1 = tw_ref[0].astype(I32) - jnp.int32(1)

            def chain(j):
                if "twiddle" in ablate:
                    return jnp.zeros((tb, 2 * n), jnp.int8)
                r_hi = barrett(s_hi[j], clamp=False) * jnp.int32(256)
                u_ = s_lo[j] + r_hi
                qf = jnp.round((tw1.astype(jnp.float32)
                                * u_.astype(jnp.float32)) * inv_p).astype(I32)
                delta = barrett(tw1 * u_ - qf * p)
                h8 = (delta + jnp.int32(128)) >> jnp.int32(8)
                l8 = delta - (h8 << jnp.int32(8))
                return jnp.concatenate([l8, h8], axis=1).astype(jnp.int8)

            def crt_acc(j, zz):
                if "intt" not in ablate:
                    r2 = barrett(zz[:, n:], clamp=False)
                    z = barrett(zz[:, :n] + (r2 << jnp.int32(8)),
                                clamp=False)
                    y = jnp.where(z < 0, z + p, z)
                else:
                    y = jnp.zeros((tb, n), I32)
                sl = slice(j * tb, (j + 1) * tb)
                alpha[sl] += y * fp24
                if "crt" in ablate:
                    return
                yu = y.astype(U32)
                a_lo = acc64_lo[sl]
                a_hi = acc64_hi[sl]
                for i in range(nbytes):
                    pp = yu * consts_ref[k, 2 + i].astype(U32)
                    if i < 4:
                        lopart = pp << _u32c(8 * i)
                        hipart = (pp >> _u32c(32 - 8 * i)) if i > 0 \
                            else _u32c(0) * pp
                        new_lo = a_lo + lopart
                        a_hi = a_hi + hipart + jnp.where(
                            new_lo < lopart, _u32c(1), _u32c(0))
                        a_lo = new_lo
                    else:
                        a_hi = a_hi + (pp << _u32c(8 * i - 32))
                acc64_lo[sl] = a_lo
                acc64_hi[sl] = a_hi

            xj = chain(0)
            for j in range(kp1):
                if "intt" not in ablate:
                    zz = jax.lax.dot_general(
                        xj, inv_ref[k], (((1,), (0,)), ((), ())),
                        preferred_element_type=I32)
                else:
                    zz = jnp.zeros((tb, 2 * n), I32)
                if j + 1 < kp1:
                    xj = chain(j + 1)
                crt_acc(j, zz)

            @pl.when(k == pcount - 1)
            def _finalize():
                al = (alpha[...] + jnp.int32(1 << 23)) >> jnp.int32(24)
                alu = al.astype(U32)
                s_lo2 = jnp.zeros_like(alu)
                s_hi2 = jnp.zeros_like(alu)
                for i in range(nbytes):
                    pp = alu * m64b_ref[0, i].astype(U32)
                    if i < 4:
                        lopart = pp << _u32c(8 * i)
                        hipart = (pp >> _u32c(32 - 8 * i)) if i > 0 \
                            else _u32c(0) * pp
                        new_lo = s_lo2 + lopart
                        s_hi2 = s_hi2 + hipart + jnp.where(
                            new_lo < lopart, _u32c(1), _u32c(0))
                        s_lo2 = new_lo
                    else:
                        s_hi2 = s_hi2 + (pp << _u32c(8 * i - 32))
                d_lo = acc64_lo[...].astype(U32) - s_lo2
                borrow = jnp.where(acc64_lo[...].astype(U32) < s_lo2,
                                   _u32c(1), _u32c(0))
                d_hi = acc64_hi[...].astype(U32) - s_hi2 - borrow
                for u in range(kp1):
                    alo = acc_lo_ref[u].astype(U32)
                    ahi = acc_hi_ref[u].astype(U32)
                    dlo = d_lo[u * tb:(u + 1) * tb]
                    dhi = d_hi[u * tb:(u + 1) * tb]
                    nlo = alo + dlo
                    nhi = ahi + dhi + jnp.where(nlo < dlo, _u32c(1),
                                                _u32c(0))
                    out_lo_ref[u] = nlo
                    out_hi_ref[u] = nhi
        return kernel
    return _kernel


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    args = sys.argv[2:]
    params_name = "tpu" if "tpu" in args else "prod"
    tbs = [int(t) for t in args if t.isdigit()] or [256]
    from tfhe_aes_tpu.params import PARAM_OPT, PARAM_TPU
    from tfhe_aes_tpu.client.client import Client
    from tfhe_aes_tpu.utils import serialization
    from tfhe_aes_tpu.backend import numpy_backend as nb
    from tfhe_aes_tpu.ops import pallas_blind_rotate as pbr

    p = PARAM_TPU if params_name == "tpu" else PARAM_OPT
    cache = serialization.cache_path(p, 0)
    sk, dkeys = serialization.load_keys(cache)
    client = Client(p, seed=0)
    client.sk = sk
    dkeys = jax.device_put(dkeys)

    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, batch).astype(np.uint64)
    small = jnp.asarray(nb.lwe_encrypt(sk.lwe_key, bits << np.uint64(63),
                                       p.lwe_noise_std, rng))
    test = np.zeros((p.glwe_dimension + 1, p.polynomial_size), np.uint64)
    test[-1, :] = np.uint64(1) << np.uint64(60)
    test = jnp.asarray(test)

    print(f"# batch={batch}, v5e; full rotate = {p.lwe_dimension} CMux steps")
    orig_kernel = pbr._kernel
    for tb in tbs:
        os.environ["TFHE_AES_TPU_PALLAS_TB"] = str(tb)
        base = time_rotate(dkeys, p, small, test, f"full (tb={tb})")

    os.environ["TFHE_AES_TPU_PALLAS_TB"] = str(tbs[0])
    for ablate, label in [
            ({"mac"}, "no VPU-MAC loop"),
            ({"mac8"}, "MAC 1/8 rows"),
            ({"fwd", "mac"}, "no fwd-NTT, no MAC"),
            ({"intt"}, "no INTT dot"),
            ({"crt"}, "no CRT accumulate"),
            ({"twiddle"}, "no twiddle/limb-split"),
            ({"decompose"}, "no gadget decompose"),
    ]:
        pbr._kernel = make_ablated_kernel(ablate)
        try:
            time_rotate(dkeys, p, small, test, label)
        finally:
            pbr._kernel = orig_kernel
    pbr._build_call.cache_clear()
    print(f"# baseline tb={tbs[0]}: {base*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
