"""Fused Pallas vertical packing — the WoPBS tail's CMux rotations as ONE
kernel (round-4 VERDICT #4).

The XLA vertical packing (ops/vertical_packing.py) is elementwise/HBM-bound:
each of the nbits CMux steps round-trips [B, L, k+1, N]-sized u64/int32
arrays through HBM between the decompose, the NTT dots, the unrolled limb
MAC, and the explicit-CRT reconstruction (measured 275 ms of a 1.7 s WoPBS
at 256 bytes).  Here the whole rotation phase runs per (LUT output l,
byte tile) with the accumulator resident in VMEM across the step axis —
the same organization as the blind-rotate kernel (ops/pallas_blind_rotate),
reusing its merged-prime-plane machinery in the mod-2^64 TORUS domain:

    per grid cell (l, byte tile t, step s = selector bit LSB-first):
      s == 0:   copy the accumulator GLWE block into u32 hi/lo scratch
      each s:   rotated = X^(-2^s) * acc   (lane roll + negacyclic sign)
                diff = rotated - acc       (two-plane borrow subtract)
                decompose diff: ONE base-2^15 digit level (cbs_base 15 x
                  cbs_level 1), split into three base-2^5 int8 limbs
                digits @ fwd_cat3          (one MXU dot, all primes)
                per output component j: 2R-multiply MAC against the byte's
                  GGSW limb planes, per-prime INTT dots, merged CRT
                acc += delta  (exact explicit-CRT mod 2^64)
      s == nbits-1: store the accumulator block.

Scope: the production shapes (2^nbits <= N, C == 1, cbs_level == 1 — true
for every shipped parameter set at N = 512).  The CMux *tree* over high
bits (toy N = 128 LUTs) stays on the XLA path.

Reference counterpart: the vertical_packing call at
/root/reference/src/server/sbox/many_wopbs.rs:267-279.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import ParamSet
from . import ntt

I32 = jnp.int32
U32 = jnp.uint32


def _u32c(x):
    return jnp.uint32(x)


def _crt_limb_bits(plan: ntt.NttPlan) -> int:
    """Widest CRT limb with sum_k y_k * c_k int32-exact (y < 1.5p)."""
    pmax = int(np.max(plan.p_i32))
    for bits in (12, 10, 8, 6, 4):
        if 1.5 * pmax * ((1 << bits) - 1) * plan.n_primes < 2 ** 31:
            return bits
    raise AssertionError("no safe CRT limb width for this prime basis")


def _kernel(params: ParamSet, plan: ntt.NttPlan, tb: int, nbits: int):
    n = params.polynomial_size
    kp1 = params.glwe_dimension + 1
    blog = params.cbs_base_log
    pcount = plan.n_primes
    pn = pcount * n
    clb = _crt_limb_bits(plan)
    ncl = (64 + clb - 1) // clb
    kt = kp1 * tb
    assert params.cbs_level == 1 and blog <= 15
    assert (1 << nbits) <= 2 * n, "rotations X^(-2^j) must stay in-ring"
    half_b = 1 << (blog - 1)
    dshift = 64 - blog                   # digit = top blog bits, rounded

    def kernel(mlimb_ref, pplane_ref, invp_ref, fp24_ref, cb_ref,
               acc_hi_ref, acc_lo_ref, fwd_ref, inv_ref, g_ref,
               out_hi_ref, out_lo_ref,
               accs_hi, accs_lo, digits, ys):
        s = pl.program_id(2)
        pv = pplane_ref[...]
        inv_pv = invp_ref[...]
        halfv = (pv - jnp.int32(1)) >> jnp.int32(1)

        def barrett(t, clamp=True):
            qv = jnp.round(t.astype(jnp.float32) * inv_pv).astype(I32)
            r = t - qv * pv
            if not clamp:
                return r
            r = jnp.where(r > halfv, r - pv, r)
            return jnp.where(r < -halfv, r + pv, r)

        @pl.when(s == 0)
        def _load_acc():
            for u in range(kp1):
                accs_hi[u * tb:(u + 1) * tb] = acc_hi_ref[0, u]
                accs_lo[u * tb:(u + 1) * tb] = acc_lo_ref[0, u]

        a_hi = accs_hi[...]
        a_lo = accs_lo[...]

        # -- rotated = X^(-2^s) * acc: out_i = in_{i+c}, negated on wrap ----
        # The rotation amount is data-INdependent (static per step), unlike
        # the blind rotate's X^a — so it is a lane roll, not a twiddle.
        # lax.switch over the nbits cases keeps the roll shifts static.
        lane = jax.lax.broadcasted_iota(I32, (kt, n), 1)

        def make_rot(c):
            def rot():
                # shift as explicit i32: a python int lifts to i64 under
                # x64 and tpu.dynamic_rotate requires i32
                rh = pltpu.roll(a_hi, jnp.int32(n - c), 1)
                rl = pltpu.roll(a_lo, jnp.int32(n - c), 1)
                neg_l = _u32c(0) - rl
                neg_h = _u32c(0) - rh - jnp.where(rl != _u32c(0),
                                                  _u32c(1), _u32c(0))
                wrap = lane >= jnp.int32(n - c)
                return (jnp.where(wrap, neg_h, rh),
                        jnp.where(wrap, neg_l, rl))
            return rot

        r_hi, r_lo = jax.lax.switch(
            s, [make_rot(1 << j) for j in range(nbits)])

        # -- diff = rotated - acc (mod 2^64, two-plane borrow) --------------
        d_lo = r_lo - a_lo
        borrow = jnp.where(r_lo < a_lo, _u32c(1), _u32c(0))
        d_hi = r_hi - a_hi - borrow

        # -- decompose: ONE balanced base-2^15 digit from the top bits ------
        # vbar = round(diff / 2^(64-15)); the u32 wrap of the rounding carry
        # is the correct mod-2^64 behavior (digit taken mod B).
        vbar = (d_hi + _u32c(1 << (dshift - 33))) >> _u32c(dshift - 32)
        raw = vbar & _u32c((1 << blog) - 1)
        carry = jnp.where(raw >= _u32c(half_b), _u32c(1), _u32c(0))
        d = raw.astype(I32) - (carry.astype(I32) << jnp.int32(blog))
        # three base-2^5 limbs, |limb| <= 16 (fwd_cat3 row-block scales)
        h5 = (d + jnp.int32(512)) >> jnp.int32(10)
        mid = d - (h5 << jnp.int32(10))
        m5 = (mid + jnp.int32(16)) >> jnp.int32(5)
        digits[:, :n] = (mid - (m5 << jnp.int32(5))).astype(jnp.int8)
        digits[:, n:2 * n] = m5.astype(jnp.int8)
        digits[:, 2 * n:] = h5.astype(jnp.int8)

        # -- forward NTT: one dot, all primes -------------------------------
        out = jax.lax.dot_general(
            digits[...], fwd_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=I32)                  # [kt, 2PN]
        dh = barrett(out[:, :pn] + (out[:, pn:] << jnp.int32(8)),
                     clamp=False)                        # [kt, PN], <=1.5p

        # -- per-j: MAC + INTT + merged post-reduction ----------------------
        # MAC bounds: |dh| <= 1.5p < 2^16.6, g limbs int8: products
        # <= 1.5p*128 < 2^23.6, kp1-term sums < 2^26 — int32-safe.
        # delta IS clamped (limb split needs |.| <= p/2).
        def chain(j):
            s_lo = s_hi = None
            for u in range(kp1):
                d_u = dh[u * tb:(u + 1) * tb]
                base = u * 2 * kp1
                glo = g_ref[0, base + j].astype(I32)
                ghi = g_ref[0, base + kp1 + j].astype(I32)
                plo = d_u * glo
                phi = d_u * ghi
                s_lo = plo if s_lo is None else s_lo + plo
                s_hi = phi if s_hi is None else s_hi + phi
            r2 = barrett(s_hi, clamp=False) * jnp.int32(256)
            delta = barrett(s_lo + r2)                   # <= 2^26 in
            h8 = (delta + jnp.int32(128)) >> jnp.int32(8)
            l8 = delta - (h8 << jnp.int32(8))
            return l8.astype(jnp.int8), h8.astype(jnp.int8)

        xl, xh = chain(0)
        for j in range(kp1):
            zz_lo_parts, zz_hi_parts = [], []
            for k in range(pcount):
                l8k = xl[:, k * n:(k + 1) * n]
                h8k = xh[:, k * n:(k + 1) * n]
                zz = (jax.lax.dot_general(
                          l8k, inv_ref[k, :n, :], (((1,), (0,)), ((), ())),
                          preferred_element_type=I32)
                      + jax.lax.dot_general(
                          h8k, inv_ref[k, n:, :], (((1,), (0,)), ((), ())),
                          preferred_element_type=I32))   # [tb, 2N]
                zz_lo_parts.append(zz[:, :n])
                zz_hi_parts.append(zz[:, n:])
            if j + 1 < kp1:
                xl, xh = chain(j + 1)
            zz_lo = jnp.concatenate(zz_lo_parts, axis=1)
            zz_hi = jnp.concatenate(zz_hi_parts, axis=1)
            r2 = barrett(zz_hi, clamp=False)
            z = barrett(zz_lo + (r2 << jnp.int32(8)), clamp=False)
            ys[j * tb:(j + 1) * tb] = jnp.where(z < 0, z + pv, z)

        # -- ONE tall explicit-CRT pass (see pallas_blind_rotate; q = 64,
        # so ncl limb planes and a 3-limb alpha*M) -------------------------
        yv = ys[...]                                     # [kt, PN] i32

        def segsum(t):
            acc = t[:, :n]
            for k in range(1, pcount):
                acc = acc + t[:, k * n:(k + 1) * n]
            return acc

        af = yv * fp24_ref[...]
        al = (segsum(af) + jnp.int32(1 << 23)) >> jnp.int32(24)
        alu = al.astype(U32)                             # <= ceil(1.5P)

        c_lo = c_hi = None
        for i in range(ncl):
            si = segsum(yv * cb_ref[i:i + 1, :]).astype(U32)
            sh = clb * i
            if sh == 0:
                c_lo, c_hi = si, jnp.zeros_like(si)
            elif sh < 32:
                t = si << _u32c(sh)
                nlo = c_lo + t
                c_hi = c_hi + (si >> _u32c(32 - sh)) \
                    + jnp.where(nlo < t, _u32c(1), _u32c(0))
                c_lo = nlo
            else:
                c_hi = c_hi + (si << _u32c(sh - 32))

        p0 = alu * mlimb_ref[0, 0].astype(U32)           # < 2^28 each
        p1 = alu * mlimb_ref[0, 1].astype(U32)
        p2 = alu * mlimb_ref[0, 2].astype(U32)
        t24 = p1 << _u32c(24)
        s_lo = p0 + t24
        s_hi = (p1 >> _u32c(8)) + (p2 << _u32c(16)) \
            + jnp.where(s_lo < t24, _u32c(1), _u32c(0))

        dd_lo = c_lo - s_lo
        borrow2 = jnp.where(c_lo < s_lo, _u32c(1), _u32c(0))
        dd_hi = c_hi - s_hi - borrow2

        nlo = a_lo + dd_lo
        nhi = a_hi + dd_hi + jnp.where(nlo < dd_lo, _u32c(1), _u32c(0))
        accs_lo[...] = nlo
        accs_hi[...] = nhi

        @pl.when(s == nbits - 1)
        def _store_acc():
            for u in range(kp1):
                out_hi_ref[0, u] = accs_hi[u * tb:(u + 1) * tb]
                out_lo_ref[0, u] = accs_lo[u * tb:(u + 1) * tb]

    return kernel


def _resolve_tb(n_bytes: int) -> int:
    import os
    tb_max = int(os.environ.get("TFHE_AES_TPU_VP_TB", "64"))
    for tb in (128, 64, 32, 16, 8):
        if tb <= tb_max and n_bytes % tb == 0:
            return tb
    return n_bytes


@functools.lru_cache(maxsize=None)
def _build_call(params: ParamSet, plan: ntt.NttPlan, n_bytes: int,
                n_l: int, tb: int, nbits: int, interpret: bool):
    """pallas_call + numpy constants (NOTHING jnp here — lru-cached across
    traces, see pallas_blind_rotate._build_call)."""
    n = params.polynomial_size
    kp1 = params.glwe_dimension + 1
    r2j = kp1 * 2 * kp1                  # cbs_level == 1
    pcount = plan.n_primes
    pn = pcount * n
    clb = _crt_limb_bits(plan)
    ncl = (64 + clb - 1) // clb
    kern = _kernel(params, plan, tb, nbits)

    def _i(*vals):
        return tuple(jnp.asarray(v, jnp.int32) for v in vals)

    acc_spec = pl.BlockSpec((1, kp1, tb, n), lambda l, t, s: _i(l, 0, t, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_l, n_bytes // tb, nbits),
        in_specs=[
            pl.BlockSpec((1, 3), lambda l, t, s: _i(0, 0),
                         memory_space=pltpu.SMEM),        # M 24-bit limbs
            pl.BlockSpec((1, pn), lambda l, t, s: _i(0, 0),
                         memory_space=pltpu.VMEM),        # p plane
            pl.BlockSpec((1, pn), lambda l, t, s: _i(0, 0),
                         memory_space=pltpu.VMEM),        # 1/p plane
            pl.BlockSpec((1, pn), lambda l, t, s: _i(0, 0),
                         memory_space=pltpu.VMEM),        # fp24 plane
            pl.BlockSpec((ncl, pn), lambda l, t, s: _i(0, 0),
                         memory_space=pltpu.VMEM),        # CRT limb planes
            acc_spec,                                     # acc hi
            acc_spec,                                     # acc lo
            pl.BlockSpec((3 * n, 2 * pn), lambda l, t, s: _i(0, 0),
                         memory_space=pltpu.VMEM),        # fwd_cat3
            pl.BlockSpec((pcount, 2 * n, 2 * n),
                         lambda l, t, s: _i(0, 0, 0),
                         memory_space=pltpu.VMEM),        # inv_crt_full
            pl.BlockSpec((1, r2j, tb, pn),
                         lambda l, t, s: _i(s, 0, t, 0),
                         memory_space=pltpu.VMEM),        # GGSW limb planes
        ],
        out_specs=[acc_spec, acc_spec],
        scratch_shapes=[
            pltpu.VMEM((kp1 * tb, n), jnp.uint32),        # acc hi
            pltpu.VMEM((kp1 * tb, n), jnp.uint32),        # acc lo
            pltpu.VMEM((kp1 * tb, 3 * n), jnp.int8),      # digit limbs
            pltpu.VMEM((kp1 * tb, pn), I32),              # y planes
        ],
    )

    mq = int(plan.m64)
    mlimbs = np.array([[mq & 0xFFFFFF, (mq >> 24) & 0xFFFFFF, mq >> 48]],
                      np.int32)
    pplane = np.repeat(np.asarray(plan.p_i32, np.int32), n)[None, :]
    invp = np.repeat((1.0 / np.asarray(plan.p_i32, np.float64))
                     .astype(np.float32), n)[None, :]
    fp24 = np.repeat(np.array([(1 << 24) // int(p) for p in plan.p_i32],
                              np.int32), n)[None, :]
    cb = np.stack([
        np.repeat(np.array([(int(mk) >> (clb * i)) & ((1 << clb) - 1)
                            for mk in plan.mk64], np.int32), n)
        for i in range(ncl)])

    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_l, kp1, n_bytes, n), jnp.uint32),
            jax.ShapeDtypeStruct((n_l, kp1, n_bytes, n), jnp.uint32)],
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    return call, mlimbs, pplane, invp, fp24, cb


def stage_ggsw_limbs(plan: ntt.NttPlan, ggsw_ntt: jnp.ndarray) -> jnp.ndarray:
    """[nbits, P, B, R2, k+1, N] int32 residues -> [nbits, R2*2(k+1), B, P*N]
    int8 limb planes (row r*2(k+1)+j = component j's lo limb, +k+1 hi) —
    the VP kernel's GGSW operand layout (prime-merged lanes, bytes on the
    sublane axis)."""
    from . import modular
    nbits, pcount, b, r2, kp1, n = ggsw_ntt.shape
    lo, hi = modular.to_balanced_limbs2(ggsw_ntt)
    cat = jnp.concatenate([lo, hi], axis=4)       # [nbits, P, B, R2, 2kp1, N]
    cat = jnp.transpose(cat, (0, 3, 4, 2, 1, 5))  # [nbits, R2, 2kp1, B, P, N]
    return cat.reshape(nbits, r2 * 2 * kp1, b, pcount * n)


def vp_rotations_pallas(keys, acc_u64: jnp.ndarray, ggsw_ntt: jnp.ndarray,
                        *, interpret: bool = False) -> jnp.ndarray:
    """The blind-rotation phase of vertical packing, fused.

    acc_u64:  [B, L, k+1, N] u64 GLWE accumulators (post-tree, C == 1).
    ggsw_ntt: [nbits, P, B, R2, k+1, N] int32 NTT residues (LSB first).
    Returns acc after all nbits CMux rotations, same shape — bit-identical
    to the XLA step loop in ops/vertical_packing.py.
    """
    plan, p = keys.plan, keys.params
    nbits = ggsw_ntt.shape[0]
    B, L, kp1, n = acc_u64.shape
    tb = _resolve_tb(B)

    g = stage_ggsw_limbs(plan, ggsw_ntt)
    acc = jnp.transpose(acc_u64, (1, 2, 0, 3))           # [L, kp1, B, N]
    acc_hi = (acc >> jnp.uint64(32)).astype(jnp.uint32)
    acc_lo = acc.astype(jnp.uint32)

    call, mlimbs, pplane, invp, fp24, cb = _build_call(
        p, plan, B, L, tb, nbits, interpret)
    hi, lo = call(mlimbs, pplane, invp, fp24, cb, acc_hi, acc_lo,
                  keys.vp_fwd3, keys.vp_inv_full, g)
    out = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    return jnp.transpose(out, (2, 0, 1, 3))              # [B, L, kp1, N]
