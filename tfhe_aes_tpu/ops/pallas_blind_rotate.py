"""Fused Pallas blind rotate — merged-prime planes, BSK steps in the grid.

Replaces the XLA op chain (gadget decompose -> forward NTT -> external-
product MAC -> twiddle rotation -> inverse NTT -> explicit CRT ->
accumulate) with ONE Pallas kernel whose grid covers (batch tiles x BSK
steps).  Two reorganizations relative to the round-4 kernel, both driven by
the measured diagnosis that the kernel was ISSUE-bound on [TB, N]
elementwise ops (PERF.md round 4: HBM ~3%, MXU ~20%, and thinning the MAC
rows 25 -> 15 moved the stage only ~4%):

1. **The RNS prime axis is merged into the lane dimension.**  Every
   NTT-domain value lives on a [TB, P*N] plane (prime k's residues at lanes
   k*N..(k+1)*N) with per-prime constants as broadcast [1, P*N] vectors.
   Each Mosaic op now covers P x more lanes per issue, the P-1 extra grid
   transitions per step disappear, the forward digit NTT becomes one MXU
   dot (the digits are prime-independent), and the explicit-CRT
   reconstruction runs its u64 carry chains ONCE per step on tall
   [(k+1)*TB, N] planes instead of once per prime.

2. **The 669 CMux steps ride the grid, 16 at a time.**  The accumulator
   persists in VMEM scratch across the step axis; per-step operands (one
   BSK row block, one gathered twiddle plane) are streamed per grid cell by
   Mosaic's pipeline.  The host-side fori_loop shrinks from one pallas_call
   per step to one per 16 steps.

The accumulator lives mod q' = 2^48 (ops/keys.make_rotate_plan) — NOT mod
2^64: the gadget decomposition reads exactly the top base*level bits, so
the mod-switched loop is lossless for it, the decomposition becomes EXACT
(no per-step rounding at PARAM_OPT), and the CRT range shrinks to 5 big
primes (noise accounting: ops/blind_rotate.py item 3).

Per grid cell (batch_tile t, step s):

    s == 0:  copy the accumulator block into scratch ([k+1)*TB, N] u32
             hi/lo planes; CRT-carry junk above bit q-32 of hi is harmless)
    each s:  decompose the accumulator into balanced gadget digits (tall)
             digits @ fwd_cat        (ONE int8 MXU dot for all primes)
             per output component j:
               MAC against the step's BSK row planes (VPU, [TB, P*N])
               twiddle (psi^(a(2j+1)) - 1) wrap-Barrett multiply
               per-prime INTT dots (int8 MXU) -> merged residue planes
               y_j -> ys scratch
             ONE tall CRT pass: alpha rounding + 12-bit-limb carry chains
             reconstruct delta mod 2^64, accumulate into scratch
    s == S-1: store the accumulator block.

Reference counterpart: the fft64 bootstrap loop inside tfhe-rs (invoked at
/root/reference/src/server/sbox/many_wopbs.rs:253-264); the rotation-as-
twiddle formulation is documented in ops/blind_rotate.py.
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


def _kernel(params: ParamSet, plan: ntt.NttPlan, tb: int, n_steps: int):
    """Build the kernel fn for one (params, plan, tile, chunk) signature."""
    import os
    # Measurement-only stage ablation (scripts/tpu_kernel_ablate.py):
    # comma list in {fwd, mac, tw, intt, crt}.  Read at build time; the
    # default (unset) is the production kernel.  Ablated kernels compute
    # WRONG results by design — never set outside the ablation harness.
    skip = set(filter(None, os.environ.get(
        "TFHE_AES_TPU_KERNEL_SKIP", "").split(",")))
    n = params.polynomial_size
    kp1 = params.glwe_dimension + 1
    lev = params.pbs_level
    blog = params.pbs_base_log
    pcount = plan.n_primes
    pn = pcount * n
    q = plan.q_bits
    clb = _crt_limb_bits(plan)     # CRT limb width (12 at P=5: 4 planes)
    nl12 = (q + clb - 1) // clb
    shift = q - blog * lev
    assert 32 < q <= 48 and 0 <= shift < 32, (
        "kernel runs the mod-2^48 rotate domain (ops/keys.make_rotate_plan)")
    # wide: digits beyond int8 (e.g. PARAM_TPU's 12-bit base) feed the
    # forward NTT as TWO base-2^6 limbs against the folded row blocks of
    # fwd_cat (ntt.fwd_full_wide_host); blog <= 12 keeps |limb| <= 32 and
    # the single-barrett recombine bound.
    assert blog <= 12
    wide = blog > 8
    dn = 2 * n if wide else n
    kt = kp1 * tb                  # tall-plane sublane extent
    half_b = 1 << (blog - 1)

    def kernel(mlimb_ref, pplane_ref, invp_ref, fp24_ref, cb_ref,
               acc_hi_ref, acc_lo_ref, fwd_ref, inv_ref, g_ref, tw_ref,
               out_hi_ref, out_lo_ref,
               digits, accs_hi, accs_lo, ys):
        s = pl.program_id(1)
        pv = pplane_ref[...]                     # [1, P*N] i32 prime plane
        inv_pv = invp_ref[...]                   # [1, P*N] f32 1/p plane
        halfv = (pv - jnp.int32(1)) >> jnp.int32(1)

        def barrett(t, clamp=True):
            """Balanced reduction mod p (per-lane prime plane) via
            f32-reciprocal quotient.  The f32 rounding of t and of t*inv_p
            puts q within +-1 of the true nearest quotient, so the raw
            remainder satisfies |r| <= 1.5p.  clamp=False skips the two
            correction selects — legal whenever the consumer tolerates
            |r| <= 1.5p (bounds argued at each call site); clamp=True
            returns canonical balanced |r| <= p/2."""
            qv = jnp.round(t.astype(jnp.float32) * inv_pv).astype(I32)
            r = t - qv * pv
            if not clamp:
                return r
            r = jnp.where(r > halfv, r - pv, r)
            return jnp.where(r < -halfv, r + pv, r)

        @pl.when(s == 0)
        def _load_acc():
            for u in range(kp1):
                accs_hi[u * tb:(u + 1) * tb] = acc_hi_ref[u]
                accs_lo[u * tb:(u + 1) * tb] = acc_lo_ref[u]

        # -- decompose the accumulator into gadget digits (tall planes) -----
        # shift == 0 (blog*lev == q, PARAM_OPT): every accumulator bit
        # participates — EXACT, no rounding.  shift > 0 (shallower gadget,
        # e.g. PARAM_TPU's 36 digit bits): round off the low `shift` bits
        # first, as in the classic decomposition.  All ops run on the full
        # [(k+1)*TB, N] planes — the digit extraction has no per-component
        # constants, so there is no reason to issue it per u.
        vhi = accs_hi[...].astype(U32)           # bits 32..q (junk above)
        vlo = accs_lo[...].astype(U32)           # bits 0..31
        if shift > 0:
            lo1 = vlo + _u32c(1 << (shift - 1))
            hi1 = vhi + jnp.where(lo1 < vlo, _u32c(1), _u32c(0))
            vlo = (hi1 << _u32c(32 - shift)) | (lo1 >> _u32c(shift))
            vhi = hi1 >> _u32c(shift)
        carry = jnp.zeros_like(vlo)
        for l in range(lev - 1, -1, -1):
            sh = blog * (lev - 1 - l)
            if sh < 32:
                raw = (vlo >> _u32c(sh)) & _u32c((1 << blog) - 1)
                if sh + blog > 32:
                    raw = raw | ((vhi << _u32c(32 - sh))
                                 & _u32c((1 << blog) - 1))
            else:
                raw = (vhi >> _u32c(sh - 32)) & _u32c((1 << blog) - 1)
            t = raw + carry
            carry = jnp.where(t >= _u32c(half_b), _u32c(1), _u32c(0))
            d = t.astype(I32) - (carry.astype(I32) << jnp.int32(blog))
            row = slice(l * kt, (l + 1) * kt)
            if wide:
                # base-2^6 limbs (|limb| <= 32): matched to fwd_cat's
                # folded 64x row block, so the dot's 2N-row contraction
                # keeps the SAME single-barrett recombine bound as the
                # narrow path (ntt.fwd_full_wide_host).
                h6 = (d + jnp.int32(32)) >> jnp.int32(6)
                digits[row, :n] = (d - (h6 << jnp.int32(6))).astype(jnp.int8)
                digits[row, n:] = h6.astype(jnp.int8)
            else:
                digits[row, :] = d.astype(jnp.int8)

        # -- forward NTT + external-product MAC, software-pipelined --------
        # One MXU dot per digit LEVEL serves all primes (fwd_cat column
        # layout [lo limbs (P*N) | hi limbs (P*N)] makes the merged residue
        # recombine two STATIC slices), and the dot for level l+1 is
        # emitted BETWEEN the recombine of level l and level l's MAC
        # partial sums — the fwd dots (the kernel's largest MXU stage, at
        # int8 peak) and the MAC (its largest VPU stage) are within ~15%
        # of each other, so hiding one under the other is worth ~0.8 ms of
        # the 2.2 ms step (measured by the stage ablation, PERF.md r5).
        #
        # Recombine bound, both paths: narrow |lo + 256*hi| <=
        # N*128*128*(1+256) < 2^31; wide contracts 2N rows of base-2^6
        # limbs: planes <= 2N*32*128 = 2^22, lo + 256*hi <= 2^30.1 —
        # int32-safe either way, and the f32 quotient of a 2^31-magnitude
        # t is within +-1, so the unclamped remainder satisfies
        # |dh| <= 1.5p.
        #
        # MAC bounds: dh is UNCLAMPED balanced |.| <= 1.5p < 2^16.6, the
        # key side pre-split into 8-bit limbs: |dh*g_lo| <= 1.5p*128 <
        # 2^23.6, 25-term sums < 2^28.3 — int32-safe with a single
        # multiply per (row, limb).  The per-j partial sums are SSA
        # expression accumulators (no scratch round-trips).
        fwd_m = fwd_ref[...]

        def fwd_dot(l):
            block = digits[l * kt:(l + 1) * kt, :]
            if "fwd" in skip:
                return jnp.broadcast_to(block[:, :1].astype(I32),
                                        (kt, 2 * pn))
            return jax.lax.dot_general(
                block, fwd_m, (((1,), (0,)), ((), ())),
                preferred_element_type=I32)          # [kt, 2*P*N]

        s_los = [None] * kp1
        s_his = [None] * kp1
        out_cur = fwd_dot(0)
        for l in range(lev):
            dh_l = barrett(out_cur[:, :pn] + (out_cur[:, pn:]
                                              << jnp.int32(8)),
                           clamp=False)              # [kt, P*N]
            if l + 1 < lev:
                out_cur = fwd_dot(l + 1)             # MXU, no dep on MACs
            for u in range(kp1):
                r = u * lev + l
                if "mac" in skip and r > 0:
                    continue
                d = dh_l[u * tb:(u + 1) * tb]
                base = r * 2 * kp1
                for j in range(kp1):
                    glo = g_ref[0, base + j:base + j + 1, :].astype(I32)
                    ghi = g_ref[0, base + kp1 + j:base + kp1 + j + 1,
                                :].astype(I32)
                    plo = d * glo
                    phi = d * ghi
                    s_los[j] = plo if s_los[j] is None else s_los[j] + plo
                    s_his[j] = phi if s_his[j] is None else s_his[j] + phi

        tw1 = tw_ref[0].astype(I32) - jnp.int32(1)           # [TB, P*N]

        def chain(j):
            """Twiddle rotation for output component j's MAC sums.

            Wrap-Barrett: ONE reduction for recombine+twiddle instead of
            three.  u = s_lo + 256*r_hi <= 2^28.4 stays UNREDUCED; the
            quotient of tw1*u (true magnitude <= 2^43.4) is estimated in
            f32 — error budget: f32(u) rounds within 2^4.4, so
            f32(tw1)*f32(u) is within |tw1|*2^4.4 + 2^43.4*2^-24 < 2^20.6
            of the true product, the quotient within 2^20.6/p + 1 < 24 of
            the true nearest — and the remainder tw1*u - q*p is computed
            EXACTLY in wrapping int32 (both terms reduce mod 2^32; the
            true remainder <= 24.5p < 2^21 fits), so one final clamped
            barrett yields the same canonical delta as the exact 3-barrett
            chain (bit-identical; checked vs the XLA path).  delta IS
            clamped: the int8 limb split needs |delta| <= p/2."""
            r_hi = barrett(s_his[j], clamp=False) * jnp.int32(256)
            uacc = s_los[j] + r_hi                           # <= 2^28.4
            if "tw" in skip:
                delta = barrett(uacc)
            else:
                qf = jnp.round((tw1.astype(jnp.float32)
                                * uacc.astype(jnp.float32))
                               * inv_pv).astype(I32)
                delta = barrett(tw1 * uacc - qf * pv)
            h8 = (delta + jnp.int32(128)) >> jnp.int32(8)
            l8 = delta - (h8 << jnp.int32(8))
            return l8.astype(jnp.int8), h8.astype(jnp.int8)  # [TB, P*N]

        # -- per-j INTT dots; chain(j+1) emitted between dot(j) and the
        # post-INTT reduction of j so Mosaic can hide the MXU dots under
        # the adjacent VPU chains (the round-3b interleave).
        # INTT bounds: each half-dot <= N*128*128 = 2^23, summed pairs <=
        # 2^24; r2 = barrett(zz_hi) unclamped <= 1.5p -> <<8 <= 2^24.6
        # (+ zz_lo 2^24 stays int32-safe); |z| <= 1.5p, so the sign fix
        # gives y in [0, 1.5p) < 2^16.6.
        xl, xh = chain(0)
        for j in range(kp1):
            if "intt" in skip:
                zz_lo, zz_hi = xl.astype(I32), xh.astype(I32)
                if j + 1 < kp1:
                    xl, xh = chain(j + 1)
                r2 = barrett(zz_hi, clamp=False)
                z = barrett(zz_lo + (r2 << jnp.int32(8)), clamp=False)
                ys[j * tb:(j + 1) * tb] = jnp.where(z < 0, z + pv, z)
                continue
            zz_lo_parts, zz_hi_parts = [], []
            for k in range(pcount):
                l8k = xl[:, k * n:(k + 1) * n]
                h8k = xh[:, k * n:(k + 1) * n]
                zz = (jax.lax.dot_general(
                          l8k, inv_ref[k, :n, :], (((1,), (0,)), ((), ())),
                          preferred_element_type=I32)
                      + jax.lax.dot_general(
                          h8k, inv_ref[k, n:, :], (((1,), (0,)), ((), ())),
                          preferred_element_type=I32))       # [TB, 2N]
                zz_lo_parts.append(zz[:, :n])
                zz_hi_parts.append(zz[:, n:])
            if j + 1 < kp1:
                xl, xh = chain(j + 1)
            zz_lo = jnp.concatenate(zz_lo_parts, axis=1)     # [TB, P*N]
            zz_hi = jnp.concatenate(zz_hi_parts, axis=1)
            r2 = barrett(zz_hi, clamp=False)
            z = barrett(zz_lo + (r2 << jnp.int32(8)), clamp=False)
            ys[j * tb:(j + 1) * tb] = jnp.where(z < 0, z + pv, z)

        # -- ONE tall explicit-CRT pass over all components ----------------
        #   x mod 2^q = sum_k y_k*(M/p_k)  -  round(sum_k y_k/p_k) * M
        # evaluated on [(k+1)*TB, N] planes: the per-prime segment sums run
        # BEFORE the u64 carry chains, so the chains execute once per step
        # instead of once per (prime, component).  (M/p_k mod 2^q) is
        # staged as nl12 12-bit limb planes: y*c12 <= 1.5p*4095 < 2^28.6,
        # 5-prime segment sums < 2^30.9 — int32-exact, 4 chains not 6.
        # Alpha: y*fp24 <= 1.5*2^24 per term, 5-term sums < 2^27.5;
        # per-term fixed-point error <= y/2^24 < 2^-7.4, 5 terms < 2^-5.1,
        # and |true x|/M <= 0.13 (crt.rotate_primes margin) keeps the
        # total > 0.3 from the rounding boundary.  The explicit-CRT
        # identity is invariant under y -> y + p (the alpha sum shifts by
        # exactly 1), so unclamped y in [0, 1.5p) is safe.
        yv = ys[...]                                         # [kt, P*N] i32
        if "crt" in skip:
            accs_lo[...] = accs_lo[...] + yv[:, :n].astype(U32)

            @pl.when(s == n_steps - 1)
            def _store_acc_ablated():
                for u in range(kp1):
                    out_hi_ref[u] = accs_hi[u * tb:(u + 1) * tb]
                    out_lo_ref[u] = accs_lo[u * tb:(u + 1) * tb]
            return

        def segsum(t):
            acc = t[:, :n]
            for k in range(1, pcount):
                acc = acc + t[:, k * n:(k + 1) * n]
            return acc                                       # [kt, N]

        af = yv * fp24_ref[...]
        al = (segsum(af) + jnp.int32(1 << 23)) >> jnp.int32(24)
        alu = al.astype(U32)                                 # <= ceil(1.5P)

        a_lo = a_hi = None
        for i in range(nl12):
            si = segsum(yv * cb_ref[i:i + 1, :]).astype(U32)  # < 2^30.9
            sh = clb * i
            if sh == 0:
                a_lo, a_hi = si, jnp.zeros_like(si)
            elif sh < 32:
                t = si << _u32c(sh)
                nlo = a_lo + t
                a_hi = a_hi + (si >> _u32c(32 - sh)) \
                    + jnp.where(nlo < t, _u32c(1), _u32c(0))
                a_lo = nlo
            else:
                a_hi = a_hi + (si << _u32c(sh - 32))

        # alpha * (M mod 2^q) via two 24-bit limbs: alu <= 8 (P=5), so
        # p0, p1 <= 8*2^24 < 2^27 and (s_hi, s_lo) is the exact 2^32-split.
        p0 = alu * mlimb_ref[0, 0].astype(U32)
        p1 = alu * mlimb_ref[0, 1].astype(U32)
        t24 = p1 << _u32c(24)
        s_lo = p0 + t24
        s_hi = (p1 >> _u32c(8)) + jnp.where(s_lo < t24, _u32c(1), _u32c(0))

        d_lo = a_lo - s_lo
        borrow = jnp.where(a_lo < s_lo, _u32c(1), _u32c(0))
        d_hi = a_hi - s_hi - borrow

        ol = accs_lo[...]
        oh = accs_hi[...]
        nlo = ol + d_lo
        nhi = oh + d_hi + jnp.where(nlo < d_lo, _u32c(1), _u32c(0))
        accs_lo[...] = nlo
        accs_hi[...] = nhi

        @pl.when(s == n_steps - 1)
        def _store_acc():
            for u in range(kp1):
                out_hi_ref[u] = accs_hi[u * tb:(u + 1) * tb]
                out_lo_ref[u] = accs_lo[u * tb:(u + 1) * tb]

    return kernel


def _crt_limb_bits(plan: ntt.NttPlan) -> int:
    """Widest CRT limb so that sum_k y_k * c_k (y < 1.5p, c < 2^bits)
    summed over ALL primes stays int32-exact.  12 bits for the production
    5-prime basis (5 * 1.5p * 4095 < 2^30.9); narrower for toy plans with
    more primes."""
    pmax = int(np.max(plan.p_i32))
    for bits in (12, 10, 8, 6, 4):
        if 1.5 * pmax * ((1 << bits) - 1) * plan.n_primes < 2 ** 31:
            return bits
    raise AssertionError("no safe CRT limb width for this prime basis")


def _resolve_tb(n_batch: int) -> int:
    """Tile size for the batch axis (env TFHE_AES_TPU_PALLAS_TB, read at
    trace time — later env changes don't affect already-jitted callers).

    Default 256 for the merged-plane kernel (v5e sweep, round 5: 1393 ms
    at tb=256 vs 1452 at 128 and 1620 at 64, batch 2048; tb=512 exceeds
    the 128 MB VMEM).  Mosaic requires the tile's sublane dim be a
    multiple of 8 OR equal to the full array dim, so small/odd batches
    (e.g. the 9-wide ripple-carry WoPBS) fall back to one full-batch
    tile."""
    import os
    tb_max = int(os.environ.get("TFHE_AES_TPU_PALLAS_TB", "256"))
    for tb in (512, 256, 128, 64, 32, 16, 8):
        if tb <= tb_max and n_batch % tb == 0:
            return tb
    return n_batch


def _resolve_steps(n_pad: int) -> int:
    """Grid steps per pallas_call (env TFHE_AES_TPU_PALLAS_STEPS, default
    16 = keys.BSK_STEP_PAD, which the staged BSK is always padded to)."""
    import os
    want = int(os.environ.get("TFHE_AES_TPU_PALLAS_STEPS", "16"))
    for s in (want, 16, 8, 4, 2, 1):
        if s <= n_pad and n_pad % s == 0:
            return s
    return 1


@functools.lru_cache(maxsize=None)
def _build_call(params: ParamSet, plan: ntt.NttPlan, n_batch: int,
                tb: int, n_steps: int, interpret: bool):
    """Build the pallas_call plus its host-side numpy constants.

    Everything returned here is cached across jit traces, so NOTHING in the
    return value may be a jnp array: a jnp constant created inside one trace
    is a tracer there, and reusing it from a second trace raises
    UnexpectedTracerError (the round-1 bench-killer).  Numpy arrays are safe:
    each trace lifts them into fresh constants.
    """
    n = params.polynomial_size
    kp1 = params.glwe_dimension + 1
    lev = params.pbs_level
    r2j = kp1 * lev * 2 * kp1
    pcount = plan.n_primes
    pn = pcount * n
    q = plan.q_bits
    clb = _crt_limb_bits(plan)
    nl12 = (q + clb - 1) // clb
    n_tiles = n_batch // tb
    dn = 2 * n if params.pbs_base_log > 8 else n   # wide-digit limb planes
    kern = _kernel(params, plan, tb, n_steps)

    def _i(*vals):
        # Index maps run inside each trace; fresh jnp constants are fine.
        return tuple(jnp.asarray(v, jnp.int32) for v in vals)

    acc_spec = pl.BlockSpec((kp1, tb, n), lambda t, s: _i(0, t, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles, n_steps),
        in_specs=[
            pl.BlockSpec((1, 2), lambda t, s: _i(0, 0),
                         memory_space=pltpu.SMEM),            # M 24-bit limbs
            pl.BlockSpec((1, pn), lambda t, s: _i(0, 0),
                         memory_space=pltpu.VMEM),            # p plane
            pl.BlockSpec((1, pn), lambda t, s: _i(0, 0),
                         memory_space=pltpu.VMEM),            # 1/p plane f32
            pl.BlockSpec((1, pn), lambda t, s: _i(0, 0),
                         memory_space=pltpu.VMEM),            # fp24 plane
            pl.BlockSpec((nl12, pn), lambda t, s: _i(0, 0),
                         memory_space=pltpu.VMEM),            # 12-bit c limbs
            acc_spec,                                         # acc hi
            acc_spec,                                         # acc lo
            # Constant-index blocks: Mosaic skips the copy-in when the
            # block index is unchanged, so the NTT matrices stream from
            # HBM once per kernel call.
            pl.BlockSpec((dn, 2 * pn), lambda t, s: _i(0, 0),
                         memory_space=pltpu.VMEM),            # fwd_cat
            pl.BlockSpec((pcount, 2 * n, 2 * n), lambda t, s: _i(0, 0, 0),
                         memory_space=pltpu.VMEM),            # inv_crt_full
            pl.BlockSpec((1, r2j, pn), lambda t, s: _i(s, 0, 0),
                         memory_space=pltpu.VMEM),            # bsk step rows
            pl.BlockSpec((1, tb, pn), lambda t, s: _i(s, t, 0),
                         memory_space=pltpu.VMEM),            # twiddles i16
        ],
        out_specs=[acc_spec, acc_spec],
        scratch_shapes=[
            pltpu.VMEM((lev * kp1 * tb, dn), jnp.int8),       # digits
            pltpu.VMEM((kp1 * tb, n), jnp.uint32),            # acc hi
            pltpu.VMEM((kp1 * tb, n), jnp.uint32),            # acc lo
            pltpu.VMEM((kp1 * tb, pn), I32),                  # y planes
        ],
    )

    mq = int(plan.m64) & ((1 << q) - 1)                       # M mod 2^q
    mlimbs = np.array([[mq & 0xFFFFFF, mq >> 24]], np.int32)
    pplane = np.repeat(np.asarray(plan.p_i32, np.int32), n)[None, :]
    invp = np.repeat((1.0 / np.asarray(plan.p_i32, np.float64))
                     .astype(np.float32), n)[None, :]
    fp24 = np.repeat(np.array([(1 << 24) // int(p) for p in plan.p_i32],
                              np.int32), n)[None, :]
    cb = np.stack([
        np.repeat(np.array([(int(mk) >> (clb * i)) & ((1 << clb) - 1)
                            for mk in plan.mk64], np.int32), n)
        for i in range(nl12)])                                # [nl12, P*N]

    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((kp1, n_batch, n), jnp.uint32),
                   jax.ShapeDtypeStruct((kp1, n_batch, n), jnp.uint32)],
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    return call, mlimbs, pplane, invp, fp24, cb


def blind_rotate_pallas(plan: ntt.NttPlan, params: ParamSet,
                        bsk_limbs: jnp.ndarray, lwe_u64: jnp.ndarray,
                        test_glwe_u64: jnp.ndarray, fwd_cat: jnp.ndarray,
                        inv_crt_full: jnp.ndarray, rot_table: jnp.ndarray,
                        *, interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.blind_rotate.blind_rotate (same result).

    lwe_u64 [B, n+1]; test_glwe_u64 [k+1, N] or [B, k+1, N]; bsk_limbs
    [n_pad, R*2(k+1), P*N] int8 merged limb planes (keys.
    bsk_residues_to_device); fwd_cat [dn, 2*P*N] (ntt.fwd_cat_for);
    rot_table [2N, P*N] int16 (ntt.rot_table_merged).
    Returns [B, k+1, N] u64.
    """
    from . import lwe  # local import to avoid cycle

    n_poly = params.polynomial_size
    two_n = 2 * n_poly
    n_batch = lwe_u64.shape[0]
    kp1 = params.glwe_dimension + 1
    q = plan.q_bits
    n_steps = params.lwe_dimension
    n_pad = bsk_limbs.shape[0]
    assert n_pad >= n_steps
    s_chunk = _resolve_steps(n_pad)

    tilde = lwe.modswitch(lwe_u64, two_n)
    b_t = tilde[:, -1]
    tilde_pad = jnp.pad(tilde[:, :n_steps],
                        ((0, 0), (0, n_pad - n_steps)))       # [B, n_pad]
    if test_glwe_u64.ndim == 2:
        test_glwe_u64 = jnp.broadcast_to(
            test_glwe_u64[None], (n_batch,) + test_glwe_u64.shape)
    acc0 = lwe.neg_rotate(test_glwe_u64, ((two_n - b_t) % two_n)[:, None])
    if q < 64:                                       # mod-switch once to q'
        acc0 = (acc0 + (jnp.uint64(1) << jnp.uint64(63 - q))) \
            >> jnp.uint64(64 - q)
    acc0 = jnp.transpose(acc0, (1, 0, 2))            # [k+1, B, N]
    acc_hi = (acc0 >> jnp.uint64(32)).astype(jnp.uint32)
    acc_lo = acc0.astype(jnp.uint32)

    call, mlimbs, pplane, invp, fp24, cb = _build_call(
        params, plan, n_batch, _resolve_tb(n_batch), s_chunk, interpret)
    r2j = bsk_limbs.shape[1]
    pn = bsk_limbs.shape[2]

    def body(c, hl):
        hi, lo = hl
        g = jax.lax.dynamic_slice(bsk_limbs, (c * s_chunk, 0, 0),
                                  (s_chunk, r2j, pn))
        tc = jax.lax.dynamic_slice(tilde_pad, (0, c * s_chunk),
                                   (n_batch, s_chunk))
        tw = jnp.take(rot_table, tc.T, axis=0)       # [S, B, P*N] i16
        hi, lo = call(mlimbs, pplane, invp, fp24, cb, hi, lo,
                      fwd_cat, inv_crt_full, g, tw)
        return hi, lo

    acc_hi, acc_lo = jax.lax.fori_loop(0, n_pad // s_chunk, body,
                                       (acc_hi, acc_lo))
    acc = (acc_hi.astype(jnp.uint64) << jnp.uint64(32)) \
        | acc_lo.astype(jnp.uint64)
    if q < 64:   # mask CRT carry junk above bit q, scale back to 2^64
        acc = (acc & jnp.uint64((1 << q) - 1)) << jnp.uint64(64 - q)
    return jnp.transpose(acc, (1, 0, 2))             # [B, k+1, N]
