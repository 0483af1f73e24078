"""Fused Pallas CMux step — the blind-rotate hot loop as ONE TPU kernel.

Replaces the XLA op chain (gadget decompose -> forward NTT -> external-
product MAC -> twiddle rotation -> inverse NTT -> explicit CRT ->
accumulate) whose HBM-materialized intermediates (layout copies, Barrett
passes, emulated-wide-int chains) dominated wall time: profiled on a v5e,
the per-op XLA pipeline spent ~70% of device time on copies and element-wise
fusions between dots.  Here everything between the accumulator load and
store lives in VMEM/registers.

The accumulator lives mod q' = 2^48 (ops/keys.make_rotate_plan) — NOT mod
2^64: the gadget decomposition reads exactly the top base*level = 40 bits,
so the mod-switched loop is lossless for it, the decomposition becomes
EXACT (no per-step rounding), and the CRT range shrinks enough for 5 big
primes instead of the mod-2^64 domain's 6 (the noise accounting for the
q' switch is in ops/blind_rotate.py item 3; q' < 48 fails it — PERF.md).

Per grid cell (batch_tile, prime) — primes innermost so per-tile state
(gadget digits, CRT accumulators) persists in scratch across the prime loop:

    k == 0:  decompose the mod-q' accumulator tile (kept as two u32 planes —
             Mosaic has no 64-bit ints) into balanced int8 gadget digits
    all k:   digits @ fwd_full[k]   (MXU int8 dot, both residue limbs)
             -> Barrett -> int8 limb pair
             MAC against the step's BSK row block (VPU, r-unrolled)
             twiddle (psi^(a(2j+1)) - 1) multiply      [rotation, SURVEY 3.2]
             limb split -> @ inv_crt_full[k] (MXU) -> Barrett -> canonical
             CRT accumulate: acc += y * (M/p_k mod 2^q') via 8-bit limb
             products and explicit u32 carry chains (ceil(q'/8) limbs)
    k == P-1: alpha = round(sum y_k/p_k) correction, acc += delta, store.

Reference counterpart: the fft64 bootstrap loop inside tfhe-rs
(invoked at /root/reference/src/server/sbox/many_wopbs.rs:253-264); the
rotation-as-twiddle formulation is documented in ops/blind_rotate.py.
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


def _kernel(params: ParamSet, plan: ntt.NttPlan, tb: int):
    """Build the kernel fn + specs for one (params, plan, tile) signature."""
    n = params.polynomial_size
    kp1 = params.glwe_dimension + 1
    lev = params.pbs_level
    blog = params.pbs_base_log
    r_rows = kp1 * lev
    pcount = plan.n_primes
    q = plan.q_bits
    nbytes = (q + 7) // 8
    shift = q - blog * lev
    assert 32 < q <= 48 and 0 <= shift < 32, (
        "kernel runs the mod-2^48 rotate domain (ops/keys.make_rotate_plan)")
    # wide: digits beyond int8 (e.g. PARAM_TPU's 12-bit base) feed the
    # forward NTT as TWO base-2^6 limbs against the [2N, 2N] block matrix
    # (ntt.fwd_full_wide_host); blog <= 12 keeps |limb| <= 32 and the
    # single-barrett recombine bound.
    assert blog <= 12
    wide = blog > 8
    dn = 2 * n if wide else n
    # Junk safety: the hi accumulator plane carries CRT-carry junk above
    # bit q-32; after the shift prologue it sits at vhi bit blog*lev - 32,
    # and digit reads touch only vbar bits < blog*lev — never the junk.
    half_b = 1 << (blog - 1)

    def kernel(consts_ref, m64b_ref, invp_ref,
               acc_hi_ref, acc_lo_ref, wf_ref, inv_ref, g_ref, tw_ref,
               out_hi_ref, out_lo_ref,
               digits, acc64_hi, acc64_lo, alpha):
        k = pl.program_id(1)
        p = consts_ref[k, 0]
        fp24 = consts_ref[k, 1]
        inv_p = invp_ref[k, 0]

        def barrett(t, clamp=True):
            """Balanced reduction mod p via f32-reciprocal quotient.

            The f32 rounding of t and of t*inv_p puts q within +-1 of the
            true nearest quotient, so the raw remainder satisfies
            |r| <= 1.5p.  clamp=False skips the two correction selects —
            legal whenever the consumer tolerates |r| <= 1.5p (bounds are
            argued at each call site); clamp=True returns canonical
            balanced |r| <= p/2."""
            q = jnp.round(t.astype(jnp.float32) * inv_p).astype(I32)
            r = t - q * p
            if not clamp:
                return r
            half = (p - 1) >> 1   # // 2 strongly promotes to i64 under x64
            r = jnp.where(r > half, r - p, r)
            return jnp.where(r < -half, r + p, r)

        # -- k == 0: decompose the accumulator tile into gadget digits ------
        # shift == 0 (blog*lev == q, PARAM_OPT): every accumulator bit
        # participates — EXACT, no rounding.  shift > 0 (shallower gadget,
        # e.g. the toy sets' 32 digit bits): round off the low `shift` bits
        # first, as in the classic decomposition.
        @pl.when(k == 0)
        def _decompose():
            for u in range(kp1):
                vhi = acc_hi_ref[u].astype(U32)              # bits 32..q
                vlo = acc_lo_ref[u].astype(U32)              # bits 0..31
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
                    d = t.astype(I32) - (carry.astype(I32)
                                         << jnp.int32(blog))
                    if wide:
                        # base-2^6 limbs (|limb| <= 32): matched to the
                        # fwd_full_wide matrix's folded 64x row block, so
                        # the dot's 2N-row contraction keeps the SAME
                        # single-barrett recombine bound as the narrow
                        # path (ntt.fwd_full_wide_host).
                        h6 = (d + jnp.int32(32)) >> jnp.int32(6)
                        digits[u * lev + l, :, :n] = \
                            (d - (h6 << jnp.int32(6))).astype(jnp.int8)
                        digits[u * lev + l, :, n:] = h6.astype(jnp.int8)
                    else:
                        digits[u * lev + l] = d.astype(jnp.int8)

            acc64_hi[...] = jnp.zeros_like(acc64_hi)
            acc64_lo[...] = jnp.zeros_like(acc64_lo)
            alpha[...] = jnp.zeros_like(alpha)

        # -- forward NTT + MAC, interleaved per GLWE component u ------------
        # The dot for u+1 has no data dependence on the MAC of u, so
        # emitting them interleaved lets Mosaic overlap MXU dot time with
        # the VPU MAC chains (the two biggest stages in the ablation).
        # Reading the dot result directly also skips the int16 dhat
        # scratch round-trip the staged formulation paid.
        #
        # MAC bounds: dhat is UNCLAMPED balanced |.| <= 1.5p < 2^16.6 (one
        # barrett, no correction selects), the key side pre-split into
        # 8-bit limbs: |dhat*g_lo| <= 1.5p*128 < 2^23.6, 25-term sums
        # < 2^28.3 — int32-safe with a single multiply per (row, limb).
        #
        # The MAC itself runs inside chain(j) below as ONE SSA expression
        # sum over the R rows (s = sum_r dh_rows[r]*g_rj), NOT as scratch
        # `s[j] += ...` updates: the scratch formulation forces a VMEM
        # read-modify-write of a [TB, N] accumulator per (row, j, limb) —
        # measured to dominate the stage so thoroughly that cutting R from
        # 25 to 15 (PARAM_TPU) barely moved it.  As an expression tree,
        # Mosaic accumulates per register tile and the only VMEM traffic
        # is streaming each dh row once per j.
        dh_rows = []
        for u in range(kp1):
            block = digits[u * lev:(u + 1) * lev].reshape(lev * tb, dn)
            out = jax.lax.dot_general(
                block, wf_ref[k], (((1,), (0,)), ((), ())),
                preferred_element_type=I32)                  # [lev*TB, 2N]
            # Recombine bound, both paths: narrow |lo + 256*hi| <=
            # N*128*128*(1 + 256) < 2^31; wide contracts 2N rows of
            # base-2^6 limbs (|limb| <= 32): planes <= 2N*32*128 = 2^22,
            # lo + 256*hi <= 2^30.1 — int32-safe either way, and the f32
            # quotient of a 2^31-magnitude t is within +-1 (abs f32
            # rounding ~2^7 at 2^31; error on t*inv_p ~ 2^7/p + 2^-11
            # << 1/2), so the unclamped remainder satisfies |dr| <= 1.5p
            # (MAC bound above).
            t = barrett(out[:, :n] + (out[:, n:] << jnp.int32(8)),
                        clamp=False)
            dh = t.reshape(lev, tb, n)
            for l in range(lev):
                dh_rows.append(dh[l])                        # [TB, N] each

        # -- per-j: recombine, twiddle-rotate, INTT dot, CRT accumulate -----
        # Emitted per output component j so Mosaic can hide the [TB, 2N] @
        # [2N, 2N] INTT dot (MXU) of component j under the VPU twiddle chain
        # of j+1 and the CRT chains of j-1 — the same interleave that hid
        # the forward dots under the MAC (PERF.md round 3b).  This also
        # deletes the x8 int8 scratch round-trip (store + reload between the
        # chain and one monolithic [J*TB, 2N] dot).
        #
        # Clamp analysis (p < 2^16, rotate primes <= 64513):
        #   s_lo/s_hi <= 25 * 1.5p * 128 < 2^28.3 (unclamped-dr MAC bound);
        #   s_hi unclamped barrett: f32 quotient within +-1 at 2^28.3 (abs
        #   f32 rounding of t ~ 2^4.3; error on t*inv_p ~ 2^4.3/p + 2^-11.7
        #   << 1/2) -> |r_hi| <= 1.5p -> *256 <= 2^24.6, added raw to s_lo:
        #   sum <= 2^28.4 — int32-safe, ONE barrett recombines both limbs;
        #   prod IS clamped (|prod| <= p/2): |tw-1| <= p/2 + 1 ->
        #   |(tw-1)*prod| <= (p/2+1)*p/2 < 2^30 < 2^31 - 1: no overflow.
        #   (unclamped prod would give 1.5p*(p/2+1) ~ 2^31.6 — the ONE clamp
        #   the big-prime basis costs vs the mod-2^64 domain's 2^15.5 ones.)
        #   delta IS clamped: the int8 limb split needs |delta| <= p/2.
        #
        # INTT/CRT bounds: |zz lo|,|zz hi| <= 2N*128*128 = 2^24 raw dot
        # outputs; r_hi = barrett(zz_hi) unclamped <= 1.5p -> <<8 <= 2^24.6
        # (+ zz_lo 2^24 stays int32-safe); |z| <= 1.5p, so the sign fix
        # gives y in [0, 1.5p) < 2^16.6 — the CRT limb products (y * 8-bit)
        # stay < 2^24.6 and the fp24 alpha product < 1.5*2^24 (5-term prime
        # sum < 2^27.5), both in budget, and the explicit-CRT identity is
        # invariant under y -> y + p (the alpha sum shifts by exactly 1).
        # Alpha-rounding robustness: per-term fixed-point error <= y/2^24
        # < 2^-7.4, 5 terms < 2^-5.1; |true x|/M <= 2^60.64/2^63.57 = 0.13
        # (crt.rotate_primes margin) -> total distance from the round
        # boundary > 0.3.
        tw1 = tw_ref[0].astype(I32) - jnp.int32(1)           # [TB, N]

        def chain(j):
            # The external-product MAC for output component j, as one SSA
            # expression sum (see the dh_rows comment above).
            s_lo = s_hi = None
            for r in range(r_rows):
                glo = g_ref[0, r * 2 * kp1 + j].astype(I32)[None, :]
                ghi = g_ref[0, r * 2 * kp1 + kp1 + j].astype(I32)[None, :]
                plo = dh_rows[r] * glo
                phi = dh_rows[r] * ghi
                s_lo = plo if s_lo is None else s_lo + plo
                s_hi = phi if s_hi is None else s_hi + phi
            # Wrap-Barrett: ONE reduction for recombine+twiddle instead of
            # three.  u = s_lo + 256*r_hi <= 2^28.4 stays UNREDUCED; the
            # quotient of tw1*u (true magnitude <= 2^43.4) is estimated in
            # f32 — error budget: f32(u) rounds within 2^4.4, so
            # f32(tw1)*f32(u) is within |tw1|*2^4.4 + 2^43.4*2^-24 < 2^20.6
            # of the true product, the quotient q within 2^20.6/p + 1 < 24
            # of the true nearest — and the remainder tw1*u - q*p is
            # computed EXACTLY in wrapping int32 (both terms reduce mod
            # 2^32; the true remainder <= 24.5p < 2^21 fits), so one final
            # clamped barrett yields the same canonical delta as the exact
            # 3-barrett chain (bit-identical; checked vs the XLA path).
            r_hi = barrett(s_hi, clamp=False) * jnp.int32(256)
            u = s_lo + r_hi                                  # <= 2^28.4
            qf = jnp.round((tw1.astype(jnp.float32)
                            * u.astype(jnp.float32)) * inv_p).astype(I32)
            delta = barrett(tw1 * u - qf * p)
            h8 = (delta + jnp.int32(128)) >> jnp.int32(8)
            l8 = delta - (h8 << jnp.int32(8))
            return jnp.concatenate([l8, h8], axis=1).astype(jnp.int8)

        def crt_acc(j, zz):
            r2 = barrett(zz[:, n:], clamp=False)
            z = barrett(zz[:, :n] + (r2 << jnp.int32(8)), clamp=False)
            y = jnp.where(z < 0, z + p, z)                   # [TB, N]
            sl = slice(j * tb, (j + 1) * tb)
            alpha[sl] += y * fp24
            yu = y.astype(U32)
            a_lo = acc64_lo[sl]
            a_hi = acc64_hi[sl]
            for i in range(nbytes):
                pp = yu * consts_ref[k, 2 + i].astype(U32)   # < 2^24.6
                if i < 4:
                    lopart = pp << _u32c(8 * i)
                    hipart = pp >> _u32c(32 - 8 * i) if i > 0 \
                        else _u32c(0) * pp
                    new_lo = a_lo + lopart
                    a_hi = a_hi + hipart + jnp.where(new_lo < lopart,
                                                     _u32c(1), _u32c(0))
                    a_lo = new_lo
                else:
                    a_hi = a_hi + (pp << _u32c(8 * i - 32))
            acc64_lo[sl] = a_lo
            acc64_hi[sl] = a_hi

        # Software pipeline: chain(j+1) is emitted BETWEEN dot(j) and
        # crt(j), giving the scheduler adjacent independent MXU/VPU work.
        xj = chain(0)
        for j in range(kp1):
            zz = jax.lax.dot_general(
                xj, inv_ref[k], (((1,), (0,)), ((), ())),
                preferred_element_type=I32)                  # [TB, 2N]
            if j + 1 < kp1:
                xj = chain(j + 1)
            crt_acc(j, zz)

        # -- k == P-1: alpha rounding, delta = acc - alpha*M mod 2^q, store -
        # Junk above bit q-32 of the hi plane is harmless: the decompose
        # digit reads mask it and the wrapper masks the final reconstruction.
        @pl.when(k == pcount - 1)
        def _finalize():
            al = (alpha[...] + jnp.int32(1 << 23)) >> jnp.int32(24)
            alu = al.astype(U32)
            s_lo = jnp.zeros_like(alu)
            s_hi = jnp.zeros_like(alu)
            for i in range(nbytes):
                pp = alu * m64b_ref[0, i].astype(U32)
                if i < 4:
                    lopart = pp << _u32c(8 * i)
                    hipart = (pp >> _u32c(32 - 8 * i)) if i > 0 \
                        else _u32c(0) * pp
                    new_lo = s_lo + lopart
                    s_hi = s_hi + hipart + jnp.where(new_lo < lopart,
                                                     _u32c(1), _u32c(0))
                    s_lo = new_lo
                else:
                    s_hi = s_hi + (pp << _u32c(8 * i - 32))
            d_lo = acc64_lo[...].astype(U32) - s_lo
            borrow = jnp.where(acc64_lo[...].astype(U32) < s_lo,
                               _u32c(1), _u32c(0))
            d_hi = acc64_hi[...].astype(U32) - s_hi - borrow
            for u in range(kp1):
                alo = acc_lo_ref[u].astype(U32)
                ahi = acc_hi_ref[u].astype(U32)
                dlo = d_lo[u * tb:(u + 1) * tb]
                dhi = d_hi[u * tb:(u + 1) * tb]
                nlo = alo + dlo
                nhi = ahi + dhi + jnp.where(nlo < dlo, _u32c(1), _u32c(0))
                out_lo_ref[u] = nlo
                out_hi_ref[u] = nhi

    return kernel


def _resolve_tb(n_batch: int) -> int:
    """Tile size for the batch axis (env TFHE_AES_TPU_PALLAS_TB, read at
    trace time — later env changes don't affect already-jitted callers).

    Default 128: the v5e sweep (scripts/tpu_kernel_ablate.py, batch 2048)
    measured 2.14 s/rotate at tb=128 vs 2.57 s at 256 and 8.9 s at 512 —
    smaller tiles keep the per-cell scratch working set inside Mosaic's
    sweet spot.

    Mosaic requires the tile's sublane dim be a multiple of 8 OR equal to
    the full array dim, so small/odd batches (e.g. the 9-wide ripple-carry
    WoPBS) fall back to one full-batch tile."""
    import os
    tb_max = int(os.environ.get("TFHE_AES_TPU_PALLAS_TB", "128"))
    for tb in (512, 256, 128, 64, 32, 16, 8):
        if tb <= tb_max and n_batch % tb == 0:
            return tb
    return n_batch


@functools.lru_cache(maxsize=None)
def _build_call(params: ParamSet, plan: ntt.NttPlan, n_batch: int,
                tb: int, interpret: bool):
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
    r_rows = kp1 * lev
    pcount = plan.n_primes
    nbytes = (plan.q_bits + 7) // 8
    n_tiles = n_batch // tb
    dn = 2 * n if params.pbs_base_log > 8 else n   # wide-digit limb planes
    kern = _kernel(params, plan, tb)

    grid = (n_tiles, pcount)

    def _i(*vals):
        # Index maps run inside each trace; fresh jnp constants are fine here.
        return tuple(jnp.asarray(v, jnp.int32) for v in vals)

    acc_spec = pl.BlockSpec((kp1, tb, n), lambda t, k: _i(0, t, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[
            pl.BlockSpec((pcount, 2 + nbytes), lambda t, k: _i(0, 0),
                         memory_space=pltpu.SMEM),            # consts
            pl.BlockSpec((1, nbytes), lambda t, k: _i(0, 0),
                         memory_space=pltpu.SMEM),            # M mod 2^q bytes
            pl.BlockSpec((pcount, 1), lambda t, k: _i(0, 0),
                         memory_space=pltpu.SMEM),            # 1/p f32
            acc_spec,                                         # acc hi
            acc_spec,                                         # acc lo
            # Whole [P, ...] matrix stacks with a CONSTANT index map: Mosaic
            # skips the copy-in when the block index is unchanged, so the
            # ~7.7 MB of NTT matrices stream from HBM once per kernel call
            # instead of 1.5 MB per grid cell (~120 MB/step at batch 2048).
            # The kernel indexes the prime's slice with the k program id.
            pl.BlockSpec((pcount, dn, 2 * n), lambda t, k: _i(0, 0, 0),
                         memory_space=pltpu.VMEM),            # fwd_full
            pl.BlockSpec((pcount, 2 * n, 2 * n), lambda t, k: _i(0, 0, 0),
                         memory_space=pltpu.VMEM),            # inv_crt_full
            pl.BlockSpec((1, r_rows * 2 * kp1, n), lambda t, k: _i(k, 0, 0),
                         memory_space=pltpu.VMEM),            # bsk step rows
            pl.BlockSpec((1, tb, n), lambda t, k: _i(k, t, 0),
                         memory_space=pltpu.VMEM),            # twiddles
        ],
        out_specs=[acc_spec, acc_spec],
        scratch_shapes=[
            pltpu.VMEM((r_rows, tb, dn), jnp.int8),           # digits
            pltpu.VMEM((kp1 * tb, n), jnp.uint32),            # acc64 hi
            pltpu.VMEM((kp1 * tb, n), jnp.uint32),            # acc64 lo
            pltpu.VMEM((kp1 * tb, n), I32),                   # alpha
        ],
    )

    consts = np.zeros((pcount, 2 + nbytes), np.int32)
    for k in range(pcount):
        consts[k, 0] = plan.p_i32[k]
        consts[k, 1] = (1 << 24) // int(plan.p_i32[k])        # fp24
        mk = int(plan.mk64[k])                                # M/p_k mod 2^q
        for i in range(nbytes):
            consts[k, 2 + i] = (mk >> (8 * i)) & 0xFF
    m64b = np.array([[(int(plan.m64) >> (8 * i)) & 0xFF
                      for i in range(nbytes)]], np.int32)
    invp = (1.0 / np.asarray(plan.p_i32, np.float64)).astype(
        np.float32).reshape(-1, 1)

    call = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((kp1, n_batch, n), jnp.uint32),
                   jax.ShapeDtypeStruct((kp1, n_batch, n), jnp.uint32)],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return call, consts, m64b, invp


def blind_rotate_pallas(plan: ntt.NttPlan, params: ParamSet,
                        bsk_limbs: jnp.ndarray, lwe_u64: jnp.ndarray,
                        test_glwe_u64: jnp.ndarray, fwd_full: jnp.ndarray,
                        inv_crt_full: jnp.ndarray, rot_table: jnp.ndarray,
                        *, interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.blind_rotate.blind_rotate (same result).

    lwe_u64 [B, n+1]; test_glwe_u64 [k+1, N] or [B, k+1, N]; bsk_limbs
    [n_lwe, Pr, R*2J, N] int8 (mod-q' rotate domain, plan.q_bits).
    Returns [B, k+1, N] u64.
    """
    from . import lwe  # local import to avoid cycle

    n_poly = params.polynomial_size
    two_n = 2 * n_poly
    n_batch = lwe_u64.shape[0]
    kp1 = params.glwe_dimension + 1
    q = plan.q_bits
    tilde = lwe.modswitch(lwe_u64, two_n)
    b_t = tilde[:, -1]
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

    call, consts, m64b, invp = _build_call(params, plan, n_batch,
                                           _resolve_tb(n_batch), interpret)

    def body(i, hl):
        hi, lo = hl
        g = jax.lax.dynamic_index_in_dim(bsk_limbs, i, axis=0,
                                         keepdims=False)     # [P, R2J, N]
        tw = jnp.take(rot_table, tilde[:, i], axis=1)        # [P, B, N]
        hi, lo = call(consts, m64b, invp, hi, lo, fwd_full, inv_crt_full,
                      g, tw)
        return hi, lo

    acc_hi, acc_lo = jax.lax.fori_loop(0, params.lwe_dimension, body,
                                       (acc_hi, acc_lo))
    acc = (acc_hi.astype(jnp.uint64) << jnp.uint64(32)) \
        | acc_lo.astype(jnp.uint64)
    if q < 64:   # mask CRT carry junk above bit q, scale back to 2^64
        acc = (acc & jnp.uint64((1 << q) - 1)) << jnp.uint64(64 - q)
    return jnp.transpose(acc, (1, 0, 2))             # [B, k+1, N]
