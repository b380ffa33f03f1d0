"""Pallas TPU kernels for the ops XLA lowers poorly.

CLAHE (ref pipeline/enhancement.py:277-280, skimage equalize_adapthist
semantics, numerically matching ``mdx.refimpl.filters_np.clahe``) is the
framework's one genuinely gather/scatter-bound op: per-tile histograms are a
scatter-add and the LUT remap is four 8M-element gathers, which XLA TPU
serialises (measured 477 ms for 32×512², vs ~3 ms for the whole 16-metric
pass).  This kernel runs the entire CLAHE — quantise, per-tile histograms,
clip + redistribute, CDF LUTs, 4-corner bilinear remap — inside VMEM for
one image per grid step, replacing every gather/scatter with
loop-over-bins broadcast arithmetic on the VPU:

* histogram:  for b in bins:  hist[b] = Rowᵀ · (q == b) · Col   (MXU)
* remap:      for b in bins:  out += (q == b) · (Wr · lut[b] · Wc)

Row/Col are constant 0/1 tile-membership matrices and Wr/Wc constant
bilinear-interpolation matrices (clamped half-tile-shifted hat weights),
so the per-tile reduction and the LUT upsample are plain [H,gy]-shaped
matmuls on the MXU — no reshapes, no gathers, no scatters.  The only VPU
sweeps are the (q == b) compares.

Kernel index (all interpret-parity-tested in tests/test_pallas.py; the
``MDX_*_IMPL`` knobs and their A/B status live in docs/PERF.md):

* CLAHE — whole-image (``clahe_tpu``/``_clahe_kernel``, ≤1024²) and
  banded two-phase (``_clahe_banded``, >1024²); the gather remap
  alternative was deleted after the real backend rejected multi-vreg
  ``tpu.dynamic_gather`` (docs/PERF.md measured dead ends)
* TV-Chambolle — whole-solve-in-VMEM (``tv_chambolle_tpu``, ≤1024²) and
  banded per-iteration (``tv_chambolle_banded``, halo rows snapshotted
  in XLA)
* Box statistics — both local-variance box pairs + image moments in one
  kernel (``box_stats_tpu``)
* Unsharp — fused blur+combine, whole-image (``unsharp_tpu``, ≤512²)
  and banded (``unsharp_banded_tpu``); MDX_UNSHARP_IMPL, measured ON
  (1.8–2.9× vs the XLA conv, 2026-08-18)
* Bilateral — fused d² window (``bilateral_tpu``); MDX_BILATERAL_IMPL,
  measured WASH — auto stays XLA
* Wavelet denoise — fused db1 BayesShrink chain
  (``wavelet_denoise_tpu``); MDX_WAVELET_IMPL, off — fails the real
  backend's vector-layout pass (lane-splitting reshape), reformulation
  lever in docs/PERF.md
A one-kernel fused image_stats (all 18 metric outputs from one read)
was built, interpret-verified and DELETED after the 2026-08-19 hardware
window: the in-kernel histograms fail the real backend two independent
ways and the best compilable ablation loses to the XLA pass outright —
measured dead-end record in docs/PERF.md.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Scoped-VMEM budget for the whole-image kernels.  Mosaic's DEFAULT scoped
# limit is 16 MB — far below v5e's physical VMEM: raising it to 100 MB
# compiles and runs the 1024²-class whole-image kernels (box stats 33 MB
# scoped, TV ~32 MB, CLAHE ~20 MB), unlocking whole-image CLAHE at 1024²
# (1.7 ms vs banded 9.8) and Pallas TV at 1024² (0.3 ms vs XLA 7.7).
# 2048²-class state (≥70 MB) fails to compile — that is the physical
# ceiling; the banded/XLA fallbacks remain for larger slices.
_SCOPED_VMEM_BYTES = 100 * 1024 * 1024

# ---------------------------------------------------------------------------
# Lowering-selection knobs
# ---------------------------------------------------------------------------
# Each op with competing lowerings has a trace-time MDX_*_IMPL env knob
# resolved by _impl_mode; "auto" is the measured per-size-class policy
# from the hardware A/Bs (docs/PERF.md).  The env vars are read at TRACE
# time: set them before the process first compiles; already-compiled
# programs keep their lowering (the knobs are not part of the jit cache
# key).  The CLAHE remap once had a gather alternative
# (MDX_CLAHE_IMPL=gather); the real Mosaic backend rejects
# multi-source-vreg tpu.dynamic_gather, so the matmul remap is the ONLY
# CLAHE lowering (measured dead end, docs/PERF.md 2026-08-18).


# The platform every empirical constant in this module and in
# mdx/core/batching.py was swept on: the kernel auto-dispatch size
# classes (whole-image limits, band tables), the scoped-VMEM budget and
# the sub-batching pixel knee are all measurements of THIS chip under
# THIS compiler (docs/PERF.md).  A different TPU generation or a jaxlib
# bump shifts the knees — warn so it gets re-swept (tools/sweep_knee.py,
# tools/profile_pass.py --ab) instead of silently pessimising.
_SWEPT_DEVICE_KIND = "TPU v5 lite"
_SWEPT_JAX_VERSION = "0.9.0"
_platform_checked = False


def check_swept_platform() -> None:
    """One-time log warning when the runtime TPU/compiler differs from
    the platform the empirical dispatch/knee constants were swept on."""
    global _platform_checked
    if _platform_checked:
        return
    try:
        dev = jax.devices()[0]
        if dev.platform != "tpu":
            return  # constants only gate real-TPU behavior
        kind = dev.device_kind
    except Exception:
        return
    _platform_checked = True
    import logging

    log = logging.getLogger("mdx.ops")
    if kind != _SWEPT_DEVICE_KIND:
        log.warning(
            "TPU device_kind %r differs from %r, the platform the "
            "kernel-dispatch and sub-batching constants were swept on — "
            "re-sweep (tools/sweep_knee.py, tools/profile_pass.py --ab) "
            "before trusting the measured knees.",
            kind, _SWEPT_DEVICE_KIND)
    elif jax.__version__ != _SWEPT_JAX_VERSION:
        log.warning(
            "jax %s differs from %s, the version the kernel-dispatch and "
            "sub-batching constants were swept on (and the version whose "
            "real-backend kernel parity was probed — run "
            "tools/parity_sweep.py: docs/PERF.md records a "
            "compiles-but-miscomputes gather class interpret mode cannot "
            "catch).", jax.__version__, _SWEPT_JAX_VERSION)


def on_tpu_backend() -> bool:
    """True when jax's default backend is TPU (False when the backend
    cannot be determined).  The single dispatch gate shared by the ops
    with Pallas lowerings (clahe/tv/unsharp/bilateral) — reads
    ``jax.default_backend`` at CALL time so tests can monkeypatch it."""
    try:
        if jax.default_backend() == "tpu":
            check_swept_platform()
            return True
        return False
    except Exception:
        return False


def _impl_mode(env_var: str, impl: str | None,
               choices: tuple[str, str]) -> str:
    """Resolve a trace-time lowering knob to 'auto' or one of ``choices``.

    ``impl`` overrides the env var (A/B tooling pins one lowering per
    candidate regardless of the environment).  Unrecognised values raise
    — the knobs are trace-time-only with no logging, so a typo silently
    keeping the default would be invisible."""
    mode = (impl if impl is not None
            else os.environ.get(env_var, "auto")).strip().lower()
    if mode != "auto" and mode not in choices:
        raise ValueError(f"{env_var}={mode!r}: expected auto, "
                         f"{choices[0]} or {choices[1]}")
    return mode


def _tile_membership(n_pix: int, t: int) -> np.ndarray:
    """[n_pix, n_pix//t] 0/1 matrix: pixel p belongs to tile p//t."""
    g = n_pix // t
    m = np.zeros((n_pix, g), np.float32)
    m[np.arange(n_pix), np.arange(n_pix) // t] = 1.0
    return m


def _interp_matrix(n_pix: int, t: int) -> np.ndarray:
    """[n_pix//t, n_pix] bilinear LUT-upsample weights.

    Column p carries the two clamped hat weights of skimage
    equalize_adapthist's tile interpolation: f = (p+0.5)/t − 0.5,
    g0 = clip(floor(f)), g1 = min(g0+1, g−1), w = clip(f − g0, 0, 1).
    """
    g = n_pix // t
    m = np.zeros((g, n_pix), np.float32)
    p = np.arange(n_pix)
    f = (p + 0.5) / t - 0.5
    g0 = np.clip(np.floor(f).astype(int), 0, g - 1)
    g1 = np.minimum(g0 + 1, g - 1)
    wgt = np.clip(f - g0, 0.0, 1.0)
    m[g0, p] += 1.0 - wgt
    m[g1, p] += wgt
    return m


def clahe_precision(impl: str | None = None) -> bool:
    """True (default) = exact concat-bf16-split remap matmuls; False =
    the opt-in single-pass bf16 remap (``MDX_CLAHE_PRECISION=fast``).

    Exactness is effectively free for the whole-image kernel (≤7%), but
    the banded >1024² class is MXU-MAC-bound and the 3× contraction
    costs ~4× there (16×2048²: ~25 ms relaxed vs 106.8 exact — config 2
    at batch 64: 848.9 ms exact vs ~530 relaxed; docs/PERF.md).  The
    fast mode's measured deviation bound is ≤4e-3 (≈1 gray level of
    256) vs the XLA lowering; defaults stay exact — golden parity is
    the invariant (CLAUDE.md), the knob mirrors MDX_TV_MODE."""
    mode = _impl_mode("MDX_CLAHE_PRECISION", impl, ("exact", "fast"))
    return mode != "fast"


def _bf16_split(a):
    """(hi, lo) with hi = bf16-rounded(a), lo = the f32 residual: both
    parts are exactly representable in bf16's mantissa budget relative
    to their own exponents, so DEFAULT-precision (one bf16 pass) MXU
    products of split operands are EXACT and accumulate in f32.

    This is how every real-valued in-kernel matmul recovers f32
    fidelity: the TPU's DEFAULT f32 matmul runs one bf16 pass (~0.4%
    operand rounding — tools/parity_sweep.py round 5 caught CLAHE's
    remap deviating ~4e-3 from the XLA lowering after shipping
    unnoticed since round 2; interpret parity cannot see it), Mosaic
    rejects Precision.HIGH outright and HIGHEST both costs 6 passes and
    crashes the compiler at some shapes.  Concatenating the split
    blocks along the contraction dim turns the 3-4 correction matmuls
    into ONE wider DEFAULT matmul — the per-matmul Mosaic overhead, not
    K, dominates at these sizes (measured 14.9 → 5.98 ms; docs/PERF.md
    round-5 table)."""
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def _clahe_kernel(clip_ref, x_ref, row_sel_ref, col_sel_ref, wr4_ref,
                  wc3_ref, out_ref, hist_ref,
                  lut_ref, *, h: int, w: int, t: int, nbins: int,
                  exact: bool):
    """One image per grid step; everything stays in VMEM.

    clip_ref: SMEM [N] per-image clip limits (traced — sweeps don't
    recompile), indexed by the grid position.  The four constant selector /
    interpolation matrices arrive as (grid-invariant) VMEM inputs.
    hist_ref/lut_ref: VMEM scratch [nbins, gy, gx].
    """
    gy, gx = h // t, w // t
    x = x_ref[0]
    q = jnp.minimum((x * nbins).astype(jnp.int32), nbins - 1)

    row_sel = row_sel_ref[:]                                 # [gy, h]
    col_sel = col_sel_ref[:]                                 # [w, gx]

    # ---- per-tile histograms: Rowᵀ·(q==b)·Col on the MXU ---------------
    # 8-bin unroll: fewer loop iterations amortise Mosaic's per-step
    # overhead (measured with the 16-way remap unroll below:
    # CLAHE 7.3 → 5.9 ms at 32×512², bit-exact)
    _HIST_UNROLL = 8

    def hist_body(b0, _):
        for j in range(_HIST_UNROLL):
            b = b0 * _HIST_UNROLL + j
            mask = (q == b).astype(jnp.float32)
            s1 = jnp.dot(row_sel, mask,
                         preferred_element_type=jnp.float32)  # [gy, w]
            hist_ref[b] = jnp.dot(s1, col_sel,
                                  preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, nbins // _HIST_UNROLL, hist_body, 0)

    # ---- clip + uniform redistribution + running CDF --------------------
    npix = float(t * t)
    clim = jnp.maximum(clip_ref[pl.program_id(0)] * npix, 1.0)

    _CDF_UNROLL = 8

    def excess_body(b0, acc):
        for j in range(_CDF_UNROLL):
            acc = acc + jnp.maximum(hist_ref[b0 * _CDF_UNROLL + j]
                                    - clim, 0.0)
        return acc

    excess = jax.lax.fori_loop(
        0, nbins // _CDF_UNROLL, excess_body,
        jnp.zeros((gy, gx), jnp.float32))
    redist = excess / nbins

    def cdf_body(b0, running):
        for j in range(_CDF_UNROLL):
            b = b0 * _CDF_UNROLL + j
            running = running + jnp.minimum(hist_ref[b], clim) + redist
            lut_ref[b] = running
        return running

    total = jax.lax.fori_loop(
        0, nbins // _CDF_UNROLL, cdf_body,
        jnp.zeros((gy, gx), jnp.float32))
    cdf0 = lut_ref[0]
    denom = jnp.maximum(total - cdf0, 1e-12)

    # ---- remap: out += (q==b) · (Wr · lut[b] · Wc) on the MXU -----------
    wr4 = wr4_ref[:]                 # [h, 4·gy]: [hi | hi | lo | lo]
    wc3 = wc3_ref[:]                 # [3·gx, w]: [hi ; lo ; hi]

    out_ref[0] = jnp.zeros((h, w), jnp.float32)

    # 16-bin unroll: the accumulator read-modify-write is [h, w] — one
    # per UNROLLED group instead of one per bin cuts the remap's VMEM
    # accumulator traffic 16× (the dominant non-compute cost; measured
    # 7.3 → 5.9 ms with the hist unroll above, bit-exact: the per-bin
    # terms are disjoint (q == b selects each pixel once), so grouping
    # the adds cannot reorder any pixel's contributions)
    _REMAP_UNROLL = 16

    # Remap dots carry real-valued operands, so they run as
    # concatenated bf16-split DEFAULT matmuls (_bf16_split): the row
    # interpolation keeps all four hi/lo product blocks (exact), the
    # wide column dot keeps three (drops lo·lo, ≤~2e-5) — vs 4e-3 for a
    # plain DEFAULT dot and 22.8 ms for HIGHEST (docs/PERF.md round-5
    # table).  At this size class the kernel is matmul-INSTRUCTION-
    # bound, so the dots are additionally hoisted across the 16-bin
    # unroll group: ONE row-interp dot per group ([h, 4·gy]×[4·gy,
    # 16·gx]) and blend in 4-bin sub-batches ([4·h, 3·gx]×[3·gx, w]) —
    # 512 → 5 matmul instructions per group, measured 5.98 → 5.06
    # ms/batch at 32×512² (parity 1.0e-5), faster than even the broken
    # single-pass kernel's 5.6.  The histogram dots above stay plain
    # DEFAULT: 0/1 matrices × 0/1 masks accumulate exact integer
    # counts ≤ t² in any precision.
    _SUB = 4

    def remap_body(b0, _):
        lbs = [(lut_ref[b0 * _REMAP_UNROLL + j] - cdf0) / denom
               for j in range(_REMAP_UNROLL)]                # [gy, gx] ea
        if exact:
            lb4s = []
            for lb in lbs:
                lb_hi, lb_lo = _bf16_split(lb)
                lb4s.append(jnp.concatenate(
                    [lb_hi, lb_lo, lb_hi, lb_lo], axis=0))
            lb_all = jnp.concatenate(lb4s, axis=1)   # [4·gy, U·gx]
            rows_all = jnp.dot(wr4, lb_all,
                               preferred_element_type=jnp.float32)
        else:
            # MDX_CLAHE_PRECISION=fast: single-pass bf16 remap,
            # unsplit weights recovered from the split blocks
            wr = wr4[:, :gy] + wr4[:, 2 * gy:3 * gy]
            lb_all = jnp.concatenate(lbs, axis=1)    # [gy, U·gx]
            rows_all = jnp.dot(wr, lb_all,
                               preferred_element_type=jnp.float32)
        acc = None
        for sub in range(_REMAP_UNROLL // _SUB):
            rbatch = []
            for jj in range(_SUB):
                i = sub * _SUB + jj
                r = rows_all[:, i * gx:(i + 1) * gx]
                if exact:
                    r_hi, r_lo = _bf16_split(r)
                    rbatch.append(jnp.concatenate(
                        [r_hi, r_hi, r_lo], axis=1))          # [h, 3·gx]
                else:
                    rbatch.append(r)
            rb = jnp.concatenate(rbatch, axis=0)
            if exact:
                blend_b = jnp.dot(rb, wc3,
                                  preferred_element_type=jnp.float32)
            else:
                wc = wc3[:gx] + wc3[gx:2 * gx]
                blend_b = jnp.dot(rb, wc,
                                  preferred_element_type=jnp.float32)
            for jj in range(_SUB):
                b = b0 * _REMAP_UNROLL + sub * _SUB + jj
                term = jnp.where(q == b,
                                 blend_b[jj * h:(jj + 1) * h], 0.0)
                acc = term if acc is None else acc + term
        out_ref[0] = out_ref[0] + acc
        return 0

    jax.lax.fori_loop(0, nbins // _REMAP_UNROLL, remap_body, 0)


@functools.partial(jax.jit, static_argnames=("tile_size", "nbins",
                                             "interpret"))
def clahe_tpu(
    x: jnp.ndarray,
    clip_limit: jnp.ndarray,
    tile_size: int = 16,
    nbins: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas CLAHE on [N,H,W] float32 in [0,1]; per-image traced
    ``clip_limit`` ([N] or scalar).  H and W are padded to tile multiples
    (reflect, matching mdx.ops.clahe) and cropped on the way out."""
    n, h, w = x.shape
    t = int(tile_size)
    pad_h = (-h) % t
    pad_w = (-w) % t
    xp = jnp.clip(x, 0.0, 1.0)
    if pad_h or pad_w:
        xp = jnp.pad(xp, ((0, 0), (0, pad_h), (0, pad_w)), mode="reflect")
    ph, pw = h + pad_h, w + pad_w
    gy, gx = ph // t, pw // t

    clip_arr = jnp.broadcast_to(
        jnp.asarray(clip_limit, jnp.float32).reshape(-1), (n,))

    if ph * pw > _WHOLE_IMAGE_LIMIT:
        # image + LUT state would overflow VMEM — use the banded 2-phase
        # kernels (per-tile-row grid) instead.
        out = _clahe_banded(xp, clip_arr, t, nbins, interpret)
        return out[:, :h, :w]

    row_sel = jnp.asarray(_tile_membership(ph, t).T)         # [gy, ph]
    col_sel = jnp.asarray(_tile_membership(pw, t))           # [pw, gx]
    # bf16-split interpolation constants for the exact concat matmuls
    # (see _bf16_split / the remap loop)
    w_row = jnp.asarray(_interp_matrix(ph, t).T)             # [ph, gy]
    wr_hi, wr_lo = _bf16_split(w_row)
    wr4 = jnp.concatenate([wr_hi, wr_hi, wr_lo, wr_lo], axis=1)
    w_col = jnp.asarray(_interp_matrix(pw, t))               # [gx, pw]
    wc_hi, wc_lo = _bf16_split(w_col)
    wc3 = jnp.concatenate([wc_hi, wc_lo, wc_hi], axis=0)

    def _const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_clahe_kernel, h=ph, w=pw, t=t,
                               nbins=nbins, exact=clahe_precision())
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ph, pw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(row_sel.shape),
            _const_spec(col_sel.shape),
            _const_spec(wr4.shape),
            _const_spec(wc3.shape),
        ],
        out_specs=pl.BlockSpec((1, ph, pw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ph, pw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbins, gy, gx), jnp.float32),
            pltpu.VMEM((nbins, gy, gx), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_BYTES),
        interpret=interpret,
    )(clip_arr, xp, row_sel, col_sel, wr4, wc3)
    return out[:, :h, :w]


# ---------------------------------------------------------------------------
# TV-Chambolle denoise — VMEM-resident dual-ascent iterations
# ---------------------------------------------------------------------------


def _tv_kernel(weight_ref, x_ref, out_ref, *, h: int, w: int,
               eps: float, max_iter: int):
    """One image per grid step; the whole dual-ascent solve stays in VMEM.

    The XLA while_loop version streams ~10 full-image buffers through HBM
    per iteration (~0.8 ms × ~50 iterations at 32×512²); here x, out and
    the dual field p never leave VMEM, so iterations are VPU-bound.
    Semantics match mdx/ops/tv.py (skimage denoise_tv_chambolle): step
    τ=1/4, stop when |E_prev − E| < eps·E_init or after max_iter, with
    per-image (per-grid-step) convergence.
    """
    x = x_ref[0]
    wgt = weight_ref[pl.program_id(0)]
    tau = 0.25
    size = float(h * w)

    zero = jnp.zeros((h, w), jnp.float32)

    def energy_and_grads(p0, p1, first: bool):
        if first:
            d = zero
            out = x
        else:
            d = -(p0 + p1)
            d = d + jnp.concatenate(
                [jnp.zeros((1, w), jnp.float32), p0[:-1, :]], axis=0)
            d = d + jnp.concatenate(
                [jnp.zeros((h, 1), jnp.float32), p1[:, :-1]], axis=1)
            out = x + d
        e = jnp.sum(d * d)
        gy = jnp.concatenate([out[1:, :] - out[:-1, :],
                              jnp.zeros((1, w), jnp.float32)], axis=0)
        gx = jnp.concatenate([out[:, 1:] - out[:, :-1],
                              jnp.zeros((h, 1), jnp.float32)], axis=1)
        norm = jnp.sqrt(gy * gy + gx * gx)
        e = (e + wgt * jnp.sum(norm)) / size
        return out, gy, gx, norm, e

    def update_p(p0, p1, gy, gx, norm):
        scale = norm * tau / wgt + 1.0
        return (p0 - tau * gy) / scale, (p1 - tau * gx) / scale

    out0, gy, gx, norm, e0 = energy_and_grads(zero, zero, first=True)
    p0, p1 = update_p(zero, zero, gy, gx, norm)

    def cond(state):
        i, _p0, _p1, _out, e_prev, done = state
        return jnp.logical_and(i < max_iter, jnp.logical_not(done))

    def body(state):
        i, p0, p1, out, e_prev, done = state
        out2, gy, gx, norm, e = energy_and_grads(p0, p1, first=False)
        p0, p1 = update_p(p0, p1, gy, gx, norm)
        done = jnp.abs(e_prev - e) < eps * e0
        return (i + 1, p0, p1, out2, e, done)

    _, _, _, out, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(1), p0, p1, out0, e0, jnp.bool_(False)))
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("eps", "max_iter", "interpret"))
def tv_chambolle_tpu(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    eps: float = 2e-4,
    max_iter: int = 200,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas TV denoise of [N,H,W]; per-image traced ``weight``."""
    n, h, w = x.shape
    weight_arr = jnp.broadcast_to(
        jnp.asarray(weight, jnp.float32).reshape(-1), (n,))
    kernel = functools.partial(_tv_kernel, h=h, w=w, eps=float(eps),
                               max_iter=int(max_iter))
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_BYTES),
        interpret=interpret,
    )(weight_arr, x)


# ---------------------------------------------------------------------------
# Banded CLAHE for large slices (whole image exceeds VMEM at ≥1024²)
# ---------------------------------------------------------------------------


def _tile_hist_nibble(xp: jnp.ndarray, t: int, nbins: int) -> jnp.ndarray:
    """Per-tile CLAHE histograms of [N, ph, pw] → [N, gy, nbins, gx] as one
    XLA nibble-one-hot einsum (mdx/ops/hist.py counts_from_indices_grouped).

    Replaces the per-band Pallas hist kernel: that kernel's per-bin
    [1,t]×[t,w] matmuls ran at M=1 MXU utilisation (measured 121 ms for
    16×2048², t=16, 256 bins, vs 20 ms for this formulation).  The floor
    quantisation matches the remap kernel's ``q`` exactly, so counts are
    identical integers.
    """
    from mdx.ops.hist import counts_from_indices_grouped

    n, ph, pw = xp.shape
    gy, gx = ph // t, pw // t
    q = jnp.minimum((xp * nbins).astype(jnp.int32), nbins - 1)
    qt = q.reshape(n, gy, t, gx, t).transpose(0, 1, 3, 2, 4)
    hist = counts_from_indices_grouped(
        qt.reshape(n, gy * gx, t * t), nbins)                  # [N, gy·gx, nbins]
    return hist.reshape(n, gy, gx, nbins).transpose(0, 1, 3, 2)


def _clahe_remap_kernel(x_ref, lutwin_ref, wc3_ref,
                        wr4_ref, out_ref, *,
                        R: int, w: int, nbins: int, gx: int, nw: int,
                        exact: bool):
    """Grid (N, gy/B): remap B tile-rows (R = B·t pixel rows) through
    their (B+2)-row LUT window.

    ``lutwin_ref`` [1, 1, nw, nbins, gx] carries the (edge-clamped) LUT
    rows g0−1 … g0+B; within the step, pixel row r interpolates between
    window rows via the constant block-banded matrix behind ``wr4_ref``.
    Processing B tile-rows per step puts M = R on the matmuls — the
    round-5 M=t kernel fed the 128-row MXU 16-row operands and ran
    MAC-bound at ~30% utilisation on 2048² slices; B=8/16 measured
    2.1× faster (226.9 → 105.8 ms at 16×2048², docs/PERF.md).

    Both remap contractions are concat-bf16-split DEFAULT matmuls
    (_bf16_split): ``wr4_ref`` [R, 4·nw] = [hi | hi | lo | lo] row
    weights (all four product blocks → exact), ``wc3_ref`` [3·gx, w] =
    [hi ; lo ; hi] column weights (drops lo·lo ≤ 2e-5).
    """
    band = x_ref[0, 0]
    q = jnp.minimum((band * nbins).astype(jnp.int32), nbins - 1)
    wr4 = wr4_ref[:]
    wc3 = wc3_ref[:]

    # 16-bin unroll: one [R, w] accumulator read-modify-write per group
    # instead of per bin (disjoint q == b terms → grouping is bit-exact)
    _REMAP_UNROLL = 16

    def body(b0, _):
        acc = None
        for j in range(_REMAP_UNROLL):
            b = b0 * _REMAP_UNROLL + j
            lutw = lutwin_ref[0, 0, :, b, :]                  # [nw, gx]
            if exact:
                lw_hi, lw_lo = _bf16_split(lutw)
                lut4 = jnp.concatenate([lw_hi, lw_lo, lw_hi, lw_lo],
                                       axis=0)                # [4·nw, gx]
                rows = jnp.dot(wr4, lut4,
                               preferred_element_type=jnp.float32)
                r_hi, r_lo = _bf16_split(rows)
                r3 = jnp.concatenate([r_hi, r_hi, r_lo],
                                     axis=1)                  # [R, 3·gx]
                blend = jnp.dot(r3, wc3,
                                preferred_element_type=jnp.float32)
            else:
                # MDX_CLAHE_PRECISION=fast: single-pass bf16 remap
                wr = wr4[:, :nw] + wr4[:, 2 * nw:3 * nw]
                wc = wc3[:gx] + wc3[gx:2 * gx]
                rows = jnp.dot(wr, lutw,
                               preferred_element_type=jnp.float32)
                blend = jnp.dot(rows, wc,
                                preferred_element_type=jnp.float32)
            term = jnp.where(q == b, blend, 0.0)
            acc = term if acc is None else acc + term
        out_ref[0, 0] = out_ref[0, 0] + acc
        return 0

    out_ref[0, 0] = jnp.zeros((R, w), jnp.float32)
    jax.lax.fori_loop(0, nbins // _REMAP_UNROLL, body, 0)


def _banded_row_weights(t: int, b: int = 1) -> np.ndarray:
    """[b·t, b+2] hat weights of step-local pixel rows onto the step's
    LUT window rows (g0−1 … g0+b): within tile-row kk, local row i has
    f = (i+0.5)/t − 0.5 and interpolates window rows kk+1+⌊f⌋ and the
    next with weights 1−frac(f), frac(f)."""
    R = b * t
    wr = np.zeros((R, b + 2), np.float32)
    for r in range(R):
        kk, i = divmod(r, t)
        f = (i + 0.5) / t - 0.5
        up = int(np.floor(f))
        wgt = np.float32(f - up)
        wr[r, kk + 1 + up] += np.float32(1.0) - wgt
        wr[r, kk + 2 + up] += wgt
    return wr


def _concat_split_rows(w: np.ndarray) -> jnp.ndarray:
    """[R, K] f32 weights → [R, 4K] = [hi | hi | lo | lo] for the exact
    bf16x4 concat matmul (_bf16_split)."""
    a = jnp.asarray(w)
    hi, lo = _bf16_split(a)
    return jnp.concatenate([hi, hi, lo, lo], axis=1)


def _clahe_banded(xp: jnp.ndarray, clip_arr: jnp.ndarray, t: int,
                  nbins: int, interpret: bool) -> jnp.ndarray:
    """Two-phase CLAHE: XLA nibble per-tile hist → XLA clip/CDF →
    multi-tile-row remap kernel with a (B+2)-row LUT window.  Handles
    slices whose whole-image state would not fit VMEM (e.g. 2048² CXR
    batches, BASELINE config 2).  B = largest power of two ≤ 16
    dividing the tile-row count (measured plateau B=8…16 at 2048²;
    larger B also grows the per-step VMEM ask)."""
    n, ph, pw = xp.shape
    gy, gx = ph // t, pw // t
    B = 1
    for cand in (16, 8, 4, 2):
        if gy % cand == 0:
            B = cand
            break
    steps = gy // B
    nw = B + 2

    xb = xp.reshape(n, steps, B * t, pw)
    hists = _tile_hist_nibble(xp, t, nbins)                   # [N,gy,nbins,gx]

    # clip + redistribute + CDF + normalise (tiny: [N, gy, nbins, gx])
    npix = float(t * t)
    clim = jnp.maximum(clip_arr * npix, 1.0)[:, None, None, None]
    excess = jnp.sum(jnp.maximum(hists - clim, 0.0), axis=2, keepdims=True)
    hists = jnp.minimum(hists, clim) + excess / nbins
    cdf = jnp.cumsum(hists, axis=2)
    cdf0 = cdf[:, :, :1, :]
    total = cdf[:, :, -1:, :]
    lut = (cdf - cdf0) / jnp.maximum(total - cdf0, 1e-12)    # [N,gy,nbins,gx]

    # per-step (B+2)-row windows with edge clamping
    lut_pad = jnp.concatenate(
        [lut[:, :1], lut, lut[:, -1:]], axis=1)               # [N, gy+2, ...]
    win = jnp.stack([lut_pad[:, s * B:s * B + nw]
                     for s in range(steps)], axis=1)
    # [N, steps, nw, nbins, gx]

    w_col = jnp.asarray(_interp_matrix(pw, t))
    wc_hi, wc_lo = _bf16_split(w_col)
    wc3 = jnp.concatenate([wc_hi, wc_lo, wc_hi], axis=0)
    wr4 = _concat_split_rows(_banded_row_weights(t, B))
    out = pl.pallas_call(
        functools.partial(_clahe_remap_kernel, R=B * t, w=pw,
                          nbins=nbins, gx=gx, nw=nw,
                          exact=clahe_precision()),
        grid=(n, steps),
        in_specs=[
            pl.BlockSpec((1, 1, B * t, pw), lambda i, g: (i, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nw, nbins, gx),
                         lambda i, g: (i, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * gx, pw), lambda i, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B * t, 4 * nw), lambda i, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, B * t, pw),
                               lambda i, g: (i, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, steps, B * t, pw),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_BYTES),
        interpret=interpret,
    )(xb, win, wc3, wr4)
    return out.reshape(n, ph, pw)


# Whole-image kernel VMEM budget: image + out + 2×(nbins·gy·gx) floats.
_WHOLE_IMAGE_LIMIT = 1024 * 1024  # raised-scoped-VMEM bound (see top)


# ---------------------------------------------------------------------------
# Box-filter local-variance statistics — VMEM-resident separable shift-add
# ---------------------------------------------------------------------------


def _k_sep_box(ap: jnp.ndarray, size: int, off: int, h: int,
               w: int) -> jnp.ndarray:
    """Separable shift-add box mean of a (8,7)-symmetric-padded plane
    ``ap`` [h+15, w+15] → [h, w], reading the window at column/row offset
    ``off`` (size 7 → 5, size 16 → 0: mirror pads nest).  Accumulation
    order matches mdx/ops/filters.py box_filter exactly (sequential
    shifted adds, one 1/size scale per axis).  Shared by the box-stats
    and fused-stats kernels so their values cannot drift apart."""
    inv = jnp.float32(1.0 / size)
    racc = jax.lax.slice(ap, (off, 0), (off + h, w + 15))
    for i in range(1, size):
        racc = racc + jax.lax.slice(ap, (off + i, 0),
                                    (off + i + h, w + 15))
    racc = racc * inv
    cacc = jax.lax.slice(racc, (0, off), (h, off + w))
    for j in range(1, size):
        cacc = cacc + jax.lax.slice(racc, (0, off + j),
                                    (h, off + j + w))
    return cacc * inv


def _box_stats_kernel(xp_ref, out_ref, *, h: int, w: int):
    """One image per grid step: both local-variance box pairs (7×7 and
    16×16, SciPy uniform_filter semantics via the pre-mirrored input) and
    their image reductions, entirely in VMEM.

    The XLA lowering streams ~8 [N,H,W] intermediates through HBM between
    the shift-add sweeps (measured 8% of VPU roofline, docs/PERF.md
    roofline table); here the padded image is read once and only three
    scalars leave the kernel.  ``xp``: [h+15, w+15] symmetric-padded
    image, pad (8, 7) per axis — the size-7 window reads it at offset 5
    (mirror pads nest); box semantics in :func:`_k_sep_box`."""
    xp = xp_ref[0]
    x2p = xp * xp

    def sep_box(ap, size, off):
        return _k_sep_box(ap, size, off, h, w)

    m7 = sep_box(xp, 7, 5)
    m7_2 = sep_box(x2p, 7, 5)
    lv7s = jnp.sqrt(jnp.maximum(m7_2 - m7 * m7, 0.0))
    mu7 = jnp.mean(lv7s)
    lcs = jnp.sqrt(jnp.mean(jnp.square(lv7s - mu7)))

    m16 = sep_box(xp, 16, 0)
    m16_2 = sep_box(x2p, 16, 0)
    lv16 = jnp.maximum(m16_2 - m16 * m16, 0.0)
    mu16 = jnp.mean(lv16)
    s16 = jnp.sqrt(jnp.mean(jnp.square(lv16 - mu16)))

    out_ref[...] = jnp.stack(
        [lcs, mu16, s16, jnp.float32(0.0)]).reshape(1, 1, 4)


# whole-image box kernel: padded image + ~6 [H,W] live intermediates must
# fit VMEM (same budget class as the CLAHE whole-image kernel)
_BOX_WHOLE_IMAGE_LIMIT = 512 * 512


def box_stats_tpu(x: jnp.ndarray, interpret: bool = False):
    """(std(sqrt(lv7)), mean(lv16), std(lv16)) per image — the three
    local-variance reductions of the metric pass (mdx/core/metrics.py
    image_stats) as one Pallas kernel.  Returns None-equivalent via the
    caller's dispatch for images too large for whole-image VMEM."""
    n, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (8, 7), (8, 7)), mode="symmetric")
    kernel = functools.partial(_box_stats_kernel, h=h, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h + 15, w + 15), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_BYTES),
        interpret=interpret,
    )(xp)
    return out[:, 0, 0], out[:, 0, 1], out[:, 0, 2]


def box_stats_fits(h: int, w: int) -> bool:
    return h * w <= _BOX_WHOLE_IMAGE_LIMIT


# ---------------------------------------------------------------------------
# Banded TV-Chambolle for large slices (whole-image state exceeds VMEM >1024²)
# ---------------------------------------------------------------------------


def _tv_band_kernel(active_ref, weight_ref, glast_ref, x_ref, xdn_ref,
                    p0_ref, p1_ref, p0up_ref, p0dn_ref, p1dn_ref, outprev_ref,
                    p0o_ref, p1o_ref, outo_ref, eparts_ref, *,
                    band: int, w: int, n_bands: int):
    """ONE Chambolle dual-ascent iteration over a band of rows.

    Grid (image, band); the iteration loop stays in XLA (lax.while_loop
    calling this kernel once per iteration) because >1024² state cannot be
    VMEM-resident.  vs the pure-XLA iteration this fuses the ~10 streamed
    intermediates (d, out, gy, gx, norm, scale, …) into one pass: per
    iteration the HBM traffic is exactly read {x, p0, p1, out} + write
    {p0, p1, out} + O(rows) halos.

    The row-halo terms of the stencil (p0[a−1] for the divergence, p0/p1/x
    at row b for the band's last gy row) arrive as [n_bands, w] snapshot
    arrays strided-sliced from the PRE-iteration state in XLA — grid steps
    on TPU are sequential and p0/p1/out are aliased in place, so band k+1
    must not read rows band k just overwrote.

    Per-image convergence: ``active`` gates a copy-through (outputs are
    aliased, but Pallas still DMAs every output block, so frozen images
    must write their old values).  Energy partials (Σd², Σ‖∇out‖) exit as
    per-band scalars; XLA reduces them and owns the stop test.

    Semantics: skimage denoise_tv_chambolle / mdx.ops.tv.tv_chambolle_xla
    (ref pipeline/enhancement.py:309-312); bit-exact vs the XLA form at
    fixed trip counts (energy partials reduce band-first, so the stop test
    can differ by one iteration in the last ulp of E).

    ``glast`` (SMEM, [1]): whether this array's last row is the GLOBAL
    image edge (gy there is zero).  Dense callers pass 1; the spatially-
    sharded caller (mdx/parallel/tv_sp.py) passes ``axis_index == k−1``
    and supplies ppermuted neighbour rows as the edge halos, so interior
    shards compute real gradients across the shard boundary.
    """
    i = pl.program_id(0)
    b = pl.program_id(1)
    act = active_ref[i] != 0
    wgt = weight_ref[i]
    glast = glast_ref[0] != 0
    tau = 0.25

    x = x_ref[0]            # [band, w]
    p0 = p0_ref[0]
    p1 = p1_ref[0]
    up = p0up_ref[0]        # [1, w] — p0 row above the band (zeros for b=0)

    # divergence  d = −(p0+p1) + shift_down(p0) + shift_right(p1)
    d = -(p0 + p1)
    d = d + jnp.concatenate([up, p0[:-1, :]], axis=0)
    d = d + jnp.concatenate(
        [jnp.zeros((band, 1), jnp.float32), p1[:, :-1]], axis=1)
    out = x + d

    # the row just below the band, for the band's last gy row
    p0dn = p0dn_ref[0]      # [1, w] (zeros for the last band — masked below)
    p1dn = p1dn_ref[0]
    xdn = xdn_ref[0]
    ddn = -(p0dn + p1dn) + p0[band - 1:band, :] + jnp.concatenate(
        [jnp.zeros((1, 1), jnp.float32), p1dn[:, :-1]], axis=1)
    outdn = xdn + ddn

    gy = jnp.concatenate([out[1:, :], outdn], axis=0) - out
    last_row = jnp.logical_and(
        jnp.logical_and(b == n_bands - 1, glast),
        jax.lax.broadcasted_iota(jnp.int32, (band, w), 0) == band - 1)
    gy = jnp.where(last_row, 0.0, gy)
    gx = jnp.concatenate(
        [out[:, 1:] - out[:, :-1], jnp.zeros((band, 1), jnp.float32)], axis=1)
    norm = jnp.sqrt(gy * gy + gx * gx)

    scale = norm * tau / wgt + 1.0
    np0 = (p0 - tau * gy) / scale
    np1 = (p1 - tau * gx) / scale

    p0o_ref[0] = jnp.where(act, np0, p0)
    p1o_ref[0] = jnp.where(act, np1, p1)
    outo_ref[0] = jnp.where(act, out, outprev_ref[0])
    eparts_ref[...] = jnp.stack(
        [jnp.sum(d * d), jnp.sum(norm)]).reshape(1, 1, 2)


def _tv_band_step(x, xdn, p0, p1, out_prev, active, weight_arr, band, kernel,
                  interpret, up_row=None, dn_p0=None, dn_p1=None, glast=None):
    """One banded Chambolle iteration: snapshot halos, run the kernel.

    ``up_row``/``dn_p0``/``dn_p1`` ([N,1,W]) override the rows adjacent
    to the ARRAY edges (dense default: zeros = global image boundary;
    the sharded caller passes the neighbour shard's ppermuted rows).
    ``glast`` ([1] int32): see ``_tv_band_kernel``."""
    n, h, w = x.shape
    nb = h // band
    zrow = jnp.zeros((n, 1, w), jnp.float32)
    up_row = zrow if up_row is None else up_row
    dn_p0 = zrow if dn_p0 is None else dn_p0
    dn_p1 = zrow if dn_p1 is None else dn_p1
    glast = jnp.ones((1,), jnp.int32) if glast is None else glast
    # halo arrays flattened to [n*nb, 1, w] so the banded (1,1,w) blocks
    # keep their last two dims full-size (Mosaic block-shape rule)
    p0up = jnp.concatenate(
        [up_row, p0[:, band - 1:h - 1:band, :]], axis=1).reshape(n * nb, 1, w)
    p0dn = jnp.concatenate(
        [p0[:, band::band, :], dn_p0], axis=1).reshape(n * nb, 1, w)
    p1dn = jnp.concatenate(
        [p1[:, band::band, :], dn_p1], axis=1).reshape(n * nb, 1, w)

    def _band_spec():
        return pl.BlockSpec((1, band, w), lambda i, b: (i, b, 0),
                            memory_space=pltpu.VMEM)

    def _row_spec():
        return pl.BlockSpec((1, 1, w), lambda i, b: (i * nb + b, 0, 0),
                            memory_space=pltpu.VMEM)

    new_p0, new_p1, new_out, eparts = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # active
            pl.BlockSpec(memory_space=pltpu.SMEM),   # weight
            pl.BlockSpec(memory_space=pltpu.SMEM),   # glast
            _band_spec(),                            # x
            _row_spec(),                             # x row below band
            _band_spec(),                            # p0   (aliased → out 0)
            _band_spec(),                            # p1   (aliased → out 1)
            _row_spec(),                             # p0 row above band
            _row_spec(),                             # p0 row below band
            _row_spec(),                             # p1 row below band
            _band_spec(),                            # out  (aliased → out 2)
        ],
        out_specs=[
            _band_spec(), _band_spec(), _band_spec(),
            pl.BlockSpec((1, 1, 2), lambda i, b: (i * nb + b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n * nb, 1, 2), jnp.float32),
        ],
        input_output_aliases={5: 0, 6: 1, 10: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_BYTES),
        interpret=interpret,
    )(active.astype(jnp.int32), weight_arr, glast, x, xdn, p0, p1,
      p0up, p0dn, p1dn, out_prev)
    return new_p0, new_p1, new_out, eparts.reshape(n, nb, 2)


@functools.partial(jax.jit,
                   static_argnames=("eps", "max_iter", "band", "interpret"))
def tv_chambolle_banded(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    eps: float = 2e-4,
    max_iter: int = 200,
    band: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Banded-Pallas TV denoise of [N,H,W] float32; H must divide by band.

    Iteration 0 (E_init from the raw image, first p update) runs in XLA —
    one-time cost; every subsequent iteration is one `_tv_band_kernel`
    launch at minimal HBM traffic.  Convergence bookkeeping (per-image
    |E_prev−E| < eps·E_init, global all-converged exit) stays in XLA on
    [N] vectors, matching tv_chambolle_xla.
    """
    n, h, w = x.shape
    assert h % band == 0, (h, band)
    nb = h // band
    weight_arr = jnp.broadcast_to(
        jnp.asarray(weight, jnp.float32).reshape(-1), (n,))
    wcol = weight_arr[:, None, None]
    size = float(h * w)
    tau = 0.25
    kernel = functools.partial(_tv_band_kernel, band=band, w=w, n_bands=nb)

    zrow = jnp.zeros((n, 1, w), jnp.float32)
    # x rows just below each band (zeros for the last band), fixed all solve
    xdn = jnp.concatenate(
        [x[:, band::band, :], zrow], axis=1).reshape(n * nb, 1, w)

    # iteration 0 in XLA: d = 0, out0 = x, E_init, first p update
    gy = jnp.concatenate([x[:, 1:, :] - x[:, :-1, :], zrow], axis=1)
    gx = jnp.concatenate(
        [x[:, :, 1:] - x[:, :, :-1], jnp.zeros((n, h, 1), jnp.float32)],
        axis=2)
    norm = jnp.sqrt(gy * gy + gx * gx)
    e0 = wcol[:, 0, 0] * jnp.sum(norm, axis=(1, 2)) / size
    scale = norm * tau / wcol + 1.0
    p0 = (-tau * gy) / scale
    p1 = (-tau * gx) / scale

    def cond(state):
        i, _p0, _p1, _out, _e_prev, active = state
        return jnp.logical_and(i < max_iter, jnp.any(active))

    def body(state):
        i, p0, p1, out, e_prev, active = state
        p0, p1, out, eparts = _tv_band_step(
            x, xdn, p0, p1, out, active, weight_arr, band, kernel, interpret)
        e = (jnp.sum(eparts[:, :, 0], axis=1)
             + weight_arr * jnp.sum(eparts[:, :, 1], axis=1)) / size
        still = jnp.abs(e_prev - e) >= eps * e0
        active = jnp.logical_and(active, still)
        e_prev = jnp.where(active, e, e_prev)
        return (i + 1, p0, p1, out, e_prev, active)

    _, _, _, out, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(1), p0, p1, x, e0, jnp.ones((n,), bool)))
    return out


def tv_band_for(h: int) -> int:
    """Largest band ≤256 (≥64, multiple of 8) dividing h; 0 if none."""
    for band in (256, 128, 64):
        if h % band == 0:
            return band
    return 0


# ---------------------------------------------------------------------------
# Fused unsharp mask — VMEM-resident separable Gaussian + combine
# ---------------------------------------------------------------------------
# The dense unsharp (ref pipeline/enhancement.py:202-205, skimage
# unsharp_mask semantics) lowers at batch >16 as two batch-as-channels
# grouped convs; the profile shows it at 15% of VPU roofline ("XLA conv
# schedule", docs/PERF.md) with the blurred intermediate round-tripping
# HBM.  This kernel runs the ENTIRE op per image in VMEM — edge padding,
# the 25-tap row and column shift-MAC sweeps (tap-ascending accumulation,
# identical order to mdx/ops/filters.py shift_macs_rows/cols, so it is
# bit-compatible with the dense n≤16 branch), and the
# clip(x + (x−blur)·amount) combine — with the image read from and
# written to HBM exactly once.  Per-image taps (traced sigma on the
# fixed ±12 support) and amounts arrive in SMEM, so parameter sweeps
# never recompile.

# Measured on hardware (first round-3 tunnel window, 2026-08-18): the
# whole-image kernel's scoped-VMEM ask at 4×1024² is 114.93M vs the
# 100M limit ("Ran out of memory in memory space vmem … on stack for
# unsharp_tpu") — the whole formulation is a ≤512²-class kernel; 1024²
# and up run the banded kernel (bit-identical output).
_UNSHARP_WHOLE_LIMIT = 512 * 512

# per-kind measured policy (profile_pass --ab unsharp, 2026-08-18
# tunnel window): whole 0.84 vs 1.55 ms XLA at 32x512^2 (1.8x),
# banded 0.40 vs 1.16 ms at 4x1024^2 (2.9x) and 7.13 vs 20.15 ms at
# 16x2048^2 (2.8x), parity exactly 0.0 in all three
_AUTO_UNSHARP_PALLAS = {"whole": True, "banded": True}


def unsharp_use_pallas(impl: str | None = None,
                       kind: str = "whole") -> bool:
    """True when the dense TPU unsharp should run as the fused Pallas
    kernel instead of the grouped-conv XLA lowering.  ``kind`` selects
    the measured per-formulation policy ("whole" ≤512², "banded" above).

    MDX_UNSHARP_IMPL: auto (measured policy), pallas | xla force one.
    Knob semantics: see :func:`_impl_mode`."""
    mode = _impl_mode("MDX_UNSHARP_IMPL", impl, ("pallas", "xla"))
    if mode == "auto":
        return _AUTO_UNSHARP_PALLAS[kind]
    return mode == "pallas"


def _unsharp_kernel(taps_ref, amount_ref, x_ref, out_ref, *,
                    h: int, w: int, r: int):
    """One image per grid step; blur + combine never leave VMEM.

    taps_ref: SMEM [N, 2r+1] per-image Gaussian taps (zero beyond the
    per-image effective radius — masking keeps the program static).
    amount_ref: SMEM [N].  Edge padding is materialised in VMEM as
    sublane/lane broadcasts of the boundary row/column (identical values
    to the XLA ``mode="edge"`` pads).
    """
    i = pl.program_id(0)
    x = x_ref[0]

    # row sweep on the lane-aligned original width (the dense op's
    # sequential per-axis padding — docs/PERF.md dead ends)
    top = jnp.broadcast_to(x[0:1, :], (r, w))
    bot = jnp.broadcast_to(x[h - 1:h, :], (r, w))
    xp = jnp.concatenate([top, x, bot], axis=0)            # [h+2r, w]
    acc = None
    for k in range(2 * r + 1):
        t = taps_ref[i, k] * xp[k:k + h, :]
        acc = t if acc is None else acc + t

    left = jnp.broadcast_to(acc[:, 0:1], (h, r))
    right = jnp.broadcast_to(acc[:, w - 1:w], (h, r))
    ap = jnp.concatenate([left, acc, right], axis=1)       # [h, w+2r]
    blur = None
    for k in range(2 * r + 1):
        t = taps_ref[i, k] * ap[:, k:k + w]
        blur = t if blur is None else blur + t

    out_ref[0] = jnp.clip(x + (x - blur) * amount_ref[i], 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def unsharp_tpu(
    x: jnp.ndarray,
    radius: jnp.ndarray,
    amount: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused Pallas unsharp of [N,H,W]; traced per-image ``radius`` and
    ``amount`` ([N] or scalar).  Numerics: identical formula and
    accumulation order as the XLA ops (mdx/ops/filters.py unsharp_mask
    with the shift-MAC blur branch)."""
    from mdx.ops.filters import _GAUSS_MAX_RADIUS, _gauss_taps

    n, h, w = x.shape
    r = _GAUSS_MAX_RADIUS
    sigma = jnp.broadcast_to(
        jnp.asarray(radius, jnp.float32).reshape(-1), (n,))
    taps = _gauss_taps(sigma, jnp.float32)                  # [n, 2r+1]
    amount_arr = jnp.broadcast_to(
        jnp.asarray(amount, jnp.float32).reshape(-1), (n,))
    kernel = functools.partial(_unsharp_kernel, h=h, w=w, r=r)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_BYTES),
        interpret=interpret,
    )(taps, amount_arr, x)


# ---------------------------------------------------------------------------
# Bilateral filter — VMEM-resident unrolled window
# ---------------------------------------------------------------------------

# Measured wash (profile_pass --ab bilateral, 2026-08-18 tunnel window):
# 0.82 vs 0.80 ms XLA at 32x512^2, 0.41 vs 0.44 ms at 4x1024^2 — within
# run noise both ways; keep the simpler XLA lowering (the kernel stays
# as a pinned-dispatch option for future shapes).
# Per-formulation policy, unsharp-style: whole-image kernel ≤1024²,
# banded kernel above.  Whole = measured wash (re-confirmed 2026-08-20:
# 0.87 xla vs 0.90 pallas ms at 8×1024²) → XLA.  Banded = measured WIN
# (2026-08-20 A/B, tools/ab_bilateral_banded.py: 0.76 vs 1.45 ms at
# 4×2048², parity 1.79e-07) → ON.
_AUTO_BILATERAL_PALLAS = {"whole": False, "banded": True}


def bilateral_use_pallas(impl: str | None = None,
                         kind: str = "whole") -> bool:
    """True when the dense TPU bilateral should run as the fused Pallas
    kernel (``kind`` ∈ whole|banded) instead of the unrolled XLA
    elementwise program.

    MDX_BILATERAL_IMPL: auto (measured per-formulation policy),
    pallas | xla force one.  Knob semantics: see :func:`_impl_mode`."""
    mode = _impl_mode("MDX_BILATERAL_IMPL", impl, ("pallas", "xla"))
    if mode == "auto":
        return _AUTO_BILATERAL_PALLAS[kind]
    return mode == "pallas"


def _bilateral_kernel(sc_ref, ss_ref, xp_ref, out_ref, *,
                      h: int, w: int, r: int, d: int):
    """One image per grid step; the d² shifted MACs never leave VMEM.

    The XLA lowering (mdx/ops/bilateral.py, ref
    pipeline/enhancement.py:102-143) streams the num/den accumulators
    through HBM between the 25 shifted exp-weight MACs (23% of VPU
    roofline); here the reflect-padded image is read once and the window
    runs VMEM-resident.  Accumulation order and formula are identical
    (window-ascending dy, dx), so values agree to fp noise.
    sc_ref/ss_ref: SMEM [N] per-image sigmas (traced — sweeps never
    recompile).  xp: [h+2r, w+2r] reflect-padded image (padded in XLA —
    reflect needs reversed slices, which Mosaic does not lower)."""
    i = pl.program_id(0)
    xp = xp_ref[0]
    x = xp[r:r + h, r:r + w]
    sc = sc_ref[i]
    ss = ss_ref[i]
    inv_2sc2 = 1.0 / (2.0 * sc * sc)
    inv_2ss2d2 = 1.0 / (2.0 * ss * ss * float(d * d))
    num = None
    den = None
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = xp[r + dy:r + dy + h, r + dx:r + dx + w]
            sw = jnp.exp(-float(dx * dx + dy * dy) * inv_2ss2d2)
            iw = jnp.exp(-jnp.square(x - shifted) * inv_2sc2)
            wgt = sw * iw
            t_num = wgt * shifted
            num = t_num if num is None else num + t_num
            den = wgt if den is None else den + wgt
    out_ref[0] = num / (den + 1e-10)


@functools.partial(jax.jit, static_argnames=("d", "interpret"))
def bilateral_tpu(
    x: jnp.ndarray,
    d: int = 5,
    sigma_color: jnp.ndarray = 0.05,
    sigma_space: jnp.ndarray = 0.05,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused Pallas bilateral of [N,H,W]; static (pre-normalised) odd
    ``d``, traced per-image sigmas.  Numerics: identical formula and
    accumulation order as mdx/ops/bilateral.py."""
    n, h, w = x.shape
    r = d // 2
    sc = jnp.broadcast_to(
        jnp.asarray(sigma_color, jnp.float32).reshape(-1), (n,))
    ss = jnp.broadcast_to(
        jnp.asarray(sigma_space, jnp.float32).reshape(-1), (n,))
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode="reflect")
    kernel = functools.partial(_bilateral_kernel, h=h, w=w, r=r, d=d)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h + 2 * r, w + 2 * r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_BYTES),
        interpret=interpret,
    )(sc, ss, xp)


def _bilateral_band_kernel(sc_ref, ss_ref, xs_ref, out_ref, *,
                           band: int, w: int, r: int, d: int):
    """One (image, row-band) per grid step — the >1024² class where the
    whole-image kernel's VMEM state does not fit.

    xs_ref: [1, 1, band+2r, w+2r] — the reflect-padded image's rows
    [b·band, b·band + band + 2r) (snapshot built in XLA: reflect needs
    reversed slices, which Mosaic does not lower, and overlapping row
    windows cannot be expressed as Pallas block indexing — same pattern
    as the banded TV/unsharp kernels).  The d² shifted exp-weight MACs
    are element-for-element the whole-image kernel's ops
    (window-ascending dy, dx), so values match it and the XLA lowering
    to fp noise."""
    i = pl.program_id(0)
    xs = xs_ref[0, 0]                              # [band+2r, w+2r]
    x = xs[r:r + band, r:r + w]
    sc = sc_ref[i]
    ss = ss_ref[i]
    inv_2sc2 = 1.0 / (2.0 * sc * sc)
    inv_2ss2d2 = 1.0 / (2.0 * ss * ss * float(d * d))
    num = None
    den = None
    for dy in range(2 * r + 1):
        for dx in range(2 * r + 1):
            shifted = xs[dy:dy + band, dx:dx + w]
            ddy, ddx = dy - r, dx - r
            sw = jnp.exp(-float(ddy * ddy + ddx * ddx) * inv_2ss2d2)
            iw = jnp.exp(-jnp.square(x - shifted) * inv_2sc2)
            wgt = sw * iw
            t_num = wgt * shifted
            num = t_num if num is None else num + t_num
            den = wgt if den is None else den + wgt
    out_ref[0, 0] = num / (den + 1e-10)


@functools.partial(jax.jit, static_argnames=("d", "band", "interpret"))
def bilateral_banded_tpu(
    x: jnp.ndarray,
    d: int,
    sigma_color: jnp.ndarray,
    sigma_space: jnp.ndarray,
    band: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Banded fused Pallas bilateral of [N,H,W] (``band`` must divide H);
    static pre-normalised odd ``d``, traced per-image sigmas.  HBM
    traffic is the ~1.1× row snapshot + one read + one write instead of
    the XLA lowering's d² streamed num/den accumulator round trips."""
    n, h, w = x.shape
    r = d // 2
    if h % band:
        raise ValueError(f"band {band} does not divide H {h}")
    nb = h // band
    sc = jnp.broadcast_to(
        jnp.asarray(sigma_color, jnp.float32).reshape(-1), (n,))
    ss = jnp.broadcast_to(
        jnp.asarray(sigma_space, jnp.float32).reshape(-1), (n,))
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode="reflect")
    # [n, nb, band+2r, w+2r] overlapping row snapshot of the padded image
    xs = jnp.stack([xp[:, b * band:b * band + band + 2 * r, :]
                    for b in range(nb)], axis=1)
    kernel = functools.partial(_bilateral_band_kernel, band=band, w=w,
                               r=r, d=d)
    out = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, band + 2 * r, w + 2 * r),
                         lambda i, b: (i, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, band, w), lambda i, b: (i, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nb, band, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_BYTES),
        interpret=interpret,
    )(sc, ss, xs)
    return out.reshape(n, h, w)


# ---------------------------------------------------------------------------
# Banded fused unsharp — the >1024² class (config 2 runs unsharp at 2048²)
# ---------------------------------------------------------------------------


def _unsharp_band_kernel(taps_ref, amount_ref, xs_ref, out_ref, *,
                         band: int, w: int, r: int):
    """One (image, row-band) per grid step.

    xs_ref: [1, 1, band+2r, w] — the edge-padded image's rows
    [b·band, b·band + band + 2r) (the snapshot is built in XLA with
    strided slices, same pattern as the banded TV kernel's halo rows;
    overlapping windows cannot be expressed as Pallas block indexing).
    The band's original pixels are the snapshot's centre rows [r, r+band)
    — no second input needed for the combine.  Row sweep, in-kernel lane
    edge-pad, column sweep and combine are element-for-element the
    whole-image kernel's ops (tap-ascending), so values match it (and the
    dense n≤16 branch) to fp noise.
    """
    i = pl.program_id(0)
    xs = xs_ref[0, 0]                                      # [band+2r, w]
    x = xs[r:r + band, :]

    acc = None
    for k in range(2 * r + 1):
        t = taps_ref[i, k] * xs[k:k + band, :]
        acc = t if acc is None else acc + t

    left = jnp.broadcast_to(acc[:, 0:1], (band, r))
    right = jnp.broadcast_to(acc[:, w - 1:w], (band, r))
    ap = jnp.concatenate([left, acc, right], axis=1)       # [band, w+2r]
    blur = None
    for k in range(2 * r + 1):
        t = taps_ref[i, k] * ap[:, k:k + w]
        blur = t if blur is None else blur + t

    out_ref[0, 0] = jnp.clip(x + (x - blur) * amount_ref[i], 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("band", "interpret"))
def unsharp_banded_tpu(
    x: jnp.ndarray,
    radius: jnp.ndarray,
    amount: jnp.ndarray,
    band: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Banded fused Pallas unsharp of [N,H,W] (``band`` must divide H);
    traced per-image ``radius``/``amount``.  Whole-image VMEM state at
    2048² exceeds the physical ceiling, so the grid runs (image,
    row-band) with an XLA-snapshotted row halo — HBM traffic is the
    ~1.1× snapshot copy + one read + one write instead of the XLA
    lowering's per-tap streamed slices."""
    from mdx.ops.filters import _GAUSS_MAX_RADIUS, _gauss_taps

    n, h, w = x.shape
    r = _GAUSS_MAX_RADIUS
    if h % band:
        raise ValueError(f"band {band} does not divide H {h}")
    nb = h // band
    sigma = jnp.broadcast_to(
        jnp.asarray(radius, jnp.float32).reshape(-1), (n,))
    taps = _gauss_taps(sigma, jnp.float32)                  # [n, 2r+1]
    amount_arr = jnp.broadcast_to(
        jnp.asarray(amount, jnp.float32).reshape(-1), (n,))

    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0)), mode="edge")  # [n, h+2r, w]
    # [n, nb, band+2r, w] overlapping row snapshot (≈(band+2r)/band × the
    # image) — band b's rows [b·band, b·band+band+2r) of xp
    xs = jnp.stack([xp[:, b * band:b * band + band + 2 * r, :]
                    for b in range(nb)], axis=1)

    kernel = functools.partial(_unsharp_band_kernel, band=band, w=w, r=r)
    out = pl.pallas_call(
        kernel,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, band + 2 * r, w),
                         lambda i, b: (i, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, band, w), lambda i, b: (i, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nb, band, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_BYTES),
        interpret=interpret,
    )(taps, amount_arr, xs)
    return out.reshape(n, h, w)


# ---------------------------------------------------------------------------
# Fused Haar (db1) BayesShrink wavelet denoise — whole transform in VMEM
# ---------------------------------------------------------------------------
# The product denoise (ref pipeline/enhancement.py:169-174, skimage
# denoise_wavelet db1 BayesShrink) runs a multi-level separable DWT,
# per-band soft/hard thresholds, and the inverse transform — ~10 XLA
# fusions streaming level intermediates through HBM (the wavelet phases
# total ~1.8 ms of the 29 ms pass at 24% roofline).  For db1 on
# 2^levels-divisible extents the analysis never reads the boundary
# extension, so every step is a reshape-deinterleave + 2-tap MAC — all
# Mosaic-lowerable — and the whole denoise fits in VMEM per image.

_AUTO_WAVELET_PALLAS = False  # pending the hardware A/B (profile_pass --ab wavelet)


def wavelet_use_pallas(impl: str | None = None) -> bool:
    """True when the dense TPU db1 denoise should run as the fused Pallas
    kernel instead of the XLA shift-MAC lowering.  Knob semantics: see
    :func:`_impl_mode` (MDX_WAVELET_IMPL)."""
    mode = _impl_mode("MDX_WAVELET_IMPL", impl, ("pallas", "xla"))
    if mode == "auto":
        return _AUTO_WAVELET_PALLAS
    return mode == "pallas"


def _wavelet_denoise_kernel(sigma_ref, soft_ref, x_ref, out_ref, *,
                            h: int, w: int, levels: int,
                            lo: tuple, hi: tuple):
    """One image per grid step; the full wavedec2→shrink→waverec2 chain
    stays in VMEM.  Taps/accumulation order match mdx/ops/wavelet.py
    (_analysis_last / _synthesis_last) exactly; the even-extent db1
    analysis provably never reads the symmetric extension, so the
    reshape-deinterleave form is the same arithmetic."""
    i = pl.program_id(0)
    x = x_ref[0]
    sigma = sigma_ref[i]
    soft = soft_ref[i]
    noise_var = sigma * sigma
    eps = float(np.finfo(np.float32).eps)
    lo_r = (lo[1], lo[0])  # _analysis_last uses time-reversed taps
    hi_r = (hi[1], hi[0])

    # Column-direction deinterleave/interleave run through the
    # TRANSPOSE BRIDGE: the real Mosaic backend rejects lane-splitting
    # reshapes ("infer-vector-layout: unsupported shape cast",
    # 2026-08-18 window) but 2-D transposes and SUBLANE-direction
    # reshape-split / stack-interleave all compile (tools/
    # probe_mosaic.py).  Both column passes of one level are batched
    # through a single bridge by concatenating the two bands along
    # sublanes first — 3 transposes per level per direction.  Values
    # are bit-identical to the lane forms: transposes reorder lanes,
    # never operands or accumulation order.

    def fwd_rows(v, vh, vw):
        vr = v.reshape(vh // 2, 2, vw)
        e, o = vr[:, 0, :], vr[:, 1, :]
        return lo_r[0] * e + lo_r[1] * o, hi_r[0] * e + hi_r[1] * o

    def syn_rows(a, d, vh2, vw):
        even = lo[1] * a + hi[1] * d
        odd = lo[0] * a + hi[0] * d
        return jnp.stack([even, odd], axis=1).reshape(2 * vh2, vw)

    # ---- analysis (dwt2 order: rows then cols) -------------------------
    ll = x
    vh, vw = h, w
    details = []
    for _ in range(levels):
        a, d = fwd_rows(ll, vh, vw)              # [vh//2, vw] each
        c = jnp.concatenate([a, d], axis=0)      # [vh, vw]
        ct = c.T                                 # [vw, vh]
        cr = ct.reshape(vw // 2, 2, vh)          # sublane split = col pairs
        e_t, o_t = cr[:, 0, :], cr[:, 1, :]
        a_t = lo_r[0] * e_t + lo_r[1] * o_t      # [vw//2, vh]
        d_t = hi_r[0] * e_t + hi_r[1] * o_t
        acol = a_t.T                             # [vh, vw//2] = [ll ; hl]
        dcol = d_t.T                             # [lh ; hh]
        vh //= 2
        vw //= 2
        ll, lh = acol[:vh], dcol[:vh]
        hl, hh = acol[vh:], dcol[vh:]
        details.append((lh, hl, hh, vh, vw))

    # ---- BayesShrink per detail band -----------------------------------
    def shrink(band):
        dvar = jnp.mean(band * band)
        t = noise_var / jnp.sqrt(jnp.maximum(dvar - noise_var, eps))
        soft_v = jnp.sign(band) * jnp.maximum(jnp.abs(band) - t, 0.0)
        hard_v = jnp.where(jnp.abs(band) > t, band, 0.0)
        return jnp.where(soft > 0.0, soft_v, hard_v)

    # ---- synthesis (idwt2 order: cols then rows) -----------------------
    for lh, hl, hh, vh, vw in reversed(details):
        # syn_cols of (ll, lh) and (hl, hh) share one bridge: stack the
        # band pairs along sublanes, interleave columns in transposed
        # space, split the two synthesised bands after the bridge
        av = jnp.concatenate([ll, shrink(hl)], axis=0)        # [2vh, vw]
        dv = jnp.concatenate([shrink(lh), shrink(hh)], axis=0)
        even = lo[1] * av + hi[1] * dv
        odd = lo[0] * av + hi[0] * dv
        st = jnp.stack([even.T, odd.T], axis=1).reshape(2 * vw, 2 * vh)
        cd = st.T                                 # [2vh, 2vw] = [a ; d]
        ll = syn_rows(cd[:vh], cd[vh:], vh, 2 * vw)

    out_ref[0] = ll


@functools.partial(jax.jit, static_argnames=("levels", "interpret"))
def wavelet_denoise_tpu(
    x: jnp.ndarray,
    sigma: jnp.ndarray,
    soft: jnp.ndarray,
    levels: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused Pallas db1 BayesShrink denoise of [N,H,W].

    ``sigma``: per-image [N] noise sigma (callers estimate it first —
    the MAD median search stays in XLA where it is already at 51% of
    roofline).  ``soft``: per-image [N] bool/float, True → soft
    thresholding.  H and W must be divisible by 2**levels (the caller's
    dispatch gate; db1 on even extents never reads the boundary
    extension)."""
    from mdx.refimpl.wavelet_np import qmf_pair

    n, h, w = x.shape
    div = 1 << levels
    if h % div or w % div:
        raise ValueError(f"extents {h}x{w} not divisible by 2^{levels}")
    lo, hi = qmf_pair("db1")
    sigma_arr = jnp.broadcast_to(
        jnp.asarray(sigma, jnp.float32).reshape(-1), (n,))
    soft_arr = jnp.broadcast_to(
        jnp.asarray(soft, jnp.float32).reshape(-1), (n,))
    kernel = functools.partial(
        _wavelet_denoise_kernel, h=h, w=w, levels=int(levels),
        lo=(float(lo[0]), float(lo[1])), hi=(float(hi[0]), float(hi[1])))
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_BYTES),
        interpret=interpret,
    )(sigma_arr, soft_arr, x)
