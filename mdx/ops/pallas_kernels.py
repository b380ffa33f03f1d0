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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _clahe_kernel(clip_ref, x_ref, row_sel_ref, col_sel_ref, w_row_ref,
                  w_col_ref, out_ref, hist_ref, lut_ref, *,
                  h: int, w: int, t: int, nbins: int):
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
    def hist_body(b, _):
        mask = (q == b).astype(jnp.float32)
        s1 = jnp.dot(row_sel, mask,
                     preferred_element_type=jnp.float32)     # [gy, w]
        hist_ref[b] = jnp.dot(s1, col_sel,
                              preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, nbins, hist_body, 0)

    # ---- clip + uniform redistribution + running CDF --------------------
    npix = float(t * t)
    clim = jnp.maximum(clip_ref[pl.program_id(0)] * npix, 1.0)

    def excess_body(b, acc):
        return acc + jnp.maximum(hist_ref[b] - clim, 0.0)

    excess = jax.lax.fori_loop(
        0, nbins, excess_body, jnp.zeros((gy, gx), jnp.float32))
    redist = excess / nbins

    def cdf_body(b, running):
        running = running + jnp.minimum(hist_ref[b], clim) + redist
        lut_ref[b] = running
        return running

    total = jax.lax.fori_loop(
        0, nbins, cdf_body, jnp.zeros((gy, gx), jnp.float32))
    cdf0 = lut_ref[0]
    denom = jnp.maximum(total - cdf0, 1e-12)

    # ---- remap: out += (q==b) · (Wr · lut[b] · Wc) on the MXU -----------
    w_row = w_row_ref[:]                                     # [h, gy]
    w_col = w_col_ref[:]                                     # [gx, w]

    out_ref[0] = jnp.zeros((h, w), jnp.float32)

    def remap_body(b, _):
        lb = (lut_ref[b] - cdf0) / denom                     # [gy, gx]
        rows = jnp.dot(w_row, lb,
                       preferred_element_type=jnp.float32)   # [h, gx]
        blend = jnp.dot(rows, w_col,
                        preferred_element_type=jnp.float32)  # [h, w]
        out_ref[0] = out_ref[0] + jnp.where(q == b, blend, 0.0)
        return 0

    jax.lax.fori_loop(0, nbins, remap_body, 0)


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

    row_sel = jnp.asarray(_tile_membership(ph, t).T)         # [gy, ph]
    col_sel = jnp.asarray(_tile_membership(pw, t))           # [pw, gx]
    w_row = jnp.asarray(_interp_matrix(ph, t).T)             # [ph, gy]
    w_col = jnp.asarray(_interp_matrix(pw, t))               # [gx, pw]

    def _const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_clahe_kernel, h=ph, w=pw, t=t, nbins=nbins)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ph, pw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _const_spec(row_sel.shape),
            _const_spec(col_sel.shape),
            _const_spec(w_row.shape),
            _const_spec(w_col.shape),
        ],
        out_specs=pl.BlockSpec((1, ph, pw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ph, pw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbins, gy, gx), jnp.float32),
            pltpu.VMEM((nbins, gy, gx), jnp.float32),
        ],
        interpret=interpret,
    )(clip_arr, xp, row_sel, col_sel, w_row, w_col)
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
        interpret=interpret,
    )(weight_arr, x)
