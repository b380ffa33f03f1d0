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

* histogram:  for b in bins:  hist[b] = Σ_tile (q == b)
* remap:      for b in bins:  out += (q == b) · bilinear_upsample(lut[b])

The bilinear upsample of a [gy, gx] LUT slice to pixel resolution is two
``pltpu.repeat``s of edge-padded, half-tile-shifted copies — no gathers.
Cost: ~2·nbins elementwise sweeps over the image, all VMEM-resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _clahe_kernel(clip_ref, x_ref, out_ref, hist_ref, lut_ref, *,
                  h: int, w: int, t: int, nbins: int):
    """One image per grid step; everything stays in VMEM.

    clip_ref: SMEM [1,1] per-image clip limit (traced — sweeps don't
    recompile).  hist_ref/lut_ref: VMEM scratch [nbins, gy, gx].
    """
    gy, gx = h // t, w // t
    x = x_ref[0]
    q = jnp.minimum((x * nbins).astype(jnp.int32), nbins - 1)

    # ---- per-tile histograms: loop over bins, reduce within tiles -------
    def hist_body(b, _):
        mask = (q == b).astype(jnp.float32)
        s1 = jnp.sum(mask.reshape(h, gx, t), axis=2)        # [h, gx]
        s2 = jnp.sum(s1.reshape(gy, t, gx), axis=1)         # [gy, gx]
        hist_ref[b] = s2
        return 0

    jax.lax.fori_loop(0, nbins, hist_body, 0)

    # ---- clip + uniform redistribution + running CDF --------------------
    npix = float(t * t)
    clim = jnp.maximum(clip_ref[0, 0] * npix, 1.0)

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

    # ---- remap: accumulate bilinear-upsampled LUT slices ----------------
    ht = t // 2
    row = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    # interior interpolation weight: frac((p + 0.5)/t − 0.5); at the outer
    # half-tiles both corners clamp to the same tile so the weight is moot.
    wy = ((jnp.maximum(row - ht, 0) % t).astype(jnp.float32) + 0.5) / t
    wy = jnp.where(row < ht, 0.0, wy)
    wx = ((jnp.maximum(col - ht, 0) % t).astype(jnp.float32) + 0.5) / t
    wx = jnp.where(col < ht, 0.0, wx)

    out_ref[0] = jnp.zeros((h, w), jnp.float32)

    def _repeat_rows(a, reps):
        """Element-wise repeat along axis 0 (broadcast + sublane reshape)."""
        r, c = a.shape
        return jnp.broadcast_to(a[:, None, :], (r, reps, c)).reshape(
            r * reps, c)

    def _repeat_cols(a, reps):
        r, c = a.shape
        return jnp.broadcast_to(a[:, :, None], (r, c, reps)).reshape(
            r, c * reps)

    def remap_body(b, _):
        lb = (lut_ref[b] - cdf0) / denom                     # [gy, gx]
        # rows: edge-clamped shifted repeats → y0/y1 corner values
        lp = jnp.concatenate([lb[:1], lb], axis=0)           # [gy+1, gx]
        lq = jnp.concatenate([lb, lb[-1:]], axis=0)
        top = _repeat_rows(lp, t)[ht:ht + h]                 # [h, gx]
        bot = _repeat_rows(lq, t)[ht:ht + h]
        rowmix = (1.0 - wy) * top + wy * bot                 # [h, gx]
        # cols: same construction along the lane axis
        cl = jnp.concatenate([rowmix[:, :1], rowmix], axis=1)
        cr = jnp.concatenate([rowmix, rowmix[:, -1:]], axis=1)
        left = _repeat_cols(cl, t)[:, ht:ht + w]             # [h, w]
        right = _repeat_cols(cr, t)[:, ht:ht + w]
        blend = (1.0 - wx) * left + wx * right
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
        jnp.asarray(clip_limit, jnp.float32).reshape(-1), (n,)
    ).reshape(n, 1)

    kernel = functools.partial(_clahe_kernel, h=ph, w=pw, t=t, nbins=nbins)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ph, pw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ph, pw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ph, pw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbins, gy, gx), jnp.float32),
            pltpu.VMEM((nbins, gy, gx), jnp.float32),
        ],
        interpret=interpret,
    )(clip_arr, xp)
    return out[:, :h, :w]
