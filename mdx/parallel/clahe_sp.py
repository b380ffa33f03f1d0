"""Spatially-sharded CLAHE: the tile grid mapped onto the device mesh.

SURVEY.md §2.9 ("CLAHE tile grid maps naturally onto shards") made
concrete: CLAHE's per-tile histograms/LUTs (ref pipeline/enhancement.py:
277-280, skimage ``equalize_adapthist`` semantics, numerically matching
``mdx.refimpl.filters_np.clahe``) are entirely local to the shard owning
the tile when per-shard extents are multiples of the tile size; the ONLY
cross-shard data the bilinear remap needs is one halo tile-row (and
tile-column, for 2-D grids) of neighbour LUTs — a tiny
``[N, 1, gx, nbins]`` ``ppermute`` per direction, with global-edge shards
substituting a replicated copy of their own border LUTs.

Exactness argument (asserted to ~1e-6 vs the dense op in
tests/test_spatial_clahe.py): with the halo clamped at the global border,
the uniform "virtual tile" bilinear formula
``y0 = floor(f)+1, y1 = y0+1, w = f − floor(f)`` over the halo-extended
LUT grid reproduces skimage's clamped formula everywhere — in the first
half-tile both virtual neighbours resolve to the same border LUT, which
equals the dense path's full-weight-on-tile-0 clamp; at interior shard
boundaries the virtual neighbour IS the adjacent shard's genuine LUT.

On TPU the remap reuses the banded Pallas kernel
(mdx/ops/pallas_kernels.py ``_clahe_remap_kernel``) per shard — its 3-row
LUT window and hat-weight structure are exactly the halo-extended layout;
on CPU (tests, virtual meshes) the gather lowering is fine and keeps
golden parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mdx.ops.hist import counts_from_indices_grouped


def _interp_matrix_ext(n_pix: int, t: int) -> np.ndarray:
    """[n_pix//t + 2, n_pix] bilinear LUT-upsample weights onto the
    halo-EXTENDED tile axis (virtual tiles −1 and g map to halo slots 0
    and g+1) — the unclamped counterpart of
    ``mdx.ops.pallas_kernels._interp_matrix``; clamping lives in the halo
    contents instead."""
    g = n_pix // t
    m = np.zeros((g + 2, n_pix), np.float32)
    p = np.arange(n_pix)
    f = (p + 0.5) / t - 0.5
    g0 = np.floor(f).astype(int)                      # −1 … g−1
    w = (f - g0).astype(np.float32)
    m[g0 + 1, p] += 1.0 - w
    m[g0 + 2, p] += w
    return m


def _local_luts(xp: jnp.ndarray, clip_limit: jnp.ndarray, t: int,
                nbins: int) -> jnp.ndarray:
    """Per-tile CLAHE LUTs of the local block → [N, gy, gx, nbins].

    Histogram counting uses the MXU nibble-one-hot einsum
    (mdx/ops/hist.py) — exact integer counts; clip + uniform excess
    redistribution + scaled CDF mirror mdx/ops/clahe.py:54-65."""
    n, hs, ws = xp.shape
    gy, gx = hs // t, ws // t
    q = jnp.minimum((xp * nbins).astype(jnp.int32), nbins - 1)
    qt = q.reshape(n, gy, t, gx, t).transpose(0, 1, 3, 2, 4)
    hists = counts_from_indices_grouped(
        qt.reshape(n, gy * gx, t * t), nbins).reshape(n, gy, gx, nbins)

    npix = float(t * t)
    clim = jnp.maximum(
        jnp.broadcast_to(jnp.asarray(clip_limit, xp.dtype).reshape(-1),
                         (n,)) * npix, 1.0)[:, None, None, None]
    excess = jnp.sum(jnp.maximum(hists - clim, 0.0), axis=-1, keepdims=True)
    hists = jnp.minimum(hists, clim) + excess / nbins
    cdf = jnp.cumsum(hists, axis=-1)
    cdf_min = cdf[..., :1]
    denom = jnp.maximum(cdf[..., -1:] - cdf_min, 1e-12)
    return (cdf - cdf_min) / denom


def _remap_ext_xla(xp: jnp.ndarray, lut_ext: jnp.ndarray, t: int,
                   nbins: int) -> jnp.ndarray:
    """Uniform virtual-tile bilinear remap over the halo-extended LUT grid
    ([N, gy+2, gx+2, nbins]) — the XLA gather path (CPU / tests)."""
    n, hs, ws = xp.shape
    gy, gx = hs // t, ws // t
    q = jnp.minimum((xp * nbins).astype(jnp.int32), nbins - 1)

    fy = (jnp.arange(hs, dtype=xp.dtype) + 0.5) / t - 0.5
    fx = (jnp.arange(ws, dtype=xp.dtype) + 0.5) / t - 0.5
    y0 = jnp.floor(fy).astype(jnp.int32) + 1          # ext coords 0 … gy
    x0 = jnp.floor(fx).astype(jnp.int32) + 1
    wy = (fy - jnp.floor(fy))[None, :, None]
    wx = (fx - jnp.floor(fx))[None, None, :]

    lut_flat = lut_ext.reshape(n, (gy + 2) * (gx + 2) * nbins)

    def sample(yi, xi):
        tid = yi[:, None] * (gx + 2) + xi[None, :]
        gidx = tid[None] * nbins + q
        return jnp.take_along_axis(
            lut_flat, gidx.reshape(n, -1), axis=-1).reshape(n, hs, ws)

    v00 = sample(y0, x0)
    v01 = sample(y0, x0 + 1)
    v10 = sample(y0 + 1, x0)
    v11 = sample(y0 + 1, x0 + 1)
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def _remap_ext_pallas(xp: jnp.ndarray, lut_ext: jnp.ndarray, t: int,
                      nbins: int, interpret: bool) -> jnp.ndarray:
    """Banded Pallas remap of the local block against the halo-extended
    LUT grid (TPU path) — per local band g the 3-row window is
    ``lut_ext[g … g+2]``, the exact structure
    ``mdx.ops.pallas_kernels._clahe_remap_kernel`` expects."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mdx.ops.pallas_kernels import (
        _SCOPED_VMEM_BYTES,
        _banded_row_weights,
        _bf16_split,
        _clahe_remap_kernel,
        _concat_split_rows,
        clahe_precision,
    )

    n, hs, ws = xp.shape
    gy, gx = hs // t, ws // t
    gxe = gx + 2
    # [N, gy+2, gx+2, nbins] → window stack [N, gy, 3, nbins, gx+2]
    lut_t = lut_ext.transpose(0, 1, 3, 2)             # [N, gy+2, nbins, gxe]
    win = jnp.stack([lut_t[:, i:i + gy] for i in range(3)], axis=2)
    xb = xp.reshape(n, gy, t, ws)
    # concat-bf16-split weight matrices, as in the dense banded kernel
    # (exact f32 remap on the real backend; round-5 precision incident).
    # Shard blocks stay at B=1 (one tile-row per step): the multi-row
    # win applies to tall dense slices, not thin halo-extended shards.
    w_col = jnp.asarray(_interp_matrix_ext(ws, t))
    wc_hi, wc_lo = _bf16_split(w_col)
    wc3 = jnp.concatenate([wc_hi, wc_lo, wc_hi], axis=0)
    wr4 = _concat_split_rows(_banded_row_weights(t, 1))

    out = pl.pallas_call(
        functools.partial(_clahe_remap_kernel, R=t, w=ws, nbins=nbins,
                          gx=gxe, nw=3, exact=clahe_precision()),
        grid=(n, gy),
        in_specs=[
            pl.BlockSpec((1, 1, t, ws), lambda i, g: (i, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, nbins, gxe),
                         lambda i, g: (i, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * gxe, ws), lambda i, g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 12), lambda i, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t, ws), lambda i, g: (i, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, gy, t, ws), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_BYTES),
        interpret=interpret,
    )(xb, win, wc3, wr4)
    return out.reshape(n, hs, ws)


def clahe_sharded(
    x: jnp.ndarray,
    clip_limit: jnp.ndarray,
    tile_size: int,
    row_axis: str,
    col_axis: str | None = None,
    nbins: int = 256,
    force_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """CLAHE on spatially-sharded [N, Hs, Ws] blocks (runs under
    shard_map).  Per-shard extents must be multiples of ``tile_size``
    (caller-validated).  ``col_axis=None`` = 1-D row blocks (columns are
    shard-local).  ``force_pallas`` overrides the backend dispatch (tests
    exercise the kernel in interpret mode)."""
    from mdx.parallel.spatial2d import _halo_axis

    t = int(tile_size)
    xp = jnp.clip(x, 0.0, 1.0)
    lut = _local_luts(xp, clip_limit, t, nbins)       # [N, gy, gx, nbins]

    # Halo-extend the LUT grid: neighbours' edge tile LUTs, or a clamped
    # copy of our own at the global border ("edge" mode).
    lut_ext = _halo_axis(lut, 1, 1, 1, row_axis, "edge")
    if col_axis is not None:
        lut_ext = _halo_axis(lut_ext, 1, 1, 2, col_axis, "edge")
    else:
        lut_ext = jnp.pad(lut_ext, ((0, 0), (0, 0), (1, 1), (0, 0)),
                          mode="edge")

    if force_pallas is None:
        try:
            use_pallas = jax.default_backend() == "tpu"
        except Exception:
            use_pallas = False
    else:
        use_pallas = force_pallas
    if use_pallas:
        return _remap_ext_pallas(xp, lut_ext, t, nbins, interpret)
    return _remap_ext_xla(xp, lut_ext, t, nbins)
