"""Spatially-sharded BayesShrink wavelet denoise (db1 across the mesh).

Completes the spatial chain (ref pipeline/enhancement.py:270-273,
skimage ``denoise_wavelet`` semantics = ``mdx.ops.wavelet.denoise_wavelet``)
— the op previously documented as batch-path-only.  The design exploits a
property of the chain's db1 (Haar) wavelet: for even lengths, the
symmetric boundary extension in ``_analysis_last`` / the trailing pad in
``_synthesis_last`` are never read (output j touches exactly inputs
2j, 2j+1), so applying the DENSE ``dwt2``/``idwt2`` to each shard's block
is bit-identical to the global transform whenever the per-shard extent
stays even at that level.  That makes the sharded denoise mostly a reuse
of the dense code:

1. Levels ``1 … j_local`` (``j_local`` = deepest level with even
   per-shard extents) run the dense ``dwt2`` per shard — zero
   communication, exact.
2. The remaining coarse levels operate on an LL subband that has shrunk
   by ``4^j_local``; it is ``all_gather``-ed (tiny) and the dense
   ``wavedec2 → BayesShrink → waverec2`` runs REPLICATED on every shard —
   literally the single-chip code path, so coarse-level parity is free.
3. Noise sigma (when not given) is the exact distributed median of the
   level-1 |HH| (``mdx.ops.quantile.percentiles_exact_sharded`` — no
   duplicate-row validity needed: db1 even-length subbands tile the
   global subband exactly).
4. Fine-level BayesShrink thresholds need one global moment per subband:
   ``mean(band²)`` psums over the mesh axes; thresholding itself is
   pointwise-local, as is the synthesis back up.

Numerics match the dense op except psum summation order in the subband
moments (≤ ~1e-7 relative in the thresholds); asserted in
tests/test_spatial_wavelet.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from mdx.ops.wavelet import (
    _hard,
    _soft,
    default_levels,
    dwt2,
    idwt2,
    wavedec2,
    waverec2,
)
from mdx.refimpl.wavelet_np import MAD_TO_SIGMA


def _trailing_pow2(v: int) -> int:
    """Largest j with v % 2^j == 0 (v > 0)."""
    j = 0
    while v % 2 == 0 and v > 1:
        v //= 2
        j += 1
    return j


def _gather_axis(v: jnp.ndarray, axis: int, mesh_axis: str) -> jnp.ndarray:
    """Concatenate the shards of one array axis (tile order = mesh order)."""
    g = lax.all_gather(v, mesh_axis, axis=0)          # [k, ...]
    g = jnp.moveaxis(g, 0, axis)                      # [..., k, extent, ...]
    shape = list(v.shape)
    shape[axis] = v.shape[axis] * lax.axis_size(mesh_axis)
    return g.reshape(shape)


def _take_shard(v: jnp.ndarray, axis: int, mesh_axis: str,
                per_shard: int) -> jnp.ndarray:
    """Inverse of :func:`_gather_axis`: this shard's slab."""
    start = lax.axis_index(mesh_axis) * per_shard
    return lax.dynamic_slice_in_dim(v, start, per_shard, axis=axis)


def denoise_wavelet_sharded(
    x: jnp.ndarray,
    row_axis: str,
    col_axis: str | None = None,
    sigma: jnp.ndarray | None = None,
    mode: str = "soft",
    wavelet_levels: int | None = None,
    soft_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """BayesShrink db1 denoise on spatially-sharded [N, Hs, Ws] blocks
    (runs under shard_map).  Per-shard extents must be even
    (caller-validated by the spatial wrappers).  ``soft_mask`` ([N] bool)
    optionally selects soft/hard per image, overriding ``mode`` — same
    contract as the dense op."""
    axes = (row_axis,) if col_axis is None else (row_axis, col_axis)
    n, hs, ws = x.shape
    ky = lax.axis_size(row_axis)
    kx = lax.axis_size(col_axis) if col_axis is not None else 1
    h_g, w_g = hs * ky, ws * kx
    levels = (wavelet_levels if wavelet_levels is not None
              else default_levels((h_g, w_g), "db1"))

    # Deepest level at which every per-shard extent is still even.
    j_local = min(levels, _trailing_pow2(hs),
                  *((_trailing_pow2(ws),) if col_axis is not None else ()))

    # 1. fine levels: dense dwt2 per shard (exact for even db1 blocks)
    ll = x
    local_details = []
    local_shapes = []
    for _ in range(j_local):
        local_shapes.append(ll.shape[-2:])
        ll, det = dwt2(ll, "db1")
        local_details.append(det)

    # 3. sigma from the exact distributed median of level-1 |HH|
    if sigma is None:
        from mdx.ops.quantile import percentiles_exact_sharded

        if j_local >= 1:
            hh1 = local_details[0][2]
            total = hh1.shape[1] * ky * hh1.shape[2] * kx
            med = percentiles_exact_sharded(
                jnp.abs(hh1), [50.0], axes, total)[0]
        else:  # fully replicated fallback (odd shard extents)
            from mdx.ops.quantile import median_rows

            xg = _gather_axis(x, 1, row_axis)
            if col_axis is not None:
                xg = _gather_axis(xg, 2, col_axis)
            _, (_, _, hh1) = dwt2(xg, "db1")
            med = median_rows(jnp.abs(hh1.reshape(n, -1)))
        sigma = med * jnp.asarray(MAD_TO_SIGMA, x.dtype)
    sigma = jnp.broadcast_to(jnp.asarray(sigma, x.dtype), (n,))
    noise_var = sigma * sigma
    eps = jnp.asarray(np.finfo(np.float32).eps, x.dtype)

    def _threshold(band, dvar):
        t = (noise_var / jnp.sqrt(jnp.maximum(dvar - noise_var, eps))
             )[:, None, None]
        if soft_mask is not None:
            return jnp.where(soft_mask[:, None, None],
                             _soft(band, t), _hard(band, t))
        return _soft(band, t) if mode == "soft" else _hard(band, t)

    # 2. coarse levels: gather the (tiny) LL, run the dense machinery
    #    replicated — global stats come for free
    if j_local < levels:
        llg = _gather_axis(ll, 1, row_axis)
        if col_axis is not None:
            llg = _gather_axis(llg, 2, col_axis)
        ll_deep, deep_details, deep_shapes = wavedec2(
            llg, "db1", levels - j_local)

        def _shrink_dense(band):
            dvar = jnp.mean(band.reshape(n, -1) ** 2, axis=-1)
            return _threshold(band, dvar)

        deep_new = [tuple(_shrink_dense(b) for b in det)
                    for det in deep_details]
        llg = waverec2(ll_deep, deep_new, deep_shapes, "db1")
        ll = _take_shard(llg, 1, row_axis, ll.shape[1])
        if col_axis is not None:
            ll = _take_shard(ll, 2, col_axis, x.shape[2] // (2 ** j_local))

    # 4. fine-level BayesShrink: psum'd global mean(band²) per subband,
    #    pointwise threshold, dense idwt2 per shard back up
    for det, shp in zip(reversed(local_details), reversed(local_shapes)):
        new_det = []
        for band in det:
            local_sum = jnp.sum(band.reshape(n, -1) ** 2, axis=-1)
            cnt = lax.psum(jnp.asarray(float(band[0].size), x.dtype), axes)
            dvar = lax.psum(local_sum, axes) / cnt
            new_det.append(_threshold(band, dvar))
        ll = idwt2(ll, tuple(new_det), "db1", shp)
    return ll


def light_denoise_sharded(x: jnp.ndarray, strength: jnp.ndarray,
                          sigma_est: jnp.ndarray, row_axis: str,
                          col_axis: str | None = None) -> jnp.ndarray:
    """Sharded corrective blend (ref pipeline/enhancement.py:80-94):
    ``(1−s)·x + s·denoise(σ=0.5·σ̂)``, no-op where σ̂ < 0.001.
    ``sigma_est`` is the per-image [N] noise estimate (already globally
    reduced, e.g. ``estimate_sigma_spatial``)."""
    den = denoise_wavelet_sharded(
        x, row_axis, col_axis, sigma=0.5 * sigma_est)
    s = jnp.broadcast_to(jnp.asarray(strength, x.dtype),
                         (x.shape[0],))[:, None, None]
    blended = (1.0 - s) * x + s * den
    skip = (sigma_est < 1e-3)[:, None, None]
    return jnp.where(skip, x, blended)
