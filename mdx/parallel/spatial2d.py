"""2-D spatially-sharded (row×col tile) fused QA pass with halo exchange.

Generalises :mod:`mdx.parallel.spatial` (1-D row blocks over ``space``) to a
2-D ``sy × sx`` tile grid, lifting the documented row-floor bound: 1-D
row blocks cap the usable mesh at H/16 shards (PARITY.md); 2-D tiles cap it
at (H/16)·(W/16) — 16 384 shards for a 2048² slice instead of 128.  This is
the SURVEY.md §2.9 "2-D spatial sharding with halo exchange" component.

Topology (all inside one ``shard_map``-compiled SPMD program on a
``("data", "sy", "sx")`` mesh):

* **Halo exchange** is two-phase: row halos move over the ``sy`` ring via
  ``lax.ppermute`` first, then column halos of the *row-extended* block move
  over ``sx`` — the second phase carries the freshly attached halo rows, so
  corner cells arrive without a dedicated diagonal exchange.  Global-edge
  shards synthesise their halo from their own border (symmetric / reflect /
  edge-replicate, matching each op's unsharded boundary handling), so
  results are bit-compatible with the single-chip programs.
* **Moment reductions / histograms** psum over BOTH mesh axes (JAX
  collectives take the ``("sy", "sx")`` tuple directly) — exact.
* **Order statistics** reuse the exact bitwise search of
  ``mdx.ops.quantile.percentiles_exact_sharded`` with the two-axis tuple:
  count-below psums span the whole tile grid, so percentiles, the
  wavelet-MAD median, and the p90 gradient cut are bit-identical to a
  global sort.
* **The stride-2 DWT** (sigma estimation) keeps its global phase by
  requiring an even per-shard extent on both axes; the one duplicated
  boundary output per interior shard (each direction) carries validity
  weight 0, exactly as the 1-D path does for rows
  (``mdx.parallel.spatial._hh_subband_halo``).

Metric formulas mirror ref pipeline/metrics.py:42-217 (per-formula
citations in mdx/core/metrics.py); the enhancement chain mirrors
ref pipeline/enhancement.py:270-312 with every op sharded (denoise →
CLAHE → gamma → unsharp → post_denoise → bilateral → TV, via the _sp
modules) plus the noise-amplification safeguard.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mdx.parallel._spmd_stats import (
    SpatialPrims,
    image_stats_block as _shared_image_stats,
    qa_verdict as _qa_verdict,
)
from mdx.ops import filters as _F
from mdx.ops.quantile import (
    percentiles_exact_sharded as _pq_sharded,
    percentiles_multi_sharded as _pq_multi_sharded,
)
from mdx.refimpl.wavelet_np import MAD_TO_SIGMA, qmf_pair

_AY = "sy"
_AX = "sx"
_AXES = (_AY, _AX)
# Widest one-hop stencil halo (unsharp Gaussian fixed support, radius 12;
# see mdx/parallel/spatial.py) — now a floor on BOTH per-shard extents.
_MIN_PER_SHARD = 16



# ---------------------------------------------------------------------------
# Two-phase halo exchange
# ---------------------------------------------------------------------------


def _edge_pad(x: jnp.ndarray, n: int, axis: int, side: str,
              mode: str) -> jnp.ndarray:
    """Global-boundary halo synthesised from the block's own border rows or
    columns: ``symmetric`` (edge row included), ``reflect`` (excluded), or
    ``edge`` (edge row replicated) — the three boundary conventions the
    unsharded ops use."""
    if mode == "edge":
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, 1) if side == "lo" else slice(-1, None)
        shape = list(x.shape)
        shape[axis] = n
        return jnp.broadcast_to(x[tuple(sl)], shape)
    off = 0 if mode == "symmetric" else 1
    sl = [slice(None)] * x.ndim
    if side == "lo":
        sl[axis] = slice(off, n + off)
    else:
        stop = x.shape[axis] - off
        sl[axis] = slice(stop - n, stop)
    return jnp.flip(x[tuple(sl)], axis=axis)


def _halo_axis(x: jnp.ndarray, lo: int, hi: int, axis: int,
               mesh_axis: str, mode: str) -> jnp.ndarray:
    """Extend one array axis with ``lo``/``hi`` halo slabs from the ring
    neighbours on ``mesh_axis``; global-edge shards synthesise theirs."""
    k = lax.axis_size(mesh_axis)
    idx = lax.axis_index(mesh_axis)
    parts = []
    if lo:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(x.shape[axis] - lo, None)
        from_prev = lax.ppermute(x[tuple(sl)], mesh_axis,
                                 [(j, j + 1) for j in range(k - 1)])
        parts.append(jnp.where(idx == 0,
                               _edge_pad(x, lo, axis, "lo", mode), from_prev))
    parts.append(x)
    if hi:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, hi)
        from_next = lax.ppermute(x[tuple(sl)], mesh_axis,
                                 [(j + 1, j) for j in range(k - 1)])
        parts.append(jnp.where(idx == k - 1,
                               _edge_pad(x, hi, axis, "hi", mode), from_next))
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else x


def _halo2(x: jnp.ndarray, up: int, down: int, left: int, right: int,
           mode: str = "symmetric") -> jnp.ndarray:
    """[N, Hs, Ws] tile → [N, Hs+up+down, Ws+left+right].  Rows first over
    ``sy``, then columns of the row-extended block over ``sx`` — the column
    phase carries the new halo rows, so corners need no diagonal hop."""
    xr = _halo_axis(x, up, down, 1, _AY, mode)
    return _halo_axis(xr, left, right, 2, _AX, mode)


# ---------------------------------------------------------------------------
# Halo'd stencils
# ---------------------------------------------------------------------------


def _lap_sobel(x: jnp.ndarray):
    """(laplacian, sobel_h, sobel_v) of tiles via the dense shift-MAC
    cores on ONE two-phase-halo-extended block (mdx/ops/filters.py; the
    slice arithmetic is identical to the single-chip ops, so parity is
    exact — axis-wise mirrors commute with cross-axis arithmetic)."""
    xp = _halo2(x, 1, 1, 1, 1, "symmetric")
    return _F.laplace_core(xp), _F.sobel_h_core(xp), _F.sobel_v_core(xp)


def _box_halo(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable shift-add mean with SciPy uniform_filter offsets
    (left-heavy for even sizes) across both tile boundaries — the dense
    ``box_core`` on a halo-extended block."""
    lo = size // 2
    hi = size - lo - 1
    xp = _halo2(x, lo, hi, lo, hi, "symmetric")
    return _F.box_core(xp, size)


def _local_variance_halo(x: jnp.ndarray, size: int) -> jnp.ndarray:
    m = _box_halo(x, size)
    m2 = _box_halo(x * x, size)
    return jnp.maximum(m2 - m * m, 0.0)


# ---------------------------------------------------------------------------
# Distributed reductions over the tile grid
# ---------------------------------------------------------------------------


def _pmean_img(v: jnp.ndarray) -> jnp.ndarray:
    """Global per-image mean of [N, Hs, Ws] tiles → [N]."""
    n = v.shape[0]
    s = lax.psum(jnp.sum(v.reshape(n, -1), axis=-1), _AXES)
    cnt = lax.psum(jnp.asarray(v[0].size, v.dtype), _AXES)
    return s / cnt


def _pvar_img(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    m = _pmean_img(v)
    m2 = _pmean_img(v * v)
    return m, jnp.maximum(m2 - m * m, 0.0)


def _phist(v: jnp.ndarray, bins: int, hi: jnp.ndarray) -> jnp.ndarray:
    """Global per-image histogram over [0, hi_i] → [N, bins]; exact-integer
    count tables psummed over the tile grid (mdx/ops/hist.py MXU nibble
    formulation — identical counts to the single-chip path)."""
    from mdx.ops.hist import bin_indices, counts_from_indices

    n = v.shape[0]
    idx = bin_indices(v.reshape(n, -1), bins, jnp.maximum(hi, 1e-30))
    return lax.psum(counts_from_indices(idx, bins), _AXES)


# ---------------------------------------------------------------------------
# Distributed wavelet-MAD sigma (stride-2 DWT over both axes)
# ---------------------------------------------------------------------------


def _hh_subband_2d(x: jnp.ndarray, wavelet: str = "db2"):
    """Finest-scale HH detail coefficients of the global image on 2-D tiles.

    Both separable analysis passes now cross shard boundaries: each gets an
    (L−1)-slab halo (symmetric at the global border — minus one leading
    element this equals the PyWavelets half-sample extension), starts one
    element in, and strides by 2.  With even per-shard extents the global
    stride phase is preserved; each direction leaves per-shard extent/2 + 1
    outputs whose trailing element is valid only on the last shard of that
    axis (elsewhere it duplicates the next shard's first output).  Returns
    (coeffs [N, hs/2+1, ws/2+1], validity weights of the same shape).
    """
    lo_f, hi_f = qmf_pair(wavelet)
    L = len(lo_f)
    n, hs, ws = x.shape

    # Along W (cross-shard over sx): halo, drop one leading col, stride 2.
    # Strided shift-MACs (mdx/ops/wavelet.py strided_taps_mac) instead of
    # n=1 strided convs — the conv lowering has no channel parallelism to
    # tile here (same pathology as the 1-D layer's blur/HH, docs/PERF.md
    # round 3).
    from mdx.ops.wavelet import strided_taps_mac

    hi_r = hi_f[::-1]
    extc = _halo_axis(x, L - 1, L - 1, 2, _AX, "symmetric")
    extc = lax.slice_in_dim(extc, 1, 1 + ws + 2 * (L - 1) - 1, axis=2)
    n_out_w = (extc.shape[2] - L) // 2 + 1
    d_w = strided_taps_mac(extc, hi_r, n_out_w, axis=2)  # [N, hs, ws/2+1]

    # Along H (cross-shard over sy) on the column subband — its duplicate
    # tail column is carried through (columns transform independently) and
    # masked by the validity weights below.
    extr = _halo_axis(d_w, L - 1, L - 1, 1, _AY, "symmetric")
    extr = lax.slice_in_dim(extr, 1, 1 + hs + 2 * (L - 1) - 1, axis=1)
    n_out_h = (extr.shape[1] - L) // 2 + 1
    d_hw = strided_taps_mac(extr, hi_r, n_out_h, axis=1)  # [N, hs/2+1, ws/2+1]

    iy, ky = lax.axis_index(_AY), lax.axis_size(_AY)
    ix, kx = lax.axis_index(_AX), lax.axis_size(_AX)
    row = lax.broadcasted_iota(jnp.int32, (1, hs // 2 + 1, 1), 1)
    col = lax.broadcasted_iota(jnp.int32, (1, 1, ws // 2 + 1), 2)
    rvalid = (row < hs // 2) | (iy == ky - 1)
    cvalid = (col < ws // 2) | (ix == kx - 1)
    valid = jnp.where(rvalid & cvalid, 1.0, 0.0)
    return d_hw, valid


def _mad_source(x: jnp.ndarray):
    """(|HH| db2 subband, static global valid count, validity weights) —
    the order-statistic input of the wavelet-MAD sigma, exposed so the
    metric pass can fold its median into the fused multi-source search."""
    hh, valid = _hh_subband_2d(x, "db2")
    ky, kx = lax.axis_size(_AY), lax.axis_size(_AX)
    _, hs2, ws2 = hh.shape
    total = ((hs2 - 1) * ky + 1) * ((ws2 - 1) * kx + 1)
    return jnp.abs(hh), total, valid


def estimate_sigma_2d(x: jnp.ndarray) -> jnp.ndarray:
    """Distributed wavelet-MAD noise sigma over 2-D tiles → [N]; the median
    of |HH| is exact (two-axis psum-distributed order-statistic search)."""
    hh_abs, total, valid = _mad_source(x)
    med = _pq_sharded(hh_abs, [50.0], _AXES, total, weights=valid)[0]
    return med * jnp.asarray(MAD_TO_SIGMA, x.dtype)


# ---------------------------------------------------------------------------
# The fused tile-sharded metric pass
# ---------------------------------------------------------------------------


def _pq(v, qs):
    """Exact global percentiles of the local tile (shared-formula prim)."""
    total = v[0].size * lax.axis_size(_AY) * lax.axis_size(_AX)
    return _pq_sharded(v, qs, _AXES, total)


def _pq_multi(sources):
    """Fused multi-source search (shared-formula prim); total None ⇒ the
    whole two-axis tile grid."""
    k = lax.axis_size(_AY) * lax.axis_size(_AX)
    full = [(v, qs, v[0].size * k if total is None else total, w)
            for v, qs, total, w in sources]
    return _pq_multi_sharded(full, _AXES)


def _pmax_img(v):
    return lax.pmax(jnp.max(v.reshape(v.shape[0], -1), axis=-1), _AXES)


def _psum_img(v):
    return lax.psum(jnp.sum(v.reshape(v.shape[0], -1), axis=-1), _AXES)


_PRIMS = SpatialPrims(
    lap_sobel=_lap_sobel, local_variance=_local_variance_halo,
    pmean=_pmean_img, pvar=_pvar_img, phist=_phist, pq=_pq,
    pmax_img=_pmax_img, psum_img=_psum_img, sigma=estimate_sigma_2d,
    mad_source=_mad_source, pq_multi=_pq_multi)


def _image_stats_block(x: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Per-shard body of the fused metric pass on [N, Hs, Ws] tiles.  The
    formulas live ONCE in mdx/parallel/_spmd_stats.py; this layer
    contributes the two-phase-halo / two-axis-reduction primitives."""
    return _shared_image_stats(x, _PRIMS)


def _check_tiles(x: jnp.ndarray, mesh: Mesh) -> None:
    ky, kx = mesh.shape[_AY], mesh.shape[_AX]
    h, w = x.shape[1], x.shape[2]
    for name, extent, k in (("H", h, ky), ("W", w, kx)):
        if extent % k or (extent // k) % 2:
            raise ValueError(
                f"{name}={extent} must split into even-sized blocks over "
                f"{k} '{_AY if name == 'H' else _AX}' shards (stride-2 "
                f"wavelet phase)")
        if extent // k < _MIN_PER_SHARD:
            raise ValueError(
                f"{name}={extent} over {k} shards gives {extent // k} "
                f"{'rows' if name == 'H' else 'cols'}/shard — the widest "
                f"stencil halo needs {_MIN_PER_SHARD} (single-hop halos; "
                f"max usable {'sy' if name == 'H' else 'sx'} axis for "
                f"{name}={extent} is {extent // _MIN_PER_SHARD})")


def image_stats_spatial2d(x: jnp.ndarray, mesh: Mesh) -> dict[str, jnp.ndarray]:
    """Fused 16-metric pass on a (data × sy × sx)-tile-sharded [N,H,W]
    stack; both spatial extents must split evenly with even per-shard size.
    Results are replicated [N] vectors."""
    _check_tiles(x, mesh)
    x = jax.device_put(x, NamedSharding(mesh, P("data", _AY, _AX)))
    return _stats_program(mesh)(x)


@lru_cache(maxsize=8)
def _stats_program(mesh: Mesh):
    return jax.jit(shard_map(
        _image_stats_block,
        mesh=mesh,
        in_specs=P("data", _AY, _AX),
        out_specs=P("data"),
        check_vma=False,
    ))


# ---------------------------------------------------------------------------
# Tile-sharded enhancement (halo-local ops)
# ---------------------------------------------------------------------------


def _gaussian_blur_halo(x: jnp.ndarray, sigma: jnp.ndarray,
                        max_radius: int = 12) -> jnp.ndarray:
    """Separable Gaussian with traced sigma on fixed support, skimage
    ``nearest`` (edge-replicate) boundary, across both tile axes —
    unrolled shift-MACs on the halo-extended block; per-image sigma
    supported.  The grouped-conv lowering is pathological at the spatial
    layers' 1–4 images per shard (no channel parallelism to tile:
    276.8 ms → 2.6 ms at 1×2048², docs/PERF.md round 3)."""
    r = max_radius
    n, hs, ws = x.shape
    sigma_b = jnp.broadcast_to(
        jnp.asarray(sigma, x.dtype).reshape(-1), (n,))
    w = _F._gauss_taps(sigma_b, x.dtype)
    xp = _halo2(x, r, r, r, r, "edge")
    return _F.shift_macs_cols(_F.shift_macs_rows(xp, w, hs), w, ws)


def _bilateral_halo(x: jnp.ndarray, d: int, sigma_color: jnp.ndarray,
                    sigma_space: jnp.ndarray) -> jnp.ndarray:
    """Unrolled shifted-MAC bilateral (mdx/ops/bilateral.py semantics,
    reflect boundary at the global edges) across both tile axes."""
    d = min(int(d), 9)
    if d % 2 == 0:
        d += 1
    r = d // 2
    n, hs, ws = x.shape
    sc = jnp.broadcast_to(jnp.asarray(sigma_color, x.dtype),
                          (n,))[:, None, None]
    ss = jnp.broadcast_to(jnp.asarray(sigma_space, x.dtype),
                          (n,))[:, None, None]
    inv_2sc2 = 1.0 / (2.0 * sc * sc)
    inv_2ss2d2 = 1.0 / (2.0 * ss * ss * float(d * d))
    xp = _halo2(x, r, r, r, r, "reflect")
    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = xp[:, r + dy:r + dy + hs, r + dx:r + dx + ws]
            sw = jnp.exp(-float(dx * dx + dy * dy) * inv_2ss2d2)
            iw = jnp.exp(-jnp.square(x - shifted) * inv_2sc2)
            wgt = sw * iw
            num = num + wgt * shifted
            den = den + wgt
    return num / (den + 1e-10)


def _enhance_block(x: jnp.ndarray, gamma: jnp.ndarray,
                   unsharp_radius: jnp.ndarray,
                   unsharp_amount: jnp.ndarray,
                   bilateral_sigma_color: jnp.ndarray,
                   bilateral_sigma_space: jnp.ndarray,
                   clahe_clip: jnp.ndarray, tv_weight: jnp.ndarray,
                   post_denoise_strength: jnp.ndarray,
                   *, bilateral_d: int, clahe_tile: int = 0,
                   use_tv: bool = False, use_denoise: bool = False,
                   use_post_denoise: bool = False) -> jnp.ndarray:
    """Sharded enhancement chain on tiles, in reference chain order
    (ref pipeline/enhancement.py:270-312): denoise → CLAHE → gamma →
    unsharp → post_denoise → bilateral → TV.  Every op shards exactly over
    both axes — wavelet denoise via per-shard db1 transforms + a tiny
    coarse-level gather (mdx/parallel/wavelet_sp.py), CLAHE via one halo
    tile-row/col of LUTs (clahe_sp.py), TV via one-row/col halos per
    dual-ascent iteration (tv_sp.py)."""
    if use_denoise:
        from mdx.parallel.wavelet_sp import denoise_wavelet_sharded

        x = jnp.clip(denoise_wavelet_sharded(x, _AY, _AX), 0.0, 1.0)
    if clahe_tile > 0:
        from mdx.parallel.clahe_sp import clahe_sharded

        x = clahe_sharded(x, clahe_clip, clahe_tile, _AY, _AX)
    y = jnp.power(jnp.maximum(x, 0.0), gamma)
    blur = _gaussian_blur_halo(y, unsharp_radius)
    y = jnp.clip(y + (y - blur) * unsharp_amount, 0.0, 1.0)
    if use_post_denoise:
        from mdx.parallel.wavelet_sp import light_denoise_sharded

        y = light_denoise_sharded(
            y, post_denoise_strength, estimate_sigma_2d(y), _AY, _AX)
    if bilateral_d > 0:
        y = _bilateral_halo(jnp.clip(y, 0.0, 1.0), bilateral_d,
                            bilateral_sigma_color, bilateral_sigma_space)
    if use_tv:
        from mdx.parallel.tv_sp import tv_sharded

        y = tv_sharded(jnp.clip(y, 0.0, 1.0), tv_weight, _AY, _AX)
    return jnp.clip(y, 0.0, 1.0)


def _check_clahe_tiles(x: jnp.ndarray, mesh: Mesh,
                       clahe_tile: int) -> None:
    if not clahe_tile:
        return
    ky, kx = mesh.shape[_AY], mesh.shape[_AX]
    if (x.shape[1] // ky) % clahe_tile or (x.shape[2] // kx) % clahe_tile:
        raise ValueError(
            f"sharded CLAHE needs per-shard rows ({x.shape[1]}/{ky}) and "
            f"cols ({x.shape[2]}/{kx}) to be multiples of "
            f"tile_size={clahe_tile}")


def enhance_spatial2d(x: jnp.ndarray, mesh: Mesh, *, gamma: float = 1.0,
                      unsharp_radius: float = 0.8,
                      unsharp_amount: float = 0.5,
                      bilateral_d: int = 0,
                      bilateral_sigma_color: float = 0.05,
                      bilateral_sigma_space: float = 0.05,
                      clahe_clip_limit: float | None = None,
                      clahe_tile_size: int = 16,
                      tv_weight: float | None = None,
                      denoise: bool = False,
                      post_denoise_strength: float | None = None
                      ) -> jnp.ndarray:
    """Tile-sharded enhancement of [N,H,W] in reference chain order —
    [denoise →] [CLAHE →] gamma → unsharp → [post_denoise →] bilateral
    [→ TV]; optional ops join when their parameter is given."""
    _check_tiles(x, mesh)
    clahe_tile = int(clahe_tile_size) if clahe_clip_limit is not None else 0
    _check_clahe_tiles(x, mesh, clahe_tile)
    x = jax.device_put(x, NamedSharding(mesh, P("data", _AY, _AX)))
    return _enhance_program(mesh, int(bilateral_d), clahe_tile,
                            tv_weight is not None, bool(denoise),
                            post_denoise_strength is not None)(
        x, jnp.float32(gamma), jnp.float32(unsharp_radius),
        jnp.float32(unsharp_amount), jnp.float32(bilateral_sigma_color),
        jnp.float32(bilateral_sigma_space),
        jnp.float32(clahe_clip_limit if clahe_clip_limit is not None
                    else 0.0),
        jnp.float32(tv_weight if tv_weight is not None else 0.0),
        jnp.float32(post_denoise_strength
                    if post_denoise_strength is not None else 0.0))


@lru_cache(maxsize=16)
def _enhance_program(mesh: Mesh, bilateral_d: int, clahe_tile: int = 0,
                     use_tv: bool = False, use_denoise: bool = False,
                     use_post_denoise: bool = False):
    return jax.jit(shard_map(
        partial(_enhance_block, bilateral_d=bilateral_d,
                clahe_tile=clahe_tile, use_tv=use_tv,
                use_denoise=use_denoise,
                use_post_denoise=use_post_denoise),
        mesh=mesh,
        in_specs=(P("data", _AY, _AX),
                  P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P("data", _AY, _AX),
        check_vma=False,
    ))


# ---------------------------------------------------------------------------
# Tile-sharded validation + full QA step
# ---------------------------------------------------------------------------


def _ssim_block(x: jnp.ndarray, y: jnp.ndarray,
                data_range: float = 1.0, win_size: int = 7) -> jnp.ndarray:
    """Distributed SSIM on tiles → [N] (skimage semantics: 7×7 uniform
    window, unbiased covariance, (win−1)//2 crop at the GLOBAL border —
    expressed as a validity mask on the shards owning a global edge)."""
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)
    ux = _box_halo(x, win_size)
    uy = _box_halo(y, win_size)
    uxx = _box_halo(x * x, win_size)
    uyy = _box_halo(y * y, win_size)
    uxy = _box_halo(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2))

    pad = (win_size - 1) // 2
    n, hs, ws = x.shape
    iy, ky = lax.axis_index(_AY), lax.axis_size(_AY)
    ix, kx = lax.axis_index(_AX), lax.axis_size(_AX)
    row = lax.broadcasted_iota(jnp.int32, (1, hs, 1), 1)
    col = lax.broadcasted_iota(jnp.int32, (1, 1, ws), 2)
    rvalid = ~(((iy == 0) & (row < pad))
               | ((iy == ky - 1) & (row >= hs - pad)))
    cvalid = ~(((ix == 0) & (col < pad))
               | ((ix == kx - 1) & (col >= ws - pad)))
    valid = jnp.where(rvalid & cvalid, 1.0, 0.0)
    total = lax.psum(jnp.sum((s * valid).reshape(n, -1), axis=-1), _AXES)
    cnt = lax.psum(jnp.sum(valid), _AXES)
    return total / cnt


def _psnr_block(x: jnp.ndarray, y: jnp.ndarray,
                data_range: float = 1.0) -> jnp.ndarray:
    mse = _pmean_img(jnp.square(x - y))
    return 10.0 * jnp.log10((data_range * data_range) / mse)


def _qa_block(xb, gamma, unsharp_radius, unsharp_amount,
              bilateral_sigma_color, bilateral_sigma_space, clahe_clip,
              tv_weight, post_denoise_strength, *, bilateral_d,
              clahe_tile=0, use_tv=False, use_denoise=False,
              use_post_denoise=False, use_noise_guard=False):
    before = _image_stats_block(xb)
    enhanced = _enhance_block(
        xb, gamma, unsharp_radius, unsharp_amount,
        bilateral_sigma_color, bilateral_sigma_space, clahe_clip,
        tv_weight, post_denoise_strength, bilateral_d=bilateral_d,
        clahe_tile=clahe_tile, use_tv=use_tv, use_denoise=use_denoise,
        use_post_denoise=use_post_denoise)
    if use_noise_guard:
        # noise-amplification safeguard (ref pipeline/enhancement.py:55-63,
        # 221-226): σ_after > 1.3·σ_before → corrective light_denoise(0.4)
        from mdx.parallel.wavelet_sp import light_denoise_sharded

        sb = before["sigma"]
        sa = estimate_sigma_2d(enhanced)
        noise_amp = (sb >= 1e-8) & (sa > sb * 1.3)
        fixed = jnp.clip(light_denoise_sharded(
            enhanced, jnp.float32(0.4), sa, _AY, _AX), 0.0, 1.0)
        enhanced = jnp.where(noise_amp[:, None, None], fixed, enhanced)
    else:
        noise_amp = jnp.zeros(xb.shape[0], bool)
    after = _image_stats_block(enhanced)
    s = _ssim_block(xb, enhanced)
    p = _psnr_block(xb, enhanced)
    qi, passes = _qa_verdict(before, after, s, p)
    return before, after, enhanced, s, p, qi, passes, noise_amp


@lru_cache(maxsize=16)
def _qa_program(mesh: Mesh, bilateral_d: int, clahe_tile: int = 0,
                use_tv: bool = False, use_denoise: bool = False,
                use_post_denoise: bool = False,
                use_noise_guard: bool = False):
    return jax.jit(shard_map(
        partial(_qa_block, bilateral_d=bilateral_d, clahe_tile=clahe_tile,
                use_tv=use_tv, use_denoise=use_denoise,
                use_post_denoise=use_post_denoise,
                use_noise_guard=use_noise_guard),
        mesh=mesh,
        in_specs=(P("data", _AY, _AX),
                  P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P("data"), P("data"), P("data", _AY, _AX),
                   P("data"), P("data"), P("data"), P("data"),
                   P("data")),
        check_vma=False))


def qa_spatial2d(
    x: jnp.ndarray,
    mesh: Mesh,
    *,
    gamma: float = 0.95,
    unsharp_radius: float = 0.8,
    unsharp_amount: float = 0.5,
    bilateral_d: int = 5,
    bilateral_sigma_color: float = 0.05,
    bilateral_sigma_space: float = 0.05,
    clahe_clip_limit: float | None = None,
    clahe_tile_size: int = 16,
    tv_weight: float | None = None,
    denoise: bool = False,
    post_denoise_strength: float | None = None,
    noise_guard: bool = False,
) -> dict:
    """Full tile-sharded QA on huge slices: detect → sharded enhancement
    chain → before/after metrics + SSIM/PSNR + the reference's three-way
    pass rule (ref pipeline/metrics.py:282-286), entirely on the
    (data × sy × sx) mesh.  Same contract as
    :func:`mdx.parallel.spatial.qa_spatial`, with the space ceiling lifted
    to (H/16)·(W/16) shards; the full reference op set is available
    sharded (``denoise``/``post_denoise_strength``, ``clahe_clip_limit``,
    ``tv_weight``)."""
    _check_tiles(x, mesh)
    clahe_tile = int(clahe_tile_size) if clahe_clip_limit is not None else 0
    _check_clahe_tiles(x, mesh, clahe_tile)
    x = jax.device_put(x, NamedSharding(mesh, P("data", _AY, _AX)))
    before, after, enhanced, s, p, qi, passes, noise_amp = _qa_program(
        mesh, int(bilateral_d), clahe_tile, tv_weight is not None,
        bool(denoise), post_denoise_strength is not None,
        bool(noise_guard))(
        x, jnp.float32(gamma), jnp.float32(unsharp_radius),
        jnp.float32(unsharp_amount), jnp.float32(bilateral_sigma_color),
        jnp.float32(bilateral_sigma_space),
        jnp.float32(clahe_clip_limit if clahe_clip_limit is not None
                    else 0.0),
        jnp.float32(tv_weight if tv_weight is not None else 0.0),
        jnp.float32(post_denoise_strength
                    if post_denoise_strength is not None else 0.0))
    from mdx.core.metrics import detect_issues

    return {
        "stats_before": before,
        "stats_after": after,
        "issues": detect_issues(before),
        "enhanced": enhanced,
        "ssim": s,
        "psnr": p,
        "quality_improvement": qi,
        "passes": passes,
        "noise_amp_guard": noise_amp,
    }
