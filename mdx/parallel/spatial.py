"""Spatially-sharded (row-block) fused metric pass with halo exchange.

Capability extension over the reference (which has no parallelism at all,
SURVEY.md §2.9): one very large slice — 2048²+ CXR, stitched pathology
tiles — is laid out as row blocks over the mesh ``space`` axis.  Everything
runs inside one ``shard_map``-compiled SPMD program:

* **Stencils** (Laplacian, Sobel, box-filter windows) read a halo of rows
  owned by the neighbouring shard.  The halos move over ICI with
  ``lax.ppermute``; the outermost shards fall back to the same symmetric
  edge padding the single-chip path uses, so interior results are
  bit-identical to the unsharded program.
* **Moment reductions** (mean, variance, clip fractions, histograms) are
  local partial sums combined with ``lax.psum`` — exact.
* **Order statistics** (percentiles, the wavelet-MAD median) are EXACT
  without a global sort: the bitwise binary search of
  ``mdx.ops.quantile`` distributes as local count-below sums combined
  with ``lax.psum`` — 16 sweeps, each ending in one tiny [N,R,3]
  collective.  Results are bit-identical to gathering every shard and
  sorting (parity asserted in tests/test_parallel.py).

The metric *formulas* mirror ref pipeline/metrics.py:42-217 exactly;
see mdx/core/metrics.py for the per-formula citations.
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

_AXIS = "space"
# Widest one-shard stencil halo: the unsharp Gaussian's fixed support
# (radius 12, mdx/ops/filters.py _GAUSS_MAX_RADIUS); box16 needs 8,
# bilateral ≤4, the db2 DWT 3.  Row blocks must cover it.
_MIN_ROWS_PER_SHARD = 16


# ---------------------------------------------------------------------------
# Halo exchange
# ---------------------------------------------------------------------------


def _halo_rows(x: jnp.ndarray, up: int, down: int,
               edge_mode: str = "symmetric") -> jnp.ndarray:
    """Extend [N, Hs, W] row blocks with ``up``/``down`` halo rows.

    Interior halos come from the ring neighbours via ``ppermute``; the first
    and last shard pad their own rows with ``edge_mode`` — "symmetric"
    (= ``jnp.pad(mode="symmetric")``, edge row repeated), "reflect"
    (edge row excluded), or "edge" (edge row replicated, SciPy "nearest")
    — matching the unsharded op's boundary handling.
    """
    k = lax.axis_size(_AXIS)
    idx = lax.axis_index(_AXIS)
    off = 1 if edge_mode == "reflect" else 0
    parts = []
    if up:
        # shard j sends its bottom `up` rows to shard j+1
        from_above = lax.ppermute(
            x[:, -up:, :], _AXIS, [(j, j + 1) for j in range(k - 1)])
        if edge_mode == "edge":
            top_pad = jnp.broadcast_to(x[:, :1, :],
                                       (x.shape[0], up, x.shape[2]))
        else:
            top_pad = x[:, off:up + off, :][:, ::-1, :]
        parts.append(jnp.where(idx == 0, top_pad, from_above))
    parts.append(x)
    if down:
        # shard j sends its top `down` rows to shard j-1
        from_below = lax.ppermute(
            x[:, :down, :], _AXIS, [(j + 1, j) for j in range(k - 1)])
        stop = x.shape[1] - off
        if edge_mode == "edge":
            bot_pad = jnp.broadcast_to(x[:, -1:, :],
                                       (x.shape[0], down, x.shape[2]))
        else:
            bot_pad = x[:, stop - down:stop, :][:, ::-1, :]
        parts.append(jnp.where(idx == k - 1, bot_pad, from_below))
    return jnp.concatenate(parts, axis=1)


def _lap_sobel(x: jnp.ndarray):
    """(laplacian, sobel_h, sobel_v) of row blocks via the dense shift-MAC
    cores on ONE halo-extended block (mdx/ops/filters.py; the slice
    arithmetic is identical to the single-chip ops, so parity is exact —
    axis-wise mirrors commute with cross-axis arithmetic)."""
    xp = jnp.pad(_halo_rows(x, 1, 1), ((0, 0), (0, 0), (1, 1)),
                 mode="symmetric")
    return _F.laplace_core(xp), _F.sobel_h_core(xp), _F.sobel_v_core(xp)


def _box_halo(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable shift-add mean with SciPy uniform_filter offsets
    (left-heavy for even sizes) across shard boundaries — the dense
    ``box_core`` on a halo-extended block."""
    lo = size // 2
    hi = size - lo - 1
    xp = jnp.pad(_halo_rows(x, lo, hi), ((0, 0), (0, 0), (lo, hi)),
                 mode="symmetric")
    return _F.box_core(xp, size)


def _local_variance_halo(x: jnp.ndarray, size: int) -> jnp.ndarray:
    m = _box_halo(x, size)
    m2 = _box_halo(x * x, size)
    return jnp.maximum(m2 - m * m, 0.0)


# ---------------------------------------------------------------------------
# Distributed reductions
# ---------------------------------------------------------------------------


def _pmean_img(v: jnp.ndarray) -> jnp.ndarray:
    """Global per-image mean of [N, Hs, W] row blocks → [N]."""
    n = v.shape[0]
    s = lax.psum(jnp.sum(v.reshape(n, -1), axis=-1), _AXIS)
    cnt = lax.psum(jnp.asarray(v[0].size, v.dtype), _AXIS)
    return s / cnt


def _pvar_img(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Global per-image (mean, variance) via psum of moments → ([N],[N])."""
    m = _pmean_img(v)
    m2 = _pmean_img(v * v)
    return m, jnp.maximum(m2 - m * m, 0.0)


def _phist(v: jnp.ndarray, bins: int, hi: jnp.ndarray,
           weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Global per-image histogram over [0, hi_i] → [N, bins].

    Same MXU nibble-one-hot formulation as mdx.ops.hist (each pixel's exact
    bin index → one batched matmul of the high/low nibble one-hots); the
    per-shard count tables are psummed, which is bit-identical to the
    single-chip path when ``hi`` matches — counts are exact integers in
    f32, so the shard-sum order cannot change them.  Optional ``weights``
    (broadcastable to v, 0/1) exclude padding samples exactly.
    """
    from mdx.ops.hist import bin_indices, counts_from_indices

    n = v.shape[0]
    flat = v.reshape(n, -1)
    idx = bin_indices(flat, bins, jnp.maximum(hi, 1e-30))
    w = None
    if weights is not None:
        w = jnp.broadcast_to(weights, v.shape).reshape(n, -1)
    c = counts_from_indices(idx, bins, weights=w)
    return lax.psum(c, _AXIS)


# ---------------------------------------------------------------------------
# Distributed wavelet-MAD sigma
# ---------------------------------------------------------------------------


def _hh_subband_halo(x: jnp.ndarray, wavelet: str = "db2") -> jnp.ndarray:
    """Finest-scale HH detail coefficients of the global image, computed on
    row blocks.

    The separable analysis filter runs along W locally (full rows are
    shard-resident) and along H with halo rows.  To keep the stride-2 phase
    of the global transform, every shard must own an even number of rows —
    asserted by the caller.  Output rows: Hs/2 per shard.
    """
    lo_f, hi_f = qmf_pair(wavelet)
    L = len(lo_f)
    n, hs, w = x.shape
    from mdx.ops.wavelet import strided_taps_mac

    hi_r = hi_f[::-1]

    # Along W (local): symmetric half-sample extension, stride 2 —
    # strided shift-MACs (mdx/ops/wavelet.py strided_taps_mac, the dense
    # analysis lowering; the n=1 strided conv this replaces cost ~19 ms
    # at 1×2048² k=1, docs/PERF.md round 3).
    xp = jnp.pad(x, ((0, 0), (0, 0), (L - 1, L - 1)), mode="symmetric")[..., 1:]
    n_out_w = (w + L - 1) // 2
    d_w = strided_taps_mac(xp, hi_r, n_out_w, axis=2)

    # Along H (cross-shard): halo of L-1 rows on both sides, then start one
    # row in.  Global output j reads extended rows [2j-(L-2), 2j+2); with
    # hs even, shard i owns outputs [i·hs/2, (i+1)·hs/2), whose first window
    # begins L-2 rows above the shard top — i.e. at halo row 1 of the
    # (L-1)-row halo.  Shard 0's symmetric halo minus its first row equals
    # the PyWavelets half-sample extension (pad L-1, drop 1 leading), so the
    # same offset holds there.
    ext = _halo_rows(d_w, L - 1, L - 1)
    ext = lax.slice_in_dim(ext, 1, 1 + hs + 2 * (L - 1) - 1, axis=1)
    n_out_h = (ext.shape[1] - L) // 2 + 1
    d_hw = strided_taps_mac(ext, hi_r, n_out_h, axis=1)
    # Global output count is (H+L-1)//2 = H/2+1 rows (db2, even H): each
    # shard owns hs/2 rows plus ONE trailing row that (a) on the last shard
    # is the genuine bottom-boundary output and (b) on interior shards
    # duplicates the next shard's first row.  Keep hs/2+1 rows and return a
    # validity weight that keeps the trailing row only on the last shard,
    # so the distributed MAD matches the single-device transform.
    keep = d_hw[:, : hs // 2 + 1, :]
    idx = lax.axis_index(_AXIS)
    k = lax.axis_size(_AXIS)
    row = lax.broadcasted_iota(jnp.int32, (1, hs // 2 + 1, 1), 1)
    valid = jnp.where((row < hs // 2) | (idx == k - 1), 1.0, 0.0)
    return keep, valid


def _mad_source(x: jnp.ndarray):
    """(|HH| db2 subband, static global valid count, validity weights) —
    the order-statistic input of the wavelet-MAD sigma, exposed so the
    metric pass can fold its median into the fused multi-source search."""
    hh, valid = _hh_subband_halo(x, "db2")
    k = lax.axis_size(_AXIS)
    _, hs2, wout = hh.shape
    total = ((hs2 - 1) * k + 1) * wout  # valid rows: hs/2 per shard + 1 tail
    return jnp.abs(hh), total, valid


def estimate_sigma_spatial(x: jnp.ndarray) -> jnp.ndarray:
    """Distributed wavelet-MAD noise sigma over row blocks → [N].

    The median of |HH| is EXACT: a psum-distributed bitwise order-statistic
    search over the validity-weighted subband (the trailing duplicate row
    on interior shards carries weight 0)."""
    hh_abs, total, valid = _mad_source(x)
    med = _pq_sharded(hh_abs, [50.0], _AXIS, total, weights=valid)[0]
    return med * jnp.asarray(MAD_TO_SIGMA, x.dtype)


# ---------------------------------------------------------------------------
# The fused spatially-sharded metric pass
# ---------------------------------------------------------------------------

def _pq(v, qs):
    """Exact global percentiles of the local block (shared-formula prim)."""
    total = v[0].size * lax.axis_size(_AXIS)
    return _pq_sharded(v, qs, _AXIS, total)


def _pq_multi(sources):
    """Fused multi-source search (shared-formula prim); total None ⇒ the
    whole row-block axis."""
    full = [(v, qs, v[0].size * lax.axis_size(_AXIS) if total is None
             else total, w) for v, qs, total, w in sources]
    return _pq_multi_sharded(full, _AXIS)


def _pmax_img(v):
    return lax.pmax(jnp.max(v.reshape(v.shape[0], -1), axis=-1), _AXIS)


def _psum_img(v):
    return lax.psum(jnp.sum(v.reshape(v.shape[0], -1), axis=-1), _AXIS)


_PRIMS = SpatialPrims(
    lap_sobel=_lap_sobel, local_variance=_local_variance_halo,
    pmean=_pmean_img, pvar=_pvar_img, phist=_phist, pq=_pq,
    pmax_img=_pmax_img, psum_img=_psum_img, sigma=estimate_sigma_spatial,
    mad_source=_mad_source, pq_multi=_pq_multi)


def _image_stats_block(x: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Per-shard body of the fused metric pass (runs under shard_map).

    ``x``: [N, Hs, W] row block.  The formulas live ONCE in
    mdx/parallel/_spmd_stats.py; this layer contributes the row-block
    halo/reduction primitives."""
    return _shared_image_stats(x, _PRIMS)


def image_stats_spatial(x: jnp.ndarray, mesh: Mesh) -> dict[str, jnp.ndarray]:
    """Fused 16-metric pass on a hybrid (data × space)-sharded [N,H,W] stack.

    Rows must divide evenly over the ``space`` axis with an even per-shard
    row count (stride-2 wavelet phase).  Results are replicated [N] vectors.
    """
    k = mesh.shape[_AXIS]
    h = x.shape[1]
    if h % k or (h // k) % 2:
        raise ValueError(
            f"H={h} must split into even-sized row blocks over {k} shards")
    if h // k < _MIN_ROWS_PER_SHARD:
        raise ValueError(
            f"H={h} over {k} shards gives {h // k} rows/shard — the widest "
            f"stencil halo needs {_MIN_ROWS_PER_SHARD} (single-hop halos; "
            f"max usable space axis for H={h} is "
            f"{h // _MIN_ROWS_PER_SHARD}); use fewer spatial shards or the "
            f"batch-sharded path")
    x = jax.device_put(x, NamedSharding(mesh, P("data", _AXIS, None)))
    return _stats_program(mesh)(x)


@lru_cache(maxsize=8)
def _stats_program(mesh: Mesh):
    """One compiled SPMD metric pass per mesh (jax.jit caches by callable
    identity — rebuilding the shard_map closure per call would recompile
    every invocation)."""
    return jax.jit(shard_map(
        _image_stats_block,
        mesh=mesh,
        in_specs=P("data", _AXIS, None),
        out_specs=P("data"),
        check_vma=False,
    ))


# ---------------------------------------------------------------------------
# Spatially-sharded enhancement (halo-local ops)
# ---------------------------------------------------------------------------


def _gaussian_blur_halo(x: jnp.ndarray, sigma: jnp.ndarray,
                        max_radius: int = 12) -> jnp.ndarray:
    """Separable Gaussian with traced sigma on fixed support, skimage
    ``nearest`` (edge-replicate) boundary, across row blocks — unrolled
    shift-MACs on the halo-extended block; per-image sigma supported.

    The dense op's batch-as-channels grouped conv is the WRONG lowering
    here: its 11× win needs many channels to tile onto the MXU, and the
    spatial layers run 1–4 images per shard — measured 276.8 ms for the
    two n=1 convs at 1×2048² k=1 vs 2.6 ms for these 50 shifted MACs
    (docs/PERF.md round 3; the same pathology cost the db2 HH subband
    ~19 ms)."""
    r = max_radius
    n, hs, ws = x.shape
    sigma_b = jnp.broadcast_to(
        jnp.asarray(sigma, x.dtype).reshape(-1), (n,))
    w = _F._gauss_taps(sigma_b, x.dtype)
    xp = _halo_rows(x, r, r, edge_mode="edge")
    xp = jnp.pad(xp, ((0, 0), (0, 0), (r, r)), mode="edge")
    return _F.shift_macs_cols(_F.shift_macs_rows(xp, w, hs), w, ws)


def _bilateral_halo(x: jnp.ndarray, d: int, sigma_color: jnp.ndarray,
                    sigma_space: jnp.ndarray) -> jnp.ndarray:
    """Edge-preserving bilateral filter across row blocks (reflect boundary
    at the global edges, halo rows from neighbours).  Same unrolled
    shifted-MAC formulation as mdx/ops/bilateral.py."""
    d = min(int(d), 9)
    if d % 2 == 0:
        d += 1
    r = d // 2
    n, hs, w = x.shape
    sc = jnp.broadcast_to(jnp.asarray(sigma_color, x.dtype),
                          (n,))[:, None, None]
    ss = jnp.broadcast_to(jnp.asarray(sigma_space, x.dtype),
                          (n,))[:, None, None]
    inv_2sc2 = 1.0 / (2.0 * sc * sc)
    inv_2ss2d2 = 1.0 / (2.0 * ss * ss * float(d * d))
    xp = _halo_rows(x, r, r, edge_mode="reflect")
    xp = jnp.pad(xp, ((0, 0), (0, 0), (r, r)), mode="reflect")
    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = xp[:, r + dy:r + dy + hs, r + dx:r + dx + w]
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
    """Sharded enhancement chain on row blocks, in reference chain order
    (ref pipeline/enhancement.py:270-312):
    denoise → CLAHE → gamma → unsharp → post_denoise → bilateral → TV.

    Every op shards exactly: wavelet denoise via per-shard db1 transforms
    + a tiny coarse-level gather (mdx/parallel/wavelet_sp.py), CLAHE via
    one halo tile-row of LUTs (mdx/parallel/clahe_sp.py), TV-Chambolle
    via one-row halos per dual-ascent iteration (mdx/parallel/tv_sp.py).
    Static flags gate the ops (jit cache key), continuous parameters are
    traced.
    """
    if use_denoise:
        from mdx.parallel.wavelet_sp import denoise_wavelet_sharded

        x = jnp.clip(denoise_wavelet_sharded(x, _AXIS), 0.0, 1.0)
    if clahe_tile > 0:
        from mdx.parallel.clahe_sp import clahe_sharded

        x = clahe_sharded(x, clahe_clip, clahe_tile, _AXIS)
    y = jnp.power(jnp.maximum(x, 0.0), gamma)
    blur = _gaussian_blur_halo(y, unsharp_radius)
    # skimage unsharp_mask clips to [0,1] inside the op
    y = jnp.clip(y + (y - blur) * unsharp_amount, 0.0, 1.0)
    if use_post_denoise:
        from mdx.parallel.wavelet_sp import light_denoise_sharded

        y = light_denoise_sharded(
            y, post_denoise_strength, estimate_sigma_spatial(y), _AXIS)
    if bilateral_d > 0:
        y = _bilateral_halo(jnp.clip(y, 0.0, 1.0), bilateral_d,
                            bilateral_sigma_color, bilateral_sigma_space)
    if use_tv:
        from mdx.parallel.tv_sp import tv_sharded

        y = tv_sharded(jnp.clip(y, 0.0, 1.0), tv_weight, _AXIS)
    return jnp.clip(y, 0.0, 1.0)


def _check_clahe_tiles(x: jnp.ndarray, mesh: Mesh,
                       clahe_tile: int) -> None:
    if not clahe_tile:
        return
    k = mesh.shape[_AXIS]
    if (x.shape[1] // k) % clahe_tile or x.shape[2] % clahe_tile:
        raise ValueError(
            f"sharded CLAHE needs per-shard rows ({x.shape[1]}/{k}) and "
            f"W={x.shape[2]} to be multiples of tile_size={clahe_tile}")


def enhance_spatial(x: jnp.ndarray, mesh: Mesh, *, gamma: float = 1.0,
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
    """Spatially-sharded enhancement of [N,H,W] row blocks in reference
    chain order — [denoise →] [CLAHE →] gamma → unsharp →
    [post_denoise →] bilateral [→ TV]; the optional ops join when their
    parameter is given (all shard exactly, see the _sp modules)."""
    k = mesh.shape[_AXIS]
    if x.shape[1] % k or x.shape[1] // k < _MIN_ROWS_PER_SHARD:
        raise ValueError(
            f"H={x.shape[1]} over {k} shards: need ≥{_MIN_ROWS_PER_SHARD} "
            f"rows per shard for the single-hop stencil halos (max usable "
            f"space axis for H={x.shape[1]} is "
            f"{x.shape[1] // _MIN_ROWS_PER_SHARD})")
    clahe_tile = int(clahe_tile_size) if clahe_clip_limit is not None else 0
    _check_clahe_tiles(x, mesh, clahe_tile)
    x = jax.device_put(x, NamedSharding(mesh, P("data", _AXIS, None)))
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
    """Compiled spatial enhancement per (mesh, static op gates); the
    continuous parameters are traced (replicated) inputs, so parameter
    sweeps reuse one program."""
    return jax.jit(shard_map(
        partial(_enhance_block, bilateral_d=bilateral_d,
                clahe_tile=clahe_tile, use_tv=use_tv,
                use_denoise=use_denoise,
                use_post_denoise=use_post_denoise),
        mesh=mesh,
        in_specs=(P("data", _AXIS, None),
                  P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P("data", _AXIS, None),
        check_vma=False,
    ))


# ---------------------------------------------------------------------------
# Spatially-sharded validation + full QA step
# ---------------------------------------------------------------------------


def _ssim_block(x: jnp.ndarray, y: jnp.ndarray,
                data_range: float = 1.0, win_size: int = 7) -> jnp.ndarray:
    """Distributed SSIM on row blocks → [N] (skimage semantics:
    7×7 uniform window, unbiased covariance, (win−1)//2 border crop —
    the crop applies to the *global* image border, so only the first/last
    shards drop rows; column crop is local)."""
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
    n, hs, w = x.shape
    idx = lax.axis_index(_AXIS)
    k = lax.axis_size(_AXIS)
    row = lax.broadcasted_iota(jnp.int32, (1, hs, 1), 1)
    valid = jnp.ones((1, hs, 1), jnp.float32)
    valid = jnp.where((idx == 0) & (row < pad), 0.0, valid)
    valid = jnp.where((idx == k - 1) & (row >= hs - pad), 0.0, valid)
    s = s[:, :, pad:-pad] * valid
    total = lax.psum(jnp.sum(s.reshape(n, -1), axis=-1), _AXIS)
    cnt = lax.psum(jnp.sum(valid) * (w - 2 * pad), _AXIS)
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
        sa = estimate_sigma_spatial(enhanced)
        noise_amp = (sb >= 1e-8) & (sa > sb * 1.3)
        fixed = jnp.clip(light_denoise_sharded(
            enhanced, jnp.float32(0.4), sa, _AXIS), 0.0, 1.0)
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
    """Compiled full spatial QA per (mesh, static op gates)."""
    return jax.jit(shard_map(
        partial(_qa_block, bilateral_d=bilateral_d, clahe_tile=clahe_tile,
                use_tv=use_tv, use_denoise=use_denoise,
                use_post_denoise=use_post_denoise,
                use_noise_guard=use_noise_guard),
        mesh=mesh,
        in_specs=(P("data", _AXIS, None),
                  P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P("data"), P("data"), P("data", _AXIS, None),
                   P("data"), P("data"), P("data"), P("data"),
                   P("data")),
        check_vma=False))


def qa_spatial(
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
    """Full spatially-sharded QA on huge slices: one SPMD program running
    detect → sharded enhancement chain → before/after metrics + SSIM/PSNR
    + the reference's three-way pass rule — entirely on the (data × space)
    mesh.  The full reference op set is available sharded:
    ``denoise``/``post_denoise_strength`` (mdx/parallel/wavelet_sp.py),
    ``clahe_clip_limit`` (clahe_sp.py), gamma/unsharp/bilateral (halo
    stencils), ``tv_weight`` (tv_sp.py) — all in reference chain order.

    Returns {stats_before, stats_after, issues, enhanced, ssim, psnr,
    quality_improvement, passes} with [N]-shaped scalars replicated and
    ``enhanced`` sharded like the input.
    """
    k = mesh.shape[_AXIS]
    h = x.shape[1]
    if h % k or (h // k) % 2:
        raise ValueError(
            f"H={h} must split into even-sized row blocks over {k} shards")
    if h // k < _MIN_ROWS_PER_SHARD:
        raise ValueError(
            f"H={h} over {k} shards gives {h // k} rows/shard — the widest "
            f"stencil halo needs {_MIN_ROWS_PER_SHARD} (single-hop halos; "
            f"max usable space axis for H={h} is "
            f"{h // _MIN_ROWS_PER_SHARD}); use fewer spatial shards or the "
            f"batch-sharded path")

    clahe_tile = int(clahe_tile_size) if clahe_clip_limit is not None else 0
    _check_clahe_tiles(x, mesh, clahe_tile)
    x = jax.device_put(x, NamedSharding(mesh, P("data", _AXIS, None)))
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
