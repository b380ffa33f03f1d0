"""Spatially-sharded TV-Chambolle denoise (dual ascent across the mesh).

Ref pipeline/enhancement.py:309-312 (skimage ``denoise_tv_chambolle``)
with the same dual-ascent iteration and |E_prev − E| < eps·E_init stop as
``mdx.ops.tv.tv_chambolle_xla``, distributed over 1-D row blocks or the
2-D ``sy × sx`` tile grid:

* The divergence's backward shifts and the gradient's forward diffs each
  need ONE row (and column, for 2-D) of neighbour state per iteration —
  a [N, 1, Ws] ``ppermute`` per direction inside the ``while_loop`` body;
  global-edge shards substitute the dense op's boundary behaviour (no
  divergence contribution above the first row; zero gradient past the
  last).
* The energy terms (Σd², Σ‖∇out‖) psum over the mesh axes, so every
  shard sees the same per-image energies and the converged-mask control
  flow stays replicated — the loop trip count is identical on all shards.

Numerics match the dense solve except for psum summation order in the
energies (≤ ~1e-7 relative), which can only matter if an image sits
exactly on the stop threshold at some iteration; parity is asserted in
tests/test_spatial_tv.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax


def _shift_from_prev(v: jnp.ndarray, axis: int, mesh_axis: str
                     ) -> jnp.ndarray:
    """Backward shift along ``axis`` across shards: slot i receives
    global element i−1 (zero at the global start) — the divergence's
    ``d[1:] += p[:-1]`` contribution."""
    k = lax.axis_size(mesh_axis)
    idx = lax.axis_index(mesh_axis)
    sl = [slice(None)] * v.ndim
    sl[axis] = slice(v.shape[axis] - 1, None)
    from_prev = lax.ppermute(v[tuple(sl)], mesh_axis,
                             [(j, j + 1) for j in range(k - 1)])
    edge = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    sl_body = [slice(None)] * v.ndim
    sl_body[axis] = slice(0, v.shape[axis] - 1)
    return jnp.concatenate([edge, v[tuple(sl_body)]], axis=axis)


def _diff_with_next(v: jnp.ndarray, axis: int, mesh_axis: str
                    ) -> jnp.ndarray:
    """Forward difference along ``axis`` across shards: slot i gets
    global v[i+1] − v[i], zero at the global end (the dense op's
    end-padded ``jnp.diff``)."""
    k = lax.axis_size(mesh_axis)
    idx = lax.axis_index(mesh_axis)
    sl = [slice(None)] * v.ndim
    sl[axis] = slice(0, 1)
    from_next = lax.ppermute(v[tuple(sl)], mesh_axis,
                             [(j + 1, j) for j in range(k - 1)])
    sl_last = [slice(None)] * v.ndim
    sl_last[axis] = slice(v.shape[axis] - 1, None)
    # at the global end the appended row equals v's own last row → diff 0
    nxt = jnp.where(idx == k - 1, v[tuple(sl_last)], from_next)
    ext = jnp.concatenate([v, nxt], axis=axis)
    sl_hi = [slice(None)] * v.ndim
    sl_hi[axis] = slice(1, None)
    return ext[tuple(sl_hi)] - v


def _last_row_from_prev(v: jnp.ndarray, mesh_axis: str) -> jnp.ndarray:
    """[N,1,W]: the previous shard's LAST row of v (zeros on shard 0)."""
    k = lax.axis_size(mesh_axis)
    idx = lax.axis_index(mesh_axis)
    row = lax.ppermute(v[:, -1:, :], mesh_axis,
                       [(j, j + 1) for j in range(k - 1)])
    return jnp.where(idx == 0, jnp.zeros_like(row), row)


def _first_rows_from_next(vs: list[jnp.ndarray], mesh_axis: str
                          ) -> list[jnp.ndarray]:
    """[N,1,W] per input: the next shard's FIRST rows (zeros on the last
    shard), fetched in ONE stacked ppermute."""
    k = lax.axis_size(mesh_axis)
    idx = lax.axis_index(mesh_axis)
    stacked = jnp.stack([v[:, :1, :] for v in vs])
    got = lax.ppermute(stacked, mesh_axis,
                       [(j + 1, j) for j in range(k - 1)])
    got = jnp.where(idx == k - 1, jnp.zeros_like(got), got)
    return [got[i] for i in range(len(vs))]


def _tv_sharded_banded(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    row_axis: str,
    eps: float,
    max_iter: int,
    band: int,
    sync_axes: tuple[str, ...],
    interpret: bool,
) -> jnp.ndarray:
    """1-D row-sharded TV with the banded per-iteration Pallas kernel.

    Same dual ascent as the XLA body below, but each iteration's local
    stencil work runs as ONE `_tv_band_kernel` launch per (image, band)
    — read {x,p0,p1,out} + write {p0,p1,out} HBM traffic instead of ~10
    streamed intermediates (the dense banded kernel's 3.1× win,
    docs/PERF.md).  The shard-boundary rows that the dense kernel zero-
    fills arrive as ppermuted neighbour rows, and ``glast`` (this shard
    owns the global bottom edge) gates the gy edge mask, so interior
    shards compute real cross-boundary gradients.  Energies psum over
    ``row_axis`` and the stop flag over ALL axes (the uniform-trip-count
    invariant — see ``tv_sharded``).
    """
    from mdx.ops.pallas_kernels import _tv_band_kernel, _tv_band_step

    n, hs, ws = x.shape
    nb = hs // band
    k = lax.axis_size(row_axis)
    glast = (lax.axis_index(row_axis) == k - 1).astype(jnp.int32)[None]
    axes = (row_axis,)
    all_axes = axes + tuple(sync_axes)
    weight_arr = jnp.broadcast_to(
        jnp.asarray(weight, jnp.float32).reshape(-1), (n,))
    wcol = weight_arr[:, None, None]
    size = lax.psum(jnp.asarray(float(hs * ws), jnp.float32), axes)
    tau = 0.25
    kernel = functools.partial(_tv_band_kernel, band=band, w=ws, n_bands=nb)

    # x rows just below each band (next shard's first row at the shard
    # edge; zeros at the global bottom) — fixed for the whole solve
    (xdn_next,) = _first_rows_from_next([x], row_axis)
    xdn = jnp.concatenate(
        [x[:, band::band, :], xdn_next], axis=1).reshape(n * nb, 1, ws)

    # iteration 0 in XLA: d = 0, out0 = x, E_init, first p update
    gy = _diff_with_next(x, 1, row_axis)
    gx = jnp.concatenate(
        [x[:, :, 1:] - x[:, :, :-1], jnp.zeros((n, hs, 1), jnp.float32)],
        axis=2)
    norm = jnp.sqrt(gy * gy + gx * gx)
    e0 = wcol[:, 0, 0] * lax.psum(jnp.sum(norm, axis=(1, 2)), axes) / size
    scale = norm * tau / wcol + 1.0
    p0 = (-tau * gy) / scale
    p1 = (-tau * gx) / scale

    def cond(state):
        i, _p0, _p1, _out, _e_prev, _active, go = state
        return jnp.logical_and(i < max_iter, go)

    def body(state):
        i, p0, p1, out, e_prev, active, go = state
        up_row = _last_row_from_prev(p0, row_axis)
        dn_p0, dn_p1 = _first_rows_from_next([p0, p1], row_axis)
        p0, p1, out, eparts = _tv_band_step(
            x, xdn, p0, p1, out, active, weight_arr, band, kernel,
            interpret, up_row=up_row, dn_p0=dn_p0, dn_p1=dn_p1, glast=glast)
        e = (lax.psum(jnp.sum(eparts[:, :, 0], axis=1), axes)
             + weight_arr
             * lax.psum(jnp.sum(eparts[:, :, 1], axis=1), axes)) / size
        still = jnp.abs(e_prev - e) >= eps * e0
        active = jnp.logical_and(active, still)
        e_prev = jnp.where(active, e, e_prev)
        # globally-uniform stop flag: the per-iteration ppermutes above
        # rendezvous over every device running this program
        go = lax.psum(jnp.any(active).astype(jnp.int32), all_axes) > 0
        return (i + 1, p0, p1, out, e_prev, active, go)

    _, _, _, out, _, _, _ = lax.while_loop(
        cond, body, (jnp.asarray(1), p0, p1, x, e0,
                     jnp.ones((n,), bool), jnp.asarray(True)))
    return out


def tv_sharded(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    row_axis: str,
    col_axis: str | None = None,
    eps: float = 2e-4,
    max_iter: int = 200,
    sync_axes: tuple[str, ...] = ("data",),
    banded: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """TV-Chambolle on spatially-sharded [N, Hs, Ws] blocks (runs under
    shard_map).  ``col_axis=None`` = 1-D row blocks (columns local).

    ``sync_axes``: mesh axes that run the SAME program but hold DIFFERENT
    images (the ``data`` axis).  The loop's stop flag must be uniform
    across them: the per-iteration ``ppermute``s rendezvous over every
    device executing the program, so if one data row's images converge
    first and its devices exit the loop, the others' collectives deadlock
    (caught by the driver dryrun, 4-of-8 rendezvous timeout).  Converged
    images are already frozen by the ``active`` mask — extra iterations
    are no-ops on their outputs — so a psum'd global any-active flag
    preserves the dense semantics exactly while keeping the trip count
    identical on all devices.

    ``banded``: run the per-iteration Pallas band kernel on the local
    blocks (``_tv_sharded_banded``) instead of the XLA stencil body.
    None = auto: on TPU, 1-D layout, a band divides the local height and
    the (local) width is lane-aligned.  ``interpret`` forces Pallas
    interpret mode (CPU parity tests)."""
    if banded is None:
        import jax

        from mdx.ops.pallas_kernels import tv_band_for

        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        banded = (col_axis is None and on_tpu
                  and tv_band_for(x.shape[1]) != 0 and x.shape[2] % 128 == 0)
    if banded and col_axis is None:
        from mdx.ops.pallas_kernels import tv_band_for

        band = tv_band_for(x.shape[1])
        if band:
            return _tv_sharded_banded(x, weight, row_axis, eps, max_iter,
                                      band, sync_axes, interpret)
    axes = (row_axis,) if col_axis is None else (row_axis, col_axis)
    all_axes = axes + tuple(sync_axes)
    n, hs, ws = x.shape
    weight = jnp.broadcast_to(jnp.asarray(weight, x.dtype),
                              (n,))[:, None, None]
    size = lax.psum(jnp.asarray(float(hs * ws), x.dtype), axes)
    tau = 0.25

    zcol = jnp.zeros((n, hs, 1), x.dtype)

    def _div(p):
        d = -(p[:, 0] + p[:, 1])
        d = d + _shift_from_prev(p[:, 0], 1, row_axis)
        if col_axis is None:
            # concat-style shift: bit-identical to `.at[:, :, 1:].add`
            # but fuses instead of lowering to a separate
            # dynamic-update-slice HBM pass (dense rewrite measured ~25%
            # on the XLA TV fallback — mdx/ops/tv.py)
            d = d + jnp.concatenate([zcol, p[:, 1, :, :-1]], axis=2)
        else:
            d = d + _shift_from_prev(p[:, 1], 2, col_axis)
        return d

    def _grads(out):
        gy = _diff_with_next(out, 1, row_axis)
        if col_axis is None:
            gx = jnp.concatenate(
                [out[:, :, 1:] - out[:, :, :-1], zcol], axis=2)
        else:
            gx = _diff_with_next(out, 2, col_axis)
        return gy, gx

    def _energy_and_out(p, first):
        if first:
            d = jnp.zeros_like(x)
            out = x
        else:
            d = _div(p)
            out = x + d
        e = lax.psum(jnp.sum(d * d, axis=(1, 2)), axes)
        gy, gx = _grads(out)
        norm = jnp.sqrt(gy * gy + gx * gx)
        e = (e + weight[:, 0, 0]
             * lax.psum(jnp.sum(norm, axis=(1, 2)), axes)) / size
        return out, gy, gx, norm, e

    def _update_p(p, gy, gx, norm, active):
        scale = norm * tau / weight + 1.0
        new_p = jnp.stack([
            (p[:, 0] - tau * gy) / scale,
            (p[:, 1] - tau * gx) / scale,
        ], axis=1)
        return jnp.where(active[:, None, None, None], new_p, p)

    p0 = jnp.zeros((n, 2, hs, ws), x.dtype)
    out0, gy, gx, norm, e0 = _energy_and_out(p0, first=True)
    p1 = _update_p(p0, gy, gx, norm, jnp.ones((n,), bool))

    def cond(state):
        i, p, out, e_prev, active, go = state
        return jnp.logical_and(i < max_iter, go)

    def body(state):
        i, p, out, e_prev, active, go = state
        new_out, gy, gx, norm, e = _energy_and_out(p, first=False)
        out = jnp.where(active[:, None, None], new_out, out)
        p = _update_p(p, gy, gx, norm, active)
        still = jnp.abs(e_prev - e) >= eps * e0
        active = jnp.logical_and(active, still)
        e_prev = jnp.where(active, e, e_prev)
        # globally-uniform stop flag (see docstring): any active image on
        # ANY device sharing this program keeps every device looping
        go = lax.psum(jnp.any(active).astype(jnp.int32), all_axes) > 0
        return (i + 1, p, out, e_prev, active, go)

    _, _, out, _, _, _ = lax.while_loop(
        cond, body, (jnp.asarray(1), p1, out0, e0, jnp.ones((n,), bool),
                     jnp.asarray(True)))
    return out
