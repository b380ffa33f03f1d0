"""Internal sub-batching for the fused dense programs.

Measured on TPU v5e (tools/profile_pass.py, docs/PERF.md "batch-scaling
cliff"): the XLA-lowered metric/stencil blocks scale SUPER-linearly past
~32 images — at batch 128 the fused metric pass costs 7.9× batch-32
(want 4×), percentiles 9.8×, the 256-bin histogram 17× — while the
Pallas kernels (CLAHE, TV) stay linear.  The compiler's fusion/tiling
choices degrade with the larger leading dimension; re-running the SAME
program over fixed-size row groups inside one jit (``lax.map``) restores
the batch-32 operating point: full pass at 128 = 169.6 → 125.2 ms
(755 → 1023 img/s), metric pass 51.5 → 25.7 ms.

Every per-image program in mdx is row-independent, so grouping is
semantically the identity.

The knee is PIXEL-based, not image-based (round-3 sweep of the full
plan path on hardware): the optimum group is 32 images at 512²
(8.4M px), 8 at 1024² (g32/g16/g8/g4 = 229/198/178/222 ms at batch 32),
and 4 at 2048² (whole-16/g8/g4/g2 = 1639/1647/1421/1536 ms) — i.e.
``min(32, max(4, 8.4M // H·W))``.  The 4-image floor exists because
per-group dispatch overhead (the banded TV kernel's per-iteration
pallas_calls amortise over the group's images) overtakes the fusion win
below it.
"""

from __future__ import annotations

import jax
from jax import lax

# 32 × 512² — the measured pixel knee of the fused pass
PIXEL_KNEE = 8_388_608
GROUPS = (32, 16, 8)  # legacy explicit-override form


def group_limit(shape) -> int:
    """Largest efficient group for images of ``shape[-2:]``.

    The knee constant is empirical for the platform stamped in
    ``mdx.ops.pallas_kernels`` — a one-time warning fires on other TPU
    generations/compilers so the sweep gets re-run, not trusted."""
    try:
        if jax.default_backend() == "tpu":
            from mdx.ops.pallas_kernels import check_swept_platform

            check_swept_platform()
    except Exception:
        pass
    px = int(shape[-2]) * int(shape[-1]) if len(shape) >= 3 else 512 * 512
    return min(32, max(4, PIXEL_KNEE // px))


def map_subbatches(fn, x, *args, groups=None):
    """``fn(x, *args)`` evaluated over row groups of ``x`` via ``lax.map``,
    outputs re-flattened to leading N.  Runs ``fn`` whole when N is at or
    below the pixel-aware knee (``group_limit``) or has no divisor ≥ 2
    within it (prime batch sizes run whole — rare, and splitting would
    need a second compiled remainder program).  Arg leaves with a leading
    N axis (per-image parameter vectors) are split with the rows;
    everything else is closed over.  ``groups`` overrides the knee with
    an explicit candidate tuple (tests / sweeps)."""
    n = x.shape[0]
    if groups is not None:
        g = (None if n <= groups[0]
             else next((c for c in groups if n % c == 0), None))
    else:
        gmax = group_limit(x.shape)
        g = (None if n <= gmax
             else next((c for c in range(gmax, 1, -1) if n % c == 0), None))
    if g is None:
        return fn(x, *args)

    flat, treedef = jax.tree_util.tree_flatten(args)
    split_idx = [i for i, leaf in enumerate(flat)
                 if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == n]
    split = tuple(flat[i].reshape(n // g, g, *flat[i].shape[1:])
                  for i in split_idx)

    def body(xs):
        xc, parts = xs
        leaves = list(flat)
        for i, leaf in zip(split_idx, parts):
            leaves[i] = leaf
        return fn(xc, *jax.tree_util.tree_unflatten(treedef, leaves))

    xg = x.reshape(n // g, g, *x.shape[1:])
    out = lax.map(body, (xg, split))
    return jax.tree_util.tree_map(
        lambda a: a.reshape(n, *a.shape[2:]), out)
