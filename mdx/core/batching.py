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
"""

from __future__ import annotations

import jax
from jax import lax

# group sizes tried in order — 32 is the measured knee of the fused pass
GROUPS = (32, 16, 8)


def map_subbatches(fn, x, *args, groups=GROUPS):
    """``fn(x, *args)`` evaluated over row groups of ``x`` via ``lax.map``,
    outputs re-flattened to leading N.  Runs ``fn`` whole when N is at or
    below the knee (≤ groups[0]) or has no usable divisor.  Arg leaves
    with a leading N axis (per-image parameter vectors) are split with
    the rows; everything else is closed over."""
    n = x.shape[0]
    g = (None if n <= groups[0]
         else next((c for c in groups if n % c == 0), None))
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
