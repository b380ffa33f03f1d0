"""Data-parallel sharded QA over the ``data`` mesh axis.

This is the preferred scaling path (SURVEY.md §2.9 row 1): a whole series /
directory of slices becomes one ``[N, H, W]`` stack sharded on N.  Every
metric reduction in the fused QA programs is per-image, so the compiled
SPMD program contains **zero collectives** — each chip QA's its slices at
full local throughput, and the only cross-device traffic is the initial
host→device scatter.

The reference, by contrast, discards all but the middle frame of a series
(ref pipeline/dicom_io.py:60-81) and processes one image per Python call.
"""

from __future__ import annotations



import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from mdx.core import qa as _qa
from mdx.core.enhance import PlanDynamic, PlanStatic
from mdx.parallel.mesh import data_sharding, divisible_batch


def pad_batch(x: np.ndarray | jnp.ndarray, mesh: Mesh):
    """Pad [N,H,W] on N up to a multiple of the ``data`` axis size.

    Returns (padded array, valid count).  Padding replicates the last slice
    so padded lanes execute identical work (no NaN/denormal hazards) and are
    dropped on the way out.  Keeping the padded N a function of the mesh
    size alone avoids per-batch recompilation.
    """
    n = x.shape[0]
    target = divisible_batch(n, mesh)
    if target != n:
        pad = jnp.broadcast_to(x[-1:], (target - n,) + x.shape[1:])
        x = jnp.concatenate([jnp.asarray(x), pad], axis=0)
    return jnp.asarray(x), n


def _shard(x, mesh: Mesh):
    return jax.device_put(x, data_sharding(mesh))


def qa_deterministic_sharded(x, mesh: Mesh):
    """Sharded fused deterministic QA (detect→enhance→validate→score).

    ``x``: [N,H,W] float32 host or device array; N is padded to the mesh.
    Returns the same structure as :func:`mdx.core.qa.qa_deterministic` plus
    the valid count.
    """
    xp, n_valid = pad_batch(x, mesh)
    out = _qa.qa_deterministic(_shard(xp, mesh))
    return out, n_valid


def qa_plan_sharded(x, static: PlanStatic, dyn: PlanDynamic, mesh: Mesh):
    """Sharded plan-driven tuning iteration (enhance→validate→score)."""
    xp, n_valid = pad_batch(x, mesh)
    out = _qa.qa_plan(_shard(xp, mesh), static, dyn)
    return out, n_valid


def detect_sharded(x, mesh: Mesh):
    """Sharded fused 16-metric pass + issue masks."""
    xp, n_valid = pad_batch(x, mesh)
    stats, issues = _qa.detect(_shard(xp, mesh))
    return stats, issues, n_valid
