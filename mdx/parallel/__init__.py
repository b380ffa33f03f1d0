"""Parallelism layer: device meshes, sharded QA, spatial (halo) sharding.

The reference has no parallelism of any kind (SURVEY.md §2.9 — its only
concurrency is one daemon thread per web run).  This package is therefore
net-new capability, designed TPU-first:

* :mod:`mdx.parallel.mesh` — ``jax.sharding.Mesh`` construction over the
  available chips, with a ``data`` (batch/slice) axis and an optional
  ``space`` (row-block) axis.
* :mod:`mdx.parallel.batch` — data-parallel QA: all frames of a DICOM
  series (which the reference reduces to the middle slice,
  ref pipeline/dicom_io.py:60-81) are sharded over the ``data`` axis and run
  the fused detect→enhance→validate program with zero collectives (every
  metric reduction is per-image).
* :mod:`mdx.parallel.spatial` — 1-D spatial sharding for slices too large
  for one chip: row blocks over the ``space`` axis, stencil halos exchanged
  with ``lax.ppermute`` over ICI, global reductions via ``psum``/``pmax``
  collectives, and EXACT distributed order statistics (the bitwise
  search of :mod:`mdx.ops.quantile` with psum-combined counts).
* :mod:`mdx.parallel.spatial2d` — 2-D (row × column) tile sharding over a
  ``(data, sy, sx)`` mesh with two-phase halo exchange; lifts the 1-D
  layer's H/16 shard ceiling to (H/16)·(W/16).
* :mod:`mdx.parallel.clahe_sp` / :mod:`tv_sp` / :mod:`wavelet_sp` — the
  globally-coupled enhancement ops (CLAHE, TV-Chambolle, BayesShrink
  wavelet denoise) sharded exactly, completing the 7-op reference chain
  on both spatial layouts.
* :mod:`mdx.parallel.plan_sp` — the plan path sharded: ``apply_plan``
  with all three safeguards (uniform psum'd cond predicates), full
  validation + objective score (``qa_plan_spatial``), and the LLM-free
  candidate sweep for huge slices (``autotune_spatial``).
"""

from mdx.parallel.mesh import (
    make_mesh, make_mesh2d, data_sharding, spatial_sharding,
)
from mdx.parallel.batch import pad_batch, qa_deterministic_sharded, qa_plan_sharded
from mdx.parallel import spatial
from mdx.parallel import spatial2d
from mdx.parallel.plan_sp import qa_plan_spatial

__all__ = [
    "make_mesh", "make_mesh2d", "data_sharding", "spatial_sharding",
    "pad_batch", "qa_deterministic_sharded", "qa_plan_sharded",
    "qa_plan_spatial", "spatial", "spatial2d",
]
