"""mdx — a TPU-native medical-image quality-assurance framework.

A from-scratch rebuild of the capabilities of the reference project
``Hiresh444/medical-image-enhancer`` (a CPU-only NumPy/scikit-image pipeline),
re-designed TPU-first:

* The numeric core (16 quality metrics, 7-op enhancement chain, safeguards,
  validation) is pure JAX on batched ``[N, H, W]`` float32 arrays, compiled to
  single fused XLA programs (``mdx.core``), with Pallas kernels for the ops
  XLA does not fuse well (``mdx.ops.pallas_kernels``).
* Scaling is expressed through ``jax.sharding`` meshes: batch (data) sharding
  across chips and 2-D spatial sharding with XLA-inserted halo exchanges for
  very large slices (``mdx.parallel``).
* The host shell — DICOM decode, SQLite persistence, JSON API, CLI, report
  builder, LLM planning agents — mirrors the reference's behaviour
  (``mdx.io``, ``mdx.pipeline``, ``mdx.serve``, ``mdx.genai``).

Layer map (mirrors SURVEY.md §1 of the reference):

    L6 clients     main.py CLI | frontend/ SPA | legacy HTML pages
    L5 HTTP        mdx.serve.api (JSON) | mdx.serve.legacy | mdx.serve.httpd
    L4 orchestration  mdx.pipeline.runner.run_pipeline
    L3 agents      mdx.pipeline.agents | mdx.genai.*
    L2 numeric     mdx.core.* (JAX) — fused metrics/enhance/validate
    L1 I/O         mdx.io.* | mdx.pipeline.storage | mdx.pipeline.trace
    L0 contracts   mdx.pipeline.schemas | mdx.utils.config
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache for every mdx surface (CLI, API server,
# batch runner): the first compile of the fused QA programs on a TPU can
# take minutes; caching makes process restarts warm.  Opt out with
# MDX_NO_COMPILE_CACHE=1.  Must be set before the jax backend initialises.
if not _os.environ.get("MDX_NO_COMPILE_CACHE"):
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdx_jax_cache")
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
del _os
