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

# The persistent XLA compilation cache is NOT enabled at import time:
# every runner calls mdx.pipeline.compile_cache.enable(), which gates on
# the backend — jaxlib 0.9.0's XLA:CPU cache-load path CHECK-aborts
# repeated SPMD executions (colliding all-reduce rendezvous run-ids; see
# that module's docstring), so only TPU processes get the cache.  An
# import-time JAX_COMPILATION_CACHE_DIR default would bypass that gate.
