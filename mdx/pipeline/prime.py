"""Deploy-time compile-cache priming.

Fresh hosts pay the remote-TPU toolchain once per distinct fused program
(~25 s for the single 512² QA pass; ≈22 min for a mixed stream's three
raw-ingest dtype buckets — docs/PERF.md "Fresh deploys").  The persistent
cache (mdx/pipeline/compile_cache.py) makes that once per HOST; this
module moves it to BUILD time: run it while baking a deploy image (or
right after provisioning) and every listed program is compiled, executed
once on synthetic pixels, and written to the cache, so the first real
study hits only warm executables.

The primer drives the SAME entry points the product uses —
``qa.qa_deterministic`` at the single-image and padded-chunk shapes, the
batch runner's raw-ingest programs per stored dtype and windowing mode,
and the packed-output collector — so the cache keys match the production
HLO exactly (a lookalike re-implementation here would compile a
different program and prime nothing).

``--tuning`` additionally primes the tuning surface: the K-lane dense
autotune sweep program per issue set (K is the only thing that changes
the HLO — 9 lanes for non-blur sets, 27 with blur's unsharp grid) via
``mdx.core.tuning.autotune``, and the GenAI tool programs at ``[1,H,W]``
(``image_stats``, ``enhance_only`` for the default op chain,
``validate``) — their continuous parameters are weak-typed traced
scalars, so one compile covers every parameter value the LLM can send.

CLI::

    python -m mdx.pipeline.prime --shapes 512x512,1024x1024 \
        --chunk 64 --dtypes uint16,int16,uint8,float32 --window both \
        --tuning --issues noise+low_contrast,blur
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Iterable, Sequence

import numpy as np

logger = logging.getLogger(__name__)

RAW_DTYPES = ("uint16", "int16", "uint8")


def _synthetic_descs(dtype: str, n: int) -> list[dict]:
    """Plausible raw-ingest descriptors (mdx/io/dicom.py load_frames_raw
    contract) for synthetic frames — the scalar VALUES don't affect the
    compiled program, only its structure does."""
    gmax = {"uint8": 255.0, "int16": 2047.0, "uint16": 4095.0}[dtype]
    return [{
        "slope": 1.0, "intercept": 0.0, "mono1": False,
        "gmin": 0.0, "gmax": gmax,
        "window": (gmax / 2.0, gmax) if i % 2 else None,
    } for i in range(n)]


def _synthetic_frames(h: int, w: int, n: int, dtype: str) -> np.ndarray:
    rng = np.random.default_rng(0)
    if dtype == "float32":
        return rng.random((n, h, w), np.float32)
    hi = {"uint8": 255, "int16": 2048, "uint16": 4096}[dtype]
    return rng.integers(0, hi, (n, h, w)).astype(dtype)


def prime_tuning(
    shapes: Sequence[tuple[int, int]] = ((512, 512),),
    *,
    issue_sets: Sequence[Sequence[str]] = (("noise", "low_contrast"),
                                           ("blur",)),
    log: Callable[[str], None] = logger.info,
) -> int:
    """Compile + cache the tuning-surface programs (autotune sweep per
    issue set, GenAI tool programs at [1, H, W]).  Same entry points as
    the product (``mdx.core.tuning.autotune``, ``mdx/genai/tools.py``);
    returns the number of programs executed."""
    import jax
    import jax.numpy as jnp

    from mdx.core.metrics import image_stats
    from mdx.core.qa import enhance_only
    from mdx.core.tuning import autotune, candidate_grid
    from mdx.core.validate import validate
    from mdx.pipeline.schemas import EnhancementPlan

    count = 0
    for h, w in shapes:
        t_shape = time.perf_counter()
        img = _synthetic_frames(h, w, 1, "float32")[0]
        seen_k = set()
        for issues in issue_sets:
            k = len(candidate_grid(list(issues)))
            if k in seen_k:  # same K ⇒ same HLO ⇒ already primed
                continue
            seen_k.add(k)
            autotune(img, list(issues))
            count += 1
            log(f"  [{h}x{w}] autotune sweep K={k} "
                f"(issues={'+'.join(issues)})")
        # GenAI tool programs: the tool path lowers an EnhancementPlan's
        # Python-float params to weak-typed traced scalars, so the cache
        # key depends only on the op set — prime the default chain.
        x1 = jnp.asarray(img, jnp.float32)[None]
        stats = image_stats(x1)
        jax.block_until_ready(stats["sigma"])
        static, dyn = EnhancementPlan(recommended_ops=[
            "denoise", "clahe", "gamma", "unsharp", "post_denoise",
        ]).to_static_dynamic()
        enhanced, _flags = enhance_only(x1, static, dyn)
        v = validate(x1, enhanced)
        jax.block_until_ready(v["ssim"])
        count += 3
        log(f"  [{h}x{w}] GenAI tool programs "
            f"(image_stats, enhance_only[{'+'.join(static.ops)}], "
            "validate)")
        log(f"[{h}x{w}] tuning surface done in "
            f"{time.perf_counter() - t_shape:.1f} s")
    return count


SPATIAL_ISSUE_SETS = (
    ("noise",),
    ("low_contrast",),
    ("noise", "low_contrast"),
    ("blur",),
    ("noise", "low_contrast", "blur"),
    ("clipping_low",),
    ("clipping_high",),
)


def prime_spatial(
    shapes: Sequence[tuple[int, int]] = ((2048, 2048),),
    *,
    mesh=None,
    issue_sets: Sequence[Sequence[str]] = SPATIAL_ISSUE_SETS,
    log: Callable[[str], None] = logger.info,
) -> int:
    """Compile + cache the huge-slice (``--spatial``) programs: the
    sharded detect stats pass, the issue-driven QA chain for every gate
    combination the listed issue sets produce (the runner's jit cache is
    keyed on those static gates, so each distinct combination is its own
    compile), and ONE spatial autotune sweep — unlike the dense K-lane
    sweep, the spatial sweep runs its candidates sequentially through a
    single compiled program with traced parameters, so the candidate
    count never changes the HLO.  Uses the runner's own mesh
    construction / dispatch / issue mapping (``build_spatial_mesh`` /
    ``spatial_fns`` / ``issue_driven_kwargs``), so the cache keys match
    the deploy host's real topology and the production HLO."""
    import jax

    from mdx.core.metrics import ISSUE_ORDER
    from mdx.parallel.plan_sp import autotune_spatial
    from mdx.pipeline.spatial_runner import (
        build_spatial_mesh,
        issue_driven_kwargs,
        spatial_fns,
    )

    count = 0
    for h, w in shapes:
        t_shape = time.perf_counter()
        m = mesh if mesh is not None else build_spatial_mesh(h, w)
        qa_fn, stats_fn, layout = spatial_fns(m)
        ky, kx = ((layout["sy"], layout["sx"]) if "sx" in layout
                  else (layout["space"], 1))
        layout_s = " ".join(f"{k}={v}" for k, v in layout.items())

        frame = _synthetic_frames(h, w, 1, "float32")[0]
        x = frame[None]
        stats = stats_fn(x, m)
        jax.block_until_ready(stats["sigma"])
        count += 1
        seen_kw = set()
        for issues in issue_sets:
            flags = {k: k in issues for k in ISSUE_ORDER}
            kw, ops = issue_driven_kwargs(flags, h, w, ky, kx)
            key = tuple(sorted((k, str(v)) for k, v in kw.items()))
            if key not in seen_kw:
                seen_kw.add(key)
                out = qa_fn(x, m, **kw)
                jax.block_until_ready(out["enhanced"])
                count += 1
                log(f"  [{h}x{w}] QA chain ops={'+'.join(ops) or 'none'}"
                    f" (issues={'+'.join(issues)})")
        autotune_spatial(frame, ["noise", "low_contrast"], m)
        count += 1
        log(f"  [{h}x{w}] spatial autotune sweep (one reused program)")
        log(f"[{h}x{w}] spatial surface done ({layout_s}; {len(seen_kw)} "
            f"gate combos) in {time.perf_counter() - t_shape:.1f} s")
    return count


def prime(
    shapes: Sequence[tuple[int, int]] = ((512, 512),),
    *,
    chunk: int = 64,
    dtypes: Iterable[str] = RAW_DTYPES + ("float32",),
    window_modes: Iterable[bool] = (False, True),
    single: bool = True,
    mesh=None,
    log: Callable[[str], None] = logger.info,
) -> int:
    """Compile + cache the product's standard device programs.

    Returns the number of programs executed (each lands in the persistent
    cache; re-runs are cheap cache hits, so priming is idempotent)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mdx.core import qa
    from mdx.parallel import make_mesh, pad_batch
    from mdx.parallel.mesh import data_sharding
    from mdx.pipeline.batch_runner import (
        _ingest_params,
        _pack_outputs,
        _raw_qa_program,
    )
    from mdx.pipeline.compile_cache import enable as _enable_compile_cache

    cache_dir = _enable_compile_cache()
    log(f"compile cache: {cache_dir or 'DISABLED'}")
    if mesh is None:
        mesh = make_mesh()
    d = mesh.shape["data"]
    chunk_n = max(-(-chunk // d) * d, d)

    count = 0
    for h, w in shapes:
        t_shape = time.perf_counter()
        if single:
            # single-image runner: qa_deterministic on [1, H, W]
            out = qa.qa_deterministic(
                jnp.asarray(_synthetic_frames(h, w, 1, "float32")))
            jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
            count += 1
            log(f"  [{h}x{w}] single-image QA pass")
        for dtype in dtypes:
            for window in window_modes:
                if dtype == "float32" and window:
                    continue  # f32 fallback frames are pre-windowed
                frames = _synthetic_frames(h, w, chunk_n, dtype)
                xp, _ = pad_batch(jnp.asarray(frames), mesh)
                xp = jax.device_put(xp, data_sharding(mesh))
                if dtype == "float32":
                    out = qa.qa_deterministic(xp)
                else:
                    params = _ingest_params(
                        _synthetic_descs(dtype, chunk_n), window,
                        xp.shape[0])
                    vec = NamedSharding(mesh, P("data"))
                    params = tuple(jax.device_put(p, vec) for p in params)
                    out = _raw_qa_program(window)(xp, *params)
                packed = _pack_outputs(out)
                jax.block_until_ready(packed)
                count += 1
                log(f"  [{h}x{w}] chunk={chunk_n} dtype={dtype}"
                    f" window={window}")
        log(f"[{h}x{w}] done in {time.perf_counter() - t_shape:.1f} s")
    return count


def _parse_shapes(s: str) -> list[tuple[int, int]]:
    out = []
    for part in s.split(","):
        hw = part.lower().split("x")
        out.append((int(hw[0]), int(hw[1] if len(hw) > 1 else hw[0])))
    return out


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="Prime the persistent compile cache with the "
                    "product's standard device programs.")
    ap.add_argument("--shapes", default="512x512",
                    help="comma-separated HxW list (e.g. 512x512,1024x1024)")
    ap.add_argument("--chunk", type=int, default=64,
                    help="batch chunk size to prime (runner default 64)")
    ap.add_argument("--dtypes", default="uint16,int16,uint8,float32")
    ap.add_argument("--window", choices=("off", "on", "both"),
                    default="both")
    ap.add_argument("--no-single", action="store_true",
                    help="skip the [1,H,W] single-image program")
    ap.add_argument("--tuning", action="store_true",
                    help="also prime the tuning surface (autotune sweep "
                         "per issue set + GenAI tool programs)")
    ap.add_argument("--spatial", action="store_true",
                    help="also prime the huge-slice --spatial programs "
                         "on this host's device topology")
    ap.add_argument("--issues", default="noise+low_contrast,blur",
                    help="comma-separated issue sets for --tuning, "
                         "'+'-joined within a set")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    modes = {"off": (False,), "on": (True,), "both": (False, True)}
    n = prime(
        _parse_shapes(args.shapes),
        chunk=args.chunk,
        dtypes=tuple(t.strip() for t in args.dtypes.split(",") if t.strip()),
        window_modes=modes[args.window],
        single=not args.no_single,
    )
    if args.tuning:
        n += prime_tuning(
            _parse_shapes(args.shapes),
            issue_sets=tuple(
                tuple(i.strip() for i in part.split("+") if i.strip())
                for part in args.issues.split(",") if part.strip()),
        )
    if args.spatial:
        n += prime_spatial(_parse_shapes(args.shapes))
    logger.info("primed %d programs", n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
