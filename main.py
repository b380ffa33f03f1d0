"""mdx CLI — TPU-native medical imaging QA (same flag surface as the
reference CLI, ref main.py:19-67: --input, --output, --no-show, --genai,
--model, --max-iters, --plan-only, --no-redact, --verbose, plus the
mdx-only --batch / --resume / --autotune / --window for whole-series and
directory runs on the device mesh, and --spatial for sharding one very
large slice across all chips).
"""

from __future__ import annotations

import argparse
import logging
import os

# Load .env before anything reads the environment (ref main.py:7-11 calls
# load_dotenv() first); importing mdx.serve.config runs its built-in loader.
import mdx.serve.config  # noqa: F401

logger = logging.getLogger("mdx")

_DEFAULT_MODEL = os.environ.get("OPENAI_MODEL", "gpt-5-mini")


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        prog="mdx",
        description="TPU-native Multi-Agent Medical Imaging Quality "
                    "Assurance (DICOM QA)")
    parser.add_argument("--input", required=True,
                        help="Path to a DICOM file (or, with --batch, a "
                             "directory / multi-frame series)")
    parser.add_argument("--output", default="outputs",
                        help="Output directory for report and visuals "
                             "(default: outputs)")
    parser.add_argument("--no-show", action="store_true",
                        help="Do not display a matplotlib window "
                             "(still saves figures)")
    parser.add_argument("--genai", action="store_true",
                        help="Enable GenAI agentic mode "
                             "(requires OPENAI_API_KEY)")
    parser.add_argument("--model", default=_DEFAULT_MODEL,
                        help=f"LLM model for GenAI agents "
                             f"(default: {_DEFAULT_MODEL})")
    parser.add_argument("--max-iters", type=int, default=4,
                        help="Max tuning iterations for the GenAI "
                             "TuningAgent (default: 4)")
    parser.add_argument("--plan-only", action="store_true",
                        help="GenAI generates the plan JSON but does not "
                             "execute enhancement")
    parser.add_argument("--no-redact", action="store_true",
                        help="Disable metadata redaction "
                             "(default: redact enabled)")
    parser.add_argument("--verbose", action="store_true",
                        help="Enable verbose / debug logging")
    parser.add_argument("--batch", action="store_true",
                        help="mdx extension: QA every frame of a series / "
                             "every DICOM in a directory, sharded across "
                             "the device mesh")
    parser.add_argument("--resume", action="store_true",
                        help="mdx extension: with --batch, skip frames that "
                             "already have a completed run (restart a "
                             "crashed batch at slice granularity)")
    parser.add_argument("--autotune", action="store_true",
                        help="mdx extension: LLM-free tuning — sweep a "
                             "candidate parameter grid in one on-device "
                             "program and apply the best plan")
    parser.add_argument("--window", action="store_true",
                        help="mdx extension: apply each sample's stored "
                             "DICOM VOI window before QA (mixed-modality "
                             "streams)")
    parser.add_argument("--tv-mode", choices=("ref", "fast"), default=None,
                        help="mdx extension: TV-denoise solve mode — 'ref' "
                             "(reference parity, default) or 'fast' (opt-in "
                             "relaxed-parity iteration cap; measured "
                             "speed/quality curve in docs/PERF.md). Sets "
                             "MDX_TV_MODE for the process")
    parser.add_argument("--spatial", action="store_true",
                        help="mdx extension: shard ONE very large slice "
                             "spatially across all chips (2-D row×col "
                             "tiles when extents allow, else 1-D row "
                             "blocks) and run the halo-local QA chain")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s [%(levelname)s] %(name)s: %(message)s")

    if args.no_show:
        import matplotlib
        matplotlib.use("Agg")

    if args.no_redact:
        os.environ["MDX_NO_REDACT"] = "1"

    if args.tv_mode:
        os.environ["MDX_TV_MODE"] = args.tv_mode

    try:
        if args.spatial:
            from mdx.pipeline.spatial_runner import run_pipeline_spatial

            context = run_pipeline_spatial(
                input_path=args.input, output_dir=args.output,
                save_artifacts=True, window=args.window,
                autotune=args.autotune)
        elif args.batch:
            from mdx.pipeline.batch_runner import run_pipeline_batch

            context = run_pipeline_batch(
                input_path=args.input, output_dir=args.output,
                save_artifacts=True, window=args.window,
                autotune=args.autotune, resume=args.resume)
        else:
            from mdx.pipeline.runner import run_pipeline

            context = run_pipeline(
                input_path=args.input, output_dir=args.output,
                genai=args.genai, model=args.model,
                max_iters=args.max_iters, plan_only=args.plan_only,
                save_artifacts=True, no_show=args.no_show,
                autotune=args.autotune)
    except RuntimeError as exc:
        print(f"ERROR: {exc}")
        return 1
    except Exception as exc:
        print(f"Error: {exc}")
        logger.exception("Pipeline failed")
        return 1

    if context.get("plan_only") and context.get("plan"):
        print("\n=== GenAI Enhancement Plan (JSON) ===\n")
        print(context["plan"].model_dump_json(indent=2))
        if context.get("stop_reason"):
            print(f"\nStop reason: {context['stop_reason']}")
        return 0

    report_md = context.get("report_md", "")
    if report_md:
        print(report_md)

    if context.get("genai_fell_back"):
        print(f"\nWARNING: GenAI failed ({context.get('genai_error')}). "
              f"Used deterministic fallback.")

    if not args.no_show:
        try:
            import matplotlib.pyplot as plt

            plt.show()
        except Exception:
            pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
