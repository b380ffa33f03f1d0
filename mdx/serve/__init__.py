"""Serving layer (L5): JSON API, async run executor, config, CLI support.

The reference serves its 12 JSON routes with Flask + flask-cors
(ref backend/app.py).  This package implements the same HTTP surface on a
small from-scratch WSGI router (:mod:`mdx.serve.wsgi` — no third-party web
framework), an explicit-run-id thread executor (:mod:`mdx.serve.executor`,
designing out the reference's process-global run-id monkey-patch race,
ref backend/pipeline_runner.py:75-89), and env-driven configuration
(:mod:`mdx.serve.config`).
"""

from mdx.serve.api import create_app

__all__ = ["create_app"]
