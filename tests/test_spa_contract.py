"""SPA ↔ backend contract: every path the React client requests must
resolve in the JSON API's route table (ref frontend/src/api/client.ts:8-144
against backend/app.py:59-242; here frontend/src/api/client.ts against
mdx/serve/api.py).

The SPA itself is typechecked/built by the CI node job; this test catches
route drift from the Python side, where node is not available.
"""

from __future__ import annotations

import os
import re

import pytest

from mdx.serve.api import create_app

_CLIENT_TS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "frontend", "src", "api", "client.ts")

# /api/... literals inside quotes or template strings; ${expr} → placeholder
_PATH_RE = re.compile(r"/api/[A-Za-z0-9_/${}.]+")


def _client_paths():
    with open(_CLIENT_TS, encoding="utf-8") as f:
        src = f.read()
    paths = set()
    for m in _PATH_RE.finditer(src):
        p = re.sub(r"\$\{[^}]*\}", "abc123def456", m.group(0)).rstrip("/")
        paths.add(p)
    assert paths, "no /api paths found in client.ts — regex drift?"
    return sorted(paths)


@pytest.fixture(scope="module")
def route_table():
    app = create_app()
    return app._routes


@pytest.mark.parametrize("path", _client_paths())
def test_client_path_has_route(path, route_table):
    assert any(regex.match(path) for regex, _methods, _fn in route_table), (
        f"client.ts requests {path!r} but no mdx/serve/api.py route "
        f"matches it")


def test_client_covers_every_data_route(route_table):
    """Inverse direction: each non-static JSON route is reachable from the
    SPA (upload/run/runs/status/report/before_after/chat/logs)."""
    client = "\n".join(_client_paths())
    wanted = ["upload", "run", "runs", "status", "report", "before_after",
              "chat", "logs"]
    for frag in wanted:
        assert frag in client, f"SPA never requests a '{frag}' route"
