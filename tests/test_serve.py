"""HTTP API surface tests (ref tests/test_flask.py — but covering the JSON
backend, which the reference left untested, SURVEY.md §4).

The WSGI app is exercised in-process with a minimal test client — no
socket, no server thread; uploads use real multipart bodies and runs use
the real executor + fused device programs on the CPU mesh.
"""

from __future__ import annotations

import io
import json
import os
import time

import numpy as np
import pytest


@pytest.fixture()
def client(tmp_path, monkeypatch):
    monkeypatch.setenv("MDX_DB_PATH", str(tmp_path / "mdx.db"))
    monkeypatch.setenv("UPLOAD_DIR", str(tmp_path / "uploads"))
    monkeypatch.setenv("OUTPUT_DIR", str(tmp_path / "outputs"))

    import importlib

    from mdx.pipeline import storage
    from mdx.serve import api, config

    importlib.reload(config)
    importlib.reload(api)
    app = api.create_app()
    return _Client(app)


class _Client:
    def __init__(self, app):
        self.app = app

    def request(self, method, path, body=b"", content_type="application/json"):
        status_headers = {}

        def start_response(status, headers):
            status_headers["status"] = int(status.split()[0])
            status_headers["headers"] = dict(headers)

        environ = {
            "REQUEST_METHOD": method,
            "PATH_INFO": path.split("?")[0],
            "QUERY_STRING": path.partition("?")[2],
            "CONTENT_LENGTH": str(len(body)),
            "CONTENT_TYPE": content_type,
            "wsgi.input": io.BytesIO(body),
        }
        chunks = self.app(environ, start_response)
        payload = b"".join(chunks)
        return status_headers["status"], status_headers["headers"], payload

    def get_json(self, path):
        s, _, b = self.request("GET", path)
        return s, json.loads(b)

    def post_json(self, path, data):
        s, _, b = self.request("POST", path, json.dumps(data).encode())
        return s, json.loads(b)

    def upload(self, path, field, filename, content):
        boundary = "mdxboundary123"
        body = (
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="{field}"; '
            f'filename="{filename}"\r\n'
            f"Content-Type: application/octet-stream\r\n\r\n"
        ).encode() + content + f"\r\n--{boundary}--\r\n".encode()
        s, _, b = self.request(
            "POST", path, body,
            content_type=f"multipart/form-data; boundary={boundary}")
        return s, json.loads(b)


def _synthetic_dcm(tmp_path, kind="noisy"):
    from mdx.io.dicom_write import write_synthetic_dicom

    p = str(tmp_path / f"{kind}.dcm")
    write_synthetic_dicom(p, kind=kind, size=64)
    with open(p, "rb") as f:
        return f.read()


class TestRoutes:
    def test_index(self, client):
        s, data = client.get_json("/")
        assert s == 200
        assert data["status"] == "running"
        assert "upload" in data["endpoints"]

    def test_404(self, client):
        s, data = client.get_json("/api/nope")
        assert s == 404

    def test_upload_no_file(self, client):
        s, data = client.post_json("/api/upload", {})
        assert s == 400

    def test_upload_bad_extension(self, client, tmp_path):
        s, data = client.upload("/api/upload", "file", "evil.exe", b"xx")
        assert s == 400
        assert "Unsupported" in data["error"]

    def test_upload_ok(self, client, tmp_path):
        content = _synthetic_dcm(tmp_path)
        s, data = client.upload("/api/upload", "file", "scan.dcm", content)
        assert s == 200
        assert len(data["file_id"]) == 12
        assert data["stored_name"].endswith("scan.dcm")

    def test_run_requires_file_id(self, client):
        s, data = client.post_json("/api/run", {})
        assert s == 400

    def test_run_unknown_file(self, client):
        s, data = client.post_json("/api/run", {"file_id": "nope"})
        assert s == 404

    def test_runs_list_empty(self, client):
        s, data = client.get_json("/api/runs")
        assert s == 200 and data["runs"] == []

    def test_run_detail_404(self, client):
        s, _ = client.get_json("/api/runs/deadbeef")
        assert s == 404

    def test_status_404(self, client):
        s, _ = client.get_json("/api/runs/deadbeef/status")
        assert s == 404

    def test_chat_validation(self, client):
        s, _ = client.post_json("/api/runs/x/chat", {})
        assert s == 400
        s, _ = client.post_json("/api/runs/x/chat", {"message": "y" * 2001})
        assert s == 400

    def test_file_serving_traversal_blocked(self, client):
        s, _, _ = client.request("GET", "/api/files/outputs/../secrets")
        assert s == 404


class TestEndToEndRun:
    def test_upload_run_poll_report(self, client, tmp_path):
        """Full web-run flow (SURVEY.md §3.3): upload → run → poll → detail."""
        content = _synthetic_dcm(tmp_path, "noisy")
        s, up = client.upload("/api/upload", "file", "noisy.dcm", content)
        assert s == 200

        s, run = client.post_json("/api/run", {"file_id": up["file_id"]})
        assert s == 202
        run_id = run["run_id"]

        deadline = time.time() + 120
        status = "pending"
        while time.time() < deadline:
            s, st = client.get_json(f"/api/runs/{run_id}/status")
            assert s == 200
            status = st["status"]
            if status in ("completed", "error"):
                break
            time.sleep(0.5)
        assert status == "completed"

        s, detail = client.get_json(f"/api/runs/{run_id}")
        assert s == 200
        assert detail["run_id"] == run_id
        assert "noise" in detail["issues"]
        assert detail["chat_history"] == []

        s, rep = client.get_json(f"/api/runs/{run_id}/report")
        assert s == 200 and rep["markdown"]

        s, logs = client.get_json(f"/api/runs/{run_id}/logs")
        assert s == 200

        s, lst = client.get_json("/api/runs")
        assert any(r["run_id"] == run_id for r in lst["runs"])


class TestErrorPaths:
    def test_corrupt_dicom_run_errors(self, client, tmp_path):
        """A run on an undecodable file must end status=error with the
        message persisted (executor failure detection, SURVEY.md §5)."""
        s, up = client.upload("/api/upload", "file", "bad.dcm",
                              b"not a dicom at all")
        assert s == 200
        s, run = client.post_json("/api/run", {"file_id": up["file_id"]})
        assert s == 202
        run_id = run["run_id"]
        deadline = time.time() + 60
        status = "pending"
        while time.time() < deadline:
            s, st = client.get_json(f"/api/runs/{run_id}/status")
            status = st["status"]
            if status in ("completed", "error"):
                break
            time.sleep(0.3)
        assert status == "error"
        from mdx.pipeline import storage

        row = storage.get_run_status(run_id)
        assert row["error"]


class TestMultipartBinaryIntegrity:
    def test_trailing_crlf_bytes_preserved(self, client, tmp_path):
        """Regression: binary payloads ending in 0x0D/0x0A must not be
        truncated by the multipart parser (only the boundary's own CRLF
        is encapsulation)."""
        payload = b"\x00\x01BINARY" + b"\r\n\r\n\n\r"
        s, up = client.upload("/api/upload", "file", "t.dcm", payload)
        assert s == 200
        from mdx.serve import config

        stored = os.path.join(config.UPLOAD_DIR, up["stored_name"])
        with open(stored, "rb") as f:
            assert f.read() == payload

    def test_leading_crlf_preserved(self, client):
        payload = b"\r\nleading" + bytes(range(32)) + b"\r"
        s, up = client.upload("/api/upload", "file", "u.dcm", payload)
        from mdx.serve import config

        with open(os.path.join(config.UPLOAD_DIR, up["stored_name"]),
                  "rb") as f:
            assert f.read() == payload
