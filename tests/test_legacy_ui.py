"""Legacy server-rendered UI smoke tests (ref tests/test_flask.py:
upload page 200, reports 200, 404, no-file post — plus a full synchronous
run and CSRF rejection, which the reference never covered)."""

from __future__ import annotations

import io
import json

import pytest


@pytest.fixture()
def client(tmp_path, monkeypatch):
    monkeypatch.setenv("MDX_DB_PATH", str(tmp_path / "mdx.db"))
    monkeypatch.setenv("UPLOAD_DIR", str(tmp_path / "uploads"))
    monkeypatch.setenv("OUTPUT_DIR", str(tmp_path / "outputs"))
    import importlib

    from mdx.serve import config, legacy

    importlib.reload(config)
    importlib.reload(legacy)
    return _Client(legacy.create_legacy_app())


class _Client:
    def __init__(self, app):
        self.app = app
        self.cookies: dict[str, str] = {}

    def request(self, method, path, body=b"", content_type="text/html"):
        captured = {}

        def start_response(status, headers):
            captured["status"] = int(status.split()[0])
            captured["headers"] = dict(headers)
            for k, v in headers:
                if k.lower() == "set-cookie":
                    name, _, rest = v.partition("=")
                    self.cookies[name] = rest.split(";")[0]

        environ = {
            "REQUEST_METHOD": method,
            "PATH_INFO": path,
            "QUERY_STRING": "",
            "CONTENT_LENGTH": str(len(body)),
            "CONTENT_TYPE": content_type,
            "wsgi.input": io.BytesIO(body),
        }
        if self.cookies:
            environ["HTTP_COOKIE"] = "; ".join(
                f"{k}={v}" for k, v in self.cookies.items())
        payload = b"".join(self.app(environ, start_response))
        return captured["status"], captured["headers"], payload

    def get(self, path):
        return self.request("GET", path)

    def post_multipart(self, path, fields=None, files=None):
        boundary = "legacyboundary1"
        parts = []
        for k, v in (fields or {}).items():
            parts.append(
                f'--{boundary}\r\nContent-Disposition: form-data; '
                f'name="{k}"\r\n\r\n{v}\r\n'.encode())
        for k, (fname, content) in (files or {}).items():
            parts.append(
                f'--{boundary}\r\nContent-Disposition: form-data; '
                f'name="{k}"; filename="{fname}"\r\n\r\n'.encode()
                + content + b"\r\n")
        body = b"".join(parts) + f"--{boundary}--\r\n".encode()
        return self.request(
            "POST", path, body,
            f"multipart/form-data; boundary={boundary}")


def _csrf(client) -> str:
    _, _, body = client.get("/")
    marker = b'name="csrf_token" value="'
    i = body.index(marker) + len(marker)
    return body[i:body.index(b'"', i)].decode()


class TestPages:
    def test_upload_page(self, client):
        s, _, body = client.get("/")
        assert s == 200 and b"DICOM" in body and b"csrf_token" in body

    def test_reports_empty(self, client):
        s, _, body = client.get("/reports")
        assert s == 200 and b"No runs yet" in body

    def test_unknown_run_404(self, client):
        s, _, _ = client.get("/reports/deadbeef")
        assert s == 404

    def test_unknown_route_404(self, client):
        s, _, _ = client.get("/nope")
        assert s == 404

    def test_run_without_file(self, client):
        token = _csrf(client)
        s, _, body = client.post_multipart("/run",
                                           fields={"csrf_token": token})
        assert s == 400 and b"No file selected" in body

    def test_run_bad_csrf(self, client):
        s, _, body = client.post_multipart(
            "/run", fields={"csrf_token": "bogus.bogus"},
            files={"file": ("a.dcm", b"xx")})
        assert s == 400 and b"CSRF" in body

    def test_run_valid_token_but_no_cookie(self, client):
        """A signed token alone must NOT pass — it has to match the
        double-submit cookie (cross-origin token exfiltration defence)."""
        token = _csrf(client)
        client.cookies.clear()
        s, _, body = client.post_multipart(
            "/run", fields={"csrf_token": token},
            files={"file": ("a.dcm", b"xx")})
        assert s == 400 and b"CSRF" in body

    def test_static_served(self, client):
        s, headers, body = client.get("/static/style.css")
        assert s == 200 and b"topbar" in body

    def test_chat_validation(self, client):
        s, _, body = client.request(
            "POST", "/api/chat", json.dumps({}).encode(),
            "application/json")
        assert s == 400


class TestSynchronousRun:
    def test_full_run_flow(self, client, tmp_path):
        from mdx.io.dicom_write import write_synthetic_dicom

        p = tmp_path / "n.dcm"
        write_synthetic_dicom(str(p), kind="noisy", size=64)
        token = _csrf(client)
        s, headers, _ = client.post_multipart(
            "/run", fields={"csrf_token": token},
            files={"file": ("n.dcm", p.read_bytes())})
        assert s == 302
        loc = headers["Location"]
        assert loc.startswith("/result/")

        s, _, body = client.get(loc)
        assert s == 200 and b"noise" in body

        run_id = loc.split("/")[-1]
        s, _, body = client.get(f"/reports/{run_id}")
        assert s == 200 and b"chat" in body

        s, _, body = client.get(f"/reports/{run_id}/download")
        assert s == 200 and b"#" in body

        s, _, body = client.get(f"/logs/{run_id}")
        assert s == 200


class TestSecurityHardening:
    def test_report_html_neutralises_raw_html(self, client, tmp_path):
        """Stored-XSS regression: HTML smuggled through DICOM metadata must
        come out inert in the rendered report."""
        from mdx.io.dicom_write import write_synthetic_dicom

        p = tmp_path / "x.dcm"
        write_synthetic_dicom(
            str(p), kind="noisy", size=64,
            study_description='<img src=x onerror=alert(1)>')
        token = _csrf(client)
        s, headers, _ = client.post_multipart(
            "/run", fields={"csrf_token": token},
            files={"file": ("x.dcm", p.read_bytes())})
        assert s == 302
        s, _, body = client.get(headers["Location"])
        assert b"<img src=x onerror" not in body
        assert b"&lt;img" in body  # escaped, still visible as text

    def test_chat_requires_csrf(self, client, tmp_path):
        s, _, body = client.request(
            "POST", "/api/chat",
            json.dumps({"run_id": "x", "message": "hi"}).encode(),
            "application/json")
        assert s == 400 and b"CSRF" in body

    def test_page_view_does_not_rotate_token(self, client):
        t1 = _csrf(client)
        client.get("/reports")       # another page view
        t2 = _csrf(client)
        assert t1 == t2              # open upload forms stay valid

    def test_framework_errors_render_html(self, client):
        s, headers, body = client.get("/definitely/not/here")
        assert s == 404
        assert headers["Content-Type"].startswith("text/html")
        assert b"Something went wrong" in body

    def test_bad_max_iters_is_400(self, client, tmp_path):
        from mdx.io.dicom_write import write_synthetic_dicom

        p = tmp_path / "n.dcm"
        write_synthetic_dicom(str(p), kind="noisy", size=64)
        token = _csrf(client)
        s, _, body = client.post_multipart(
            "/run", fields={"csrf_token": token, "max_iters": "abc"},
            files={"file": ("n.dcm", p.read_bytes())})
        assert s == 400 and b"max_iters" in body
