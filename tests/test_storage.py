"""SQLite DAO tests (ref tests/test_storage.py): temp-file DB, save/get
round-trip with JSON re-parse, list ordering, status lifecycle, chat
ordering — plus WAL concurrency and the explicit-run-id contract."""

from __future__ import annotations

import threading

import pytest


@pytest.fixture(autouse=True)
def fresh_db(tmp_path, monkeypatch):
    monkeypatch.setenv("MDX_DB_PATH", str(tmp_path / "t.db"))
    from mdx.pipeline import storage

    storage.init_db()
    yield storage


def _save(storage, run_id="abc123def456", **over):
    kw = dict(
        run_id=run_id, input_filename="scan.dcm",
        metadata_summary={"Modality": "CT"}, issues=["noise", "blur"],
        metrics_before={"sigma": 0.1}, metrics_after={"sigma": 0.05},
        plan_json='{"recommended_ops": []}',
        validation={"ssim": 0.95, "passes": True},
        applied_ops=["denoise"], explainability={"detected_issues": "x"},
        report_path="/tmp/r.md", before_after_path="/tmp/b.png",
        agent_logs=[{"phase": "planner", "event": "phase_start"}],
        status="completed", genai_model="gpt-5-mini", genai_llm_calls=3)
    kw.update(over)
    storage.save_run(**kw)
    return kw


class TestRuns:
    def test_run_id_format(self, fresh_db):
        rid = fresh_db.generate_run_id()
        assert len(rid) == 12 and int(rid, 16) >= 0

    def test_save_get_round_trip(self, fresh_db):
        _save(fresh_db)
        run = fresh_db.get_run("abc123def456")
        assert run["issues"] == ["noise", "blur"]
        assert run["metrics_before"]["sigma"] == 0.1
        assert run["validation"]["passes"] is True
        assert run["agent_logs"][0]["phase"] == "planner"
        assert run["genai_llm_calls"] == 3

    def test_get_missing(self, fresh_db):
        assert fresh_db.get_run("nope") is None

    def test_insert_replace(self, fresh_db):
        _save(fresh_db)
        _save(fresh_db, issues=["blur"])
        assert fresh_db.get_run("abc123def456")["issues"] == ["blur"]
        assert len(fresh_db.list_runs()) == 1

    def test_list_runs_order_and_paging(self, fresh_db):
        import time

        for i in range(5):
            _save(fresh_db, run_id=f"{i:012d}")
            time.sleep(0.01)
        runs = fresh_db.list_runs(limit=3)
        assert len(runs) == 3
        assert runs[0]["run_id"] == "000000000004"  # newest first
        offset = fresh_db.list_runs(limit=3, offset=3)
        assert len(offset) == 2

    def test_status_lifecycle(self, fresh_db):
        fresh_db.insert_pending_run("run000000001", "x.dcm")
        st = fresh_db.get_run_status("run000000001")
        assert st["status"] == "pending"
        fresh_db.update_run_status("run000000001", "running")
        assert fresh_db.get_run("run000000001")["status"] == "running"
        fresh_db.update_run_status("run000000001", "error", error="boom")
        row = fresh_db.get_run_status("run000000001")
        assert row["status"] == "error" and row["error"] == "boom"

    def test_concurrent_writers(self, fresh_db):
        """WAL mode + connection-per-call must tolerate parallel saves."""
        errors = []

        def work(i):
            try:
                for j in range(10):
                    _save(fresh_db, run_id=f"{i:06d}{j:06d}")
            except Exception as exc:
                errors.append(exc)

        threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert len(fresh_db.list_runs(limit=100)) == 40


class TestChat:
    def test_chat_ordering(self, fresh_db):
        _save(fresh_db)
        fresh_db.save_chat_message("abc123def456", "user", "q1")
        fresh_db.save_chat_message("abc123def456", "assistant", "a1")
        fresh_db.save_chat_message("abc123def456", "user", "q2")
        hist = fresh_db.get_chat_history("abc123def456")
        assert [m["content"] for m in hist] == ["q1", "a1", "q2"]

    def test_chat_scoped_per_run(self, fresh_db):
        _save(fresh_db, run_id="aaaaaaaaaaaa")
        _save(fresh_db, run_id="bbbbbbbbbbbb")
        fresh_db.save_chat_message("aaaaaaaaaaaa", "user", "hello a")
        assert fresh_db.get_chat_history("bbbbbbbbbbbb") == []


class TestOrphanRecovery:
    def test_mark_orphaned_runs(self, fresh_db):
        fresh_db.insert_pending_run("aaaaaaaaaaa1", "x.dcm")
        fresh_db.insert_pending_run("aaaaaaaaaaa2", "y.dcm")
        fresh_db.update_run_status("aaaaaaaaaaa2", "running")
        _save(fresh_db, run_id="aaaaaaaaaaa3")  # completed — untouched
        repaired = fresh_db.mark_orphaned_runs()
        assert repaired == 2
        assert fresh_db.get_run_status("aaaaaaaaaaa1")["status"] == "error"
        assert "orphaned" in fresh_db.get_run_status("aaaaaaaaaaa2")["error"]
        assert fresh_db.get_run("aaaaaaaaaaa3")["status"] == "completed"
