"""GenAI orchestration tests with a scripted fake LLM transport.

The reference left every LLM-dependent path untested (SURVEY.md §4 "the
untested seam").  Here the from-scratch client's injectable transport
plays back scripted completions, so the full 5-phase orchestration — tool
dispatch into the fused device programs, clamping, cost guard, fallbacks,
iteration records — runs for real with zero network.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from mdx.genai import client as llm
from mdx.genai import tools as T
from mdx.genai.orchestrator import (
    _MAX_LLM_CALLS,
    GenAIPipelineResult,
    run_genai_pipeline,
    sanitise_metadata,
)
from mdx.pipeline.schemas import EnhancementPlan


@pytest.fixture(autouse=True)
def _clean_transport():
    yield
    llm.set_transport(None)
    T.clear_image_store()


def _msg(content=None, tool_calls=None):
    return {"choices": [{"message": {"content": content,
                                     "tool_calls": tool_calls or []}}]}


def _plan_json(**over):
    plan = {
        "recommended_ops": ["denoise", "clahe"],
        "params": {"clahe_clip_limit": 0.02, "denoise_mode": "soft"},
        "risk_warnings": [], "rationale": "test", "safety": "",
        "stop_reason": None,
    }
    plan.update(over)
    return json.dumps(plan)


class ScriptedTransport:
    """Plays back a list of responses; records every request."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.requests = []

    def __call__(self, model, payload):
        self.requests.append((model, payload))
        if not self.responses:
            raise llm.LLMError("script exhausted")
        r = self.responses.pop(0)
        if isinstance(r, Exception):
            raise r
        return r


class TestClient:
    def test_temperature_omitted_for_reasoning_models(self):
        tr = ScriptedTransport([_msg("hi"), _msg("hi")])
        llm.set_transport(tr)
        llm.chat_completion("gpt-4o", [{"role": "user", "content": "x"}])
        llm.chat_completion("o4-mini", [{"role": "user", "content": "x"}])
        assert "temperature" in tr.requests[0][1]
        assert "temperature" not in tr.requests[1][1]

    def test_extract_json_variants(self):
        assert llm.extract_json('{"a": 1}') == {"a": 1}
        assert llm.extract_json('```json\n{"a": 1}\n```') == {"a": 1}
        assert llm.extract_json('Best plan:\n{"a": {"b": 2}} done') == \
            {"a": {"b": 2}}
        with pytest.raises(llm.LLMError):
            llm.extract_json("no json here")


class TestTools:
    def test_image_store_roundtrip(self, noisy_image):
        key = T.register_image(noisy_image, "original")
        np.testing.assert_array_equal(T.get_image(key), noisy_image)
        T.clear_image_store()
        with pytest.raises(KeyError):
            T.get_image(key)

    def test_get_metrics(self, noisy_image):
        T.register_image(noisy_image, "original")
        out = json.loads(T.tool_get_metrics("original"))
        assert len(out) == 16 and out["sigma"] > 0.08

    def test_get_metrics_missing_image(self):
        out = json.loads(T.tool_get_metrics("nope"))
        assert "error" in out

    def test_apply_validate_score_chain(self, noisy_image):
        T.register_image(noisy_image, "original")
        out = json.loads(T.tool_apply_enhancement("original", _plan_json()))
        assert "enhanced_image_id" in out
        assert "denoise" in out["applied_ops"]
        val = json.loads(T.tool_validate("original",
                                         out["enhanced_image_id"]))
        assert 0.0 < val["ssim"] <= 1.0
        score = json.loads(T.tool_score_plan(json.dumps(val)))
        assert isinstance(score["score"], float)

    def test_absurd_params_clamped(self, noisy_image):
        """Clamping of absurd params doesn't crash (ref
        tests/test_pipeline.py:54-66)."""
        T.register_image(noisy_image, "original")
        crazy = _plan_json(params={
            "clahe_clip_limit": 99.0, "gamma": -5.0, "unsharp_amount": 1e9,
            "denoise_mode": "bogus"})
        out = json.loads(T.tool_apply_enhancement("original", crazy))
        assert "enhanced_image_id" in out

    def test_clamp_plan_bounds(self):
        plan = EnhancementPlan.model_validate_json(_plan_json(params={
            "clahe_clip_limit": 1.0, "unsharp_amount": 100.0}))
        c = T.clamp_plan(plan)
        assert c.params.clahe_clip_limit <= 0.08
        assert c.params.unsharp_amount <= 2.5
        assert c.params.denoise_mode in ("soft", "hard")


class TestSanitise:
    def test_metadata_whitelist(self):
        meta = {"Modality": "CT", "PatientName": "REDACT ME",
                "BodyPartExamined": "CHEST", "StudyDescription": "x" * 300}
        out = sanitise_metadata(meta)
        assert "PatientName" not in out
        assert out["Modality"] == "CT"
        assert len(out["StudyDescription"]) == 100

    def test_control_chars_stripped(self):
        out = sanitise_metadata({"Modality": "C\x00T\x1f"})
        assert out["Modality"] == "CT"

    def test_no_redact_bypass_still_strips_control_chars(self, monkeypatch):
        monkeypatch.setenv("MDX_NO_REDACT", "1")
        out = sanitise_metadata(
            {"PatientName": "Jo\x00hn\x1b", "Modality": "C\x01T"})
        # whitelist is bypassed ...
        assert out["PatientName"] == "John"
        # ... but the control-char strip is unconditional
        assert out["Modality"] == "CT"


class TestOrchestration:
    def _run(self, image, transport, **kw):
        llm.set_transport(transport)
        return run_genai_pipeline(
            image=image, metadata={"Modality": "CT"}, issues=["noise"],
            metrics={"sigma": 0.12, "std": 0.2}, model="gpt-5-mini",
            **kw)

    def test_happy_path(self, noisy_image):
        tr = ScriptedTransport([
            _msg(_plan_json()),                       # planner
            _msg(_plan_json(recommended_ops=["denoise"])),  # tuning final
            _msg(json.dumps({                          # explainability
                "detected_issues": "noise found",
                "corrective_measures": "denoise",
                "enhancement_applied": "wavelet",
                "validation_outcome": "ok",
                "limitations": "not for diagnosis",
                "image_summary": "CT with noise",
                "actionable_suggestions": ["a"],
                "next_steps": ["b"]})),
        ])
        r = self._run(noisy_image, tr)
        assert not r.fell_back_to_deterministic
        assert r.best_plan.normalized_ops() == ["denoise"]
        assert r.enhanced_image is not None
        assert r.explainability.detected_issues == "noise found"
        assert r.llm_call_count == 3
        phases = [t["phase"] for t in r.agent_traces]
        assert "planner" in phases and "tuning" in phases

    def test_planner_failure_falls_back(self, noisy_image):
        tr = ScriptedTransport([llm.LLMError("boom"), llm.LLMError("boom2")])
        r = self._run(noisy_image, tr)
        assert r.fell_back_to_deterministic
        assert "planner" in r.error

    def test_model_fallback_on_first_failure(self, noisy_image):
        tr = ScriptedTransport([
            llm.LLMError("primary down"),             # planner on primary
            _msg(_plan_json(stop_reason="image is fine",
                            recommended_ops=[])),     # planner on fallback
        ])
        r = self._run(noisy_image, tr)
        assert not r.fell_back_to_deterministic
        assert r.model_name == "o4-mini"
        assert tr.requests[1][0] == "o4-mini"

    def test_stop_reason_short_circuit(self, noisy_image):
        tr = ScriptedTransport([
            _msg(_plan_json(stop_reason="already good",
                            recommended_ops=[]))])
        r = self._run(noisy_image, tr)
        np.testing.assert_array_equal(r.enhanced_image, noisy_image)
        assert r.explainability is not None
        assert "already good" in r.explainability.detected_issues

    def test_plan_only(self, noisy_image):
        tr = ScriptedTransport([_msg(_plan_json())])
        r = self._run(noisy_image, tr, plan_only=True)
        assert r.plan_only and r.plan is not None

    def test_tuning_failure_keeps_seed_plan(self, noisy_image):
        tr = ScriptedTransport([
            _msg(_plan_json()),                       # planner ok
            llm.LLMError("tuning down"),              # tuning primary
            llm.LLMError("tuning fallback down"),     # tuning fallback
            llm.LLMError("expl down"),                # explainability
            llm.LLMError("expl fallback down"),
        ])
        r = self._run(noisy_image, tr)
        assert not r.fell_back_to_deterministic
        assert r.best_plan.normalized_ops() == ["denoise", "clahe"]
        # template explainability fallback kicked in
        assert "diagnosis" in r.explainability.limitations

    def test_tuning_tool_loop_populates_iterations(self, noisy_image):
        """The tuning agent calls apply→validate→score, then answers; the
        orchestrator must materialise IterationRecords (fix-forward of the
        reference's always-empty iterations table, SURVEY.md §2.3)."""
        apply_call = {"id": "c1", "function": {
            "name": "tool_apply_enhancement",
            "arguments": json.dumps({"image_id": "original",
                                     "plan_json": _plan_json()})}}
        score_call = {"id": "c2", "function": {
            "name": "tool_score_plan",
            "arguments": json.dumps({"validation_json": json.dumps({
                "contrast_gain": 0.1, "sharpness_gain": 0.1,
                "noise_change": -0.1, "niqe_after": 1.0, "niqe_before": 1.2,
                "passes": True, "edge_ratio": 0.9, "entropy_change": 0.0,
                "snr_change": 0.5, "histogram_spread_change": 0.0,
                "local_contrast_change": 0.0,
                "gradient_strength_change": 0.0,
                "gradient_entropy_change": 0.0})})}}
        tr = ScriptedTransport([
            _msg(_plan_json()),                           # planner
            _msg(None, [apply_call]),                     # tuning turn 1
            _msg(None, [score_call]),                     # tuning turn 2
            _msg(_plan_json()),                           # tuning final
            llm.LLMError("no expl"), llm.LLMError("no expl fb"),
        ])
        r = self._run(noisy_image, tr)
        assert len(r.iterations) == 1
        assert r.iterations[0].score > -10
        assert r.iterations[0].chosen

    def test_out_of_order_scoring_stays_attributed(self, noisy_image):
        """A model that applies TWO plans before scoring either (nothing in
        the tool contract forbids it) must still get correctly-paired
        IterationRecords: scores are matched back through the
        enhanced_image_id chain (apply → validate → score), not call
        order.  Here plan B is validated and scored FIRST — a positional
        zip would swap the two scores."""
        plan_a = _plan_json(recommended_ops=["clahe"],
                            params={"clahe_clip_limit": 0.01})
        plan_b = _plan_json(recommended_ops=["clahe", "unsharp"],
                            params={"clahe_clip_limit": 0.04,
                                    "unsharp_amount": 2.5,
                                    "unsharp_radius": 2.0})
        captured = {}

        def transport(model, payload):
            msgs = payload["messages"]
            tool_outs = [json.loads(m["content"]) for m in msgs
                         if m.get("role") == "tool"]
            stage = transport.stage
            transport.stage += 1
            if stage == 0:                      # planner
                return _msg(plan_a)
            if stage == 1:                      # tuning: apply A, apply B
                return _msg(None, [
                    {"id": "a1", "function": {
                        "name": "tool_apply_enhancement",
                        "arguments": json.dumps({"image_id": "original",
                                                 "plan_json": plan_a})}},
                    {"id": "a2", "function": {
                        "name": "tool_apply_enhancement",
                        "arguments": json.dumps({"image_id": "original",
                                                 "plan_json": plan_b})}},
                ])
            if stage == 2:                      # validate B then A
                id_a = tool_outs[0]["enhanced_image_id"]
                id_b = tool_outs[1]["enhanced_image_id"]
                captured["ids"] = (id_a, id_b)
                return _msg(None, [
                    {"id": "v1", "function": {
                        "name": "tool_validate",
                        "arguments": json.dumps({"original_id": "original",
                                                 "enhanced_id": id_b})}},
                    {"id": "v2", "function": {
                        "name": "tool_validate",
                        "arguments": json.dumps({"original_id": "original",
                                                 "enhanced_id": id_a})}},
                ])
            if stage == 3:                      # score B's validation, then A's
                captured["val_b"], captured["val_a"] = (tool_outs[2],
                                                        tool_outs[3])
                return _msg(None, [
                    {"id": "s1", "function": {
                        "name": "tool_score_plan",
                        "arguments": json.dumps({"validation_json":
                                                 json.dumps(tool_outs[2])})}},
                    {"id": "s2", "function": {
                        "name": "tool_score_plan",
                        "arguments": json.dumps({"validation_json":
                                                 json.dumps(tool_outs[3])})}},
                ])
            if stage == 4:                      # tuning final text
                return _msg(plan_b)
            raise llm.LLMError("no explainability")  # expl + fallback

        transport.stage = 0
        r = self._run(noisy_image, transport)
        assert len(r.iterations) == 2
        # records stay in apply order: [0]=A, [1]=B
        assert r.iterations[0].plan.params.clahe_clip_limit == 0.01
        assert r.iterations[1].plan.params.unsharp_amount == 2.5
        score_a = json.loads(T.tool_score_plan(
            json.dumps(captured["val_a"])))["score"]
        score_b = json.loads(T.tool_score_plan(
            json.dumps(captured["val_b"])))["score"]
        assert score_a != score_b  # otherwise the swap would be invisible
        assert r.iterations[0].score == pytest.approx(score_a)
        assert r.iterations[1].score == pytest.approx(score_b)
        # chosen = the scored best, regardless of the final-text plan
        best = 0 if score_a > score_b else 1
        assert [it.chosen for it in r.iterations] == \
            [i == best for i in range(2)]
        # apply-result metrics landed on the records
        assert r.iterations[0].metrics.get("sigma") is not None

    def test_malformed_tool_result_logged_not_swallowed(self, noisy_image):
        """A tool result the iteration observer can't parse must leave a
        trace entry (phase "tuning") naming the exception instead of
        silently dropping the IterationRecord — the observer exists to
        capture exactly that data (VERDICT r3 weak #5)."""
        bad_score_call = {"id": "b1", "function": {
            "name": "tool_score_plan",
            # validation_json is NOT valid JSON: the tool itself returns an
            # error payload and the observer's json.loads raises
            "arguments": json.dumps({"validation_json": "{not json"})}}
        tr = ScriptedTransport([
            _msg(_plan_json()),               # planner
            _msg(None, [bad_score_call]),     # tuning turn 1
            _msg(_plan_json()),               # tuning final
            llm.LLMError("no expl"), llm.LLMError("no expl fb"),
        ])
        r = self._run(noisy_image, tr)
        assert not r.fell_back_to_deterministic   # run survives
        drops = [t for t in r.agent_traces
                 if t["phase"] == "tuning" and
                 "dropped iteration record" in t.get("detail", "")]
        assert len(drops) == 1
        assert "tool_score_plan" in drops[0]["detail"]
        assert "JSONDecodeError" in drops[0]["detail"]

    def test_cost_guard_limits_calls(self, noisy_image, monkeypatch):
        """An agent that never stops calling tools hits the LLM budget."""
        loop_call = {"id": "c", "function": {
            "name": "tool_get_metrics",
            "arguments": json.dumps({"image_id": "original"})}}
        tr = ScriptedTransport([_msg(None, [loop_call])] * 50)
        r = self._run(noisy_image, tr)
        assert r.fell_back_to_deterministic
        assert len(tr.requests) <= _MAX_LLM_CALLS


class TestChat:
    def test_chat_without_llm_uses_stored_summary(self, tmp_path,
                                                  monkeypatch):
        monkeypatch.setenv("MDX_DB_PATH", str(tmp_path / "c.db"))
        monkeypatch.delenv("OPENAI_API_KEY", raising=False)
        from mdx.pipeline import chat, storage
        storage.init_db()
        storage.save_run(
            run_id="r1", input_filename="x.dcm", metadata_summary={},
            issues=["noise"], metrics_before={}, metrics_after={},
            plan_json="", validation={"ssim": 0.91, "psnr": 30.0},
            applied_ops=["denoise"], explainability={}, report_path="",
            before_after_path="", agent_logs=[], status="completed")
        reply = chat.handle_chat("r1", "what happened?")
        assert "noise" in reply and "denoise" in reply
        hist = storage.get_chat_history("r1")
        assert [m["role"] for m in hist] == ["user", "assistant"]

    def test_chat_with_scripted_llm(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MDX_DB_PATH", str(tmp_path / "c.db"))
        from mdx.pipeline import chat, storage
        storage.init_db()
        storage.save_run(
            run_id="r2", input_filename="x.dcm", metadata_summary={},
            issues=[], metrics_before={}, metrics_after={}, plan_json="",
            validation={}, applied_ops=[], explainability={},
            report_path="", before_after_path="", agent_logs=[],
            status="completed")
        tr = ScriptedTransport([_msg("The run found no issues.")])
        llm.set_transport(tr)
        reply = chat.handle_chat("r2", "any problems?")
        assert reply == "The run found no issues."
        # run context reached the model, pixel-free
        sys_prompt = tr.requests[0][1]["messages"][0]["content"]
        assert "r2" in sys_prompt

    def test_chat_unknown_run(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MDX_DB_PATH", str(tmp_path / "c.db"))
        from mdx.pipeline import chat, storage
        storage.init_db()
        with pytest.raises(KeyError):
            chat.handle_chat("missing", "hi")


class TestGenAIThroughRunner:
    """GenAI mode through the real run_pipeline entry (runner integration)."""

    def _write_dcm(self, tmp_path):
        from mdx.io.dicom_write import write_synthetic_dicom

        p = str(tmp_path / "noisy.dcm")
        write_synthetic_dicom(p, kind="noisy", size=64)
        return p

    def test_genai_run_end_to_end(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MDX_DB_PATH", str(tmp_path / "g.db"))
        p = self._write_dcm(tmp_path)
        tr = ScriptedTransport([
            _msg(_plan_json()),                       # planner
            _msg(_plan_json()),                       # tuning final
            llm.LLMError("no expl"), llm.LLMError("no expl fb"),
        ])
        llm.set_transport(tr)
        from mdx.pipeline.runner import run_pipeline

        ctx = run_pipeline(input_path=p, output_dir=str(tmp_path / "out"),
                           genai=True, model="gpt-5-mini", no_show=True)
        assert not ctx.get("genai_fell_back")
        assert ctx["genai_plan"] is not None
        assert "denoise" in ctx["applied_ops"]
        assert "## 🧠 GenAI" in ctx["report_md"] or "GenAI" in ctx["report_md"]
        from mdx.pipeline import storage

        run = storage.get_run(ctx["run_id"])
        assert run["genai_model"] == "gpt-5-mini"
        assert any(e.get("phase") == "planner" for e in run["agent_logs"])

    def test_genai_failure_falls_back_to_deterministic(self, tmp_path,
                                                       monkeypatch):
        monkeypatch.setenv("MDX_DB_PATH", str(tmp_path / "g.db"))
        p = self._write_dcm(tmp_path)
        llm.set_transport(ScriptedTransport(
            [llm.LLMError("down"), llm.LLMError("down2")]))
        from mdx.pipeline.runner import run_pipeline

        ctx = run_pipeline(input_path=p, output_dir=str(tmp_path / "out"),
                           genai=True, no_show=True)
        assert ctx["genai_fell_back"]
        assert "noise" in ctx["issues"]          # deterministic path ran
        assert ctx["report_md"]

    def test_plan_only_through_runner(self, tmp_path, monkeypatch):
        monkeypatch.setenv("MDX_DB_PATH", str(tmp_path / "g.db"))
        p = self._write_dcm(tmp_path)
        llm.set_transport(ScriptedTransport([_msg(_plan_json())]))
        from mdx.pipeline.runner import run_pipeline

        ctx = run_pipeline(input_path=p, output_dir=str(tmp_path / "out"),
                           genai=True, plan_only=True, no_show=True)
        assert ctx["plan_only"] and ctx["plan"] is not None


class TestImageStoreIsolation:
    def test_store_is_thread_scoped(self, noisy_image, clean_image):
        """Regression: two concurrent runs both register 'original' — each
        thread must see its own pixels, and one thread's clear must not
        wipe the other's store (mdx/serve/executor.py runs GenAI pipelines
        on parallel worker threads)."""
        import threading

        errors = []
        barrier = threading.Barrier(2)

        def work(img, marker):
            try:
                T.register_image(img, "original")
                barrier.wait(timeout=10)
                got = T.get_image("original")
                np.testing.assert_array_equal(got, img, err_msg=marker)
                T.clear_image_store()
                barrier.wait(timeout=10)
                # other thread's clear must not have removed anything here
                with pytest.raises(KeyError):
                    T.get_image("original")
            except Exception as exc:
                errors.append((marker, exc))

        t1 = threading.Thread(target=work, args=(noisy_image, "A"))
        t2 = threading.Thread(target=work, args=(clean_image, "B"))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert not errors


class TestHttpTransport:
    """Drive the stdlib HTTP transport against a local server: headers,
    payload shape, retry on 5xx, failure surfacing."""

    @pytest.fixture()
    def server(self, monkeypatch):
        import http.server
        import threading

        state = {"requests": [], "responses": []}

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                body = self.rfile.read(int(self.headers["Content-Length"]))
                state["requests"].append(
                    (self.path, dict(self.headers), json.loads(body)))
                status, payload = (state["responses"].pop(0)
                                   if state["responses"] else (200, _msg("ok")))
                data = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def log_message(self, *a):
                pass

        httpd = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        port = httpd.server_address[1]
        monkeypatch.setenv("OPENAI_API_KEY", "test-key-123")
        monkeypatch.setattr(llm, "DEFAULT_BASE_URL",
                            f"http://127.0.0.1:{port}/v1")
        yield state
        httpd.shutdown()

    def test_request_shape_and_auth(self, server):
        msg = llm.chat_completion("gpt-4o",
                                  [{"role": "user", "content": "hi"}],
                                  tools=[TOOL_SCHEMAS_GET])
        assert msg["content"] == "ok"
        path, headers, payload = server["requests"][0]
        assert path == "/v1/chat/completions"
        assert headers["Authorization"] == "Bearer test-key-123"
        assert payload["model"] == "gpt-4o"
        assert payload["tools"][0]["function"]["name"] == "tool_get_metrics"

    def test_retry_on_500_then_success(self, server):
        server["responses"] = [(500, {"error": "boom"}),
                               (200, _msg("recovered"))]
        msg = llm.chat_completion("gpt-4o",
                                  [{"role": "user", "content": "hi"}])
        assert msg["content"] == "recovered"
        assert len(server["requests"]) == 2

    def test_client_error_raises(self, server):
        server["responses"] = [(401, {"error": "bad key"})]
        with pytest.raises(llm.LLMError, match="401"):
            llm.chat_completion("gpt-4o",
                                [{"role": "user", "content": "hi"}])

    def test_missing_key_raises(self, server, monkeypatch):
        monkeypatch.delenv("OPENAI_API_KEY")
        with pytest.raises(llm.LLMError, match="OPENAI_API_KEY"):
            llm.chat_completion("gpt-4o",
                                [{"role": "user", "content": "hi"}])


from mdx.genai.tools import TOOL_SCHEMAS as _TS  # noqa: E402

TOOL_SCHEMAS_GET = _TS["tool_get_metrics"]


class TestScoredBestFallback:
    def test_unparseable_final_text_uses_scored_best(self, noisy_image):
        """When the tuning agent's final message isn't a plan but
        iterations WERE scored, best_plan falls back to the scored best
        (fix-forward: the reference keeps the seed, but it never had the
        records to do better — ref pipeline/genai_agents.py:283-300)."""
        plan_good = _plan_json(recommended_ops=["clahe"],
                               params={"clahe_clip_limit": 0.02})
        apply_call = {"id": "a1", "function": {
            "name": "tool_apply_enhancement",
            "arguments": json.dumps({"image_id": "original",
                                     "plan_json": plan_good})}}
        score_call = {"id": "s1", "function": {
            "name": "tool_score_plan",
            "arguments": json.dumps({"validation_json": json.dumps({
                "contrast_gain": 0.2, "sharpness_gain": 0.2,
                "noise_change": -0.1, "niqe_after": 1.0,
                "niqe_before": 1.2, "passes": True, "edge_ratio": 0.9,
                "entropy_change": 0.0, "snr_change": 0.5,
                "histogram_spread_change": 0.0,
                "local_contrast_change": 0.0,
                "gradient_strength_change": 0.0,
                "gradient_entropy_change": 0.0})})}}
        tr = ScriptedTransport([
            _msg(_plan_json()),               # planner (seed: denoise+clahe)
            _msg(None, [apply_call]),
            _msg(None, [score_call]),
            _msg("thanks, that went well!"),  # final text: no JSON at all
            llm.LLMError("no expl"), llm.LLMError("no expl fb"),
        ])
        r = self._run(noisy_image, tr)
        # best_plan is the scored iteration's plan, not the seed
        assert r.best_plan.normalized_ops() == ["clahe"]
        assert r.iterations[0].chosen

    _run = TestOrchestration._run
