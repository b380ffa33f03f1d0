"""GenAI layer (L3): LLM planner/tuner/explainability orchestration.

Rebuilds the reference's OpenAI-Agents-SDK pipeline
(ref pipeline/genai_agents.py, pipeline/tools.py) from scratch:

* :mod:`mdx.genai.client` — a minimal OpenAI-compatible chat-completions
  client (stdlib HTTP, no SDK dependency) with tool-calling, structured
  output, and an injectable transport so tests run without network.
* :mod:`mdx.genai.tools` — the opaque-ID image store (PHI firewall: the
  LLM only ever sees string handles, never pixels) and the four function
  tools, backed by the fused on-device QA programs — one tuning iteration
  is one XLA program launch (BASELINE.json config 4).
* :mod:`mdx.genai.agents` — agent definitions (prompts, tool sets,
  structured output schemas) and the agent loop with model fallback.
* :mod:`mdx.genai.orchestrator` — the 5-phase pipeline with the layered
  degradation chain (model fallback → phase fallback → deterministic
  fallback) and the LLM cost guard.
"""
