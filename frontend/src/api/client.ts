/**
 * Typed API client for the mdx backend (12 JSON routes, mdx/serve/api.py).
 * Same wire contract as the reference backend, so either serves this SPA.
 */

const API_BASE: string = import.meta.env.VITE_API_URL ?? ''

async function json<T>(path: string, init?: RequestInit): Promise<T> {
  const res = await fetch(`${API_BASE}${path}`, init)
  const body = await res.json().catch(() => ({ error: res.statusText }))
  if (!res.ok) throw new Error(body.error || `HTTP ${res.status}`)
  return body as T
}

export interface UploadResult {
  file_id: string
  filename: string
  stored_name: string
}

export interface RunStartResult {
  run_id: string
  status: string
}

export interface RunSummary {
  run_id: string
  timestamp: string | number
  input_filename: string
  status: string
  issues: string[]
  genai_model: string
}

export interface LogEntry {
  timestamp?: string | number
  phase?: string
  event?: string
  detail?: string
}

export interface ChatMessage {
  role: string
  content: string
  created_at?: number
}

export interface RunDetail {
  run_id: string
  created_at?: string | number
  input_filename: string
  status: string
  metadata_summary: Record<string, string>
  issues: string[]
  metrics_before: Record<string, number>
  metrics_after: Record<string, number>
  plan_json: string
  validation: Record<string, unknown>
  applied_ops: string[]
  explainability: Record<string, unknown>
  report_path: string
  before_after_path: string
  agent_logs: LogEntry[]
  genai_model: string
  genai_llm_calls: number
  chat_history: ChatMessage[]
}

export async function uploadFile(file: File): Promise<UploadResult> {
  const form = new FormData()
  form.append('file', file)
  const res = await fetch(`${API_BASE}/api/upload`, {
    method: 'POST',
    body: form,
  })
  const body = await res.json().catch(() => ({ error: res.statusText }))
  if (!res.ok) throw new Error(body.error || `Upload failed (${res.status})`)
  return body
}

export function startRun(params: {
  file_id: string
  genai?: boolean
  autotune?: boolean
  model?: string
  max_iters?: number
}): Promise<RunStartResult> {
  return json('/api/run', {
    method: 'POST',
    headers: { 'Content-Type': 'application/json' },
    body: JSON.stringify(params),
  })
}

export function pollStatus(runId: string): Promise<{ run_id: string; status: string }> {
  return json(`/api/runs/${runId}/status`)
}

export async function getRuns(): Promise<RunSummary[]> {
  const data = await json<{ runs: RunSummary[] }>('/api/runs')
  return data.runs
}

export function getRun(runId: string): Promise<RunDetail> {
  return json(`/api/runs/${runId}`)
}

export async function getReport(runId: string): Promise<string> {
  const data = await json<{ markdown: string }>(`/api/runs/${runId}/report`)
  return data.markdown
}

export function beforeAfterUrl(runId: string): string {
  return `${API_BASE}/api/runs/${runId}/before_after`
}

export async function sendChat(runId: string, message: string, model?: string): Promise<string> {
  const data = await json<{ reply: string }>(`/api/runs/${runId}/chat`, {
    method: 'POST',
    headers: { 'Content-Type': 'application/json' },
    body: JSON.stringify({ message, model }),
  })
  return data.reply
}

export async function getLogs(runId: string): Promise<LogEntry[]> {
  const data = await json<{ logs: LogEntry[] }>(`/api/runs/${runId}/logs`)
  return data.logs
}
