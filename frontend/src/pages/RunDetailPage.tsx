import { useEffect, useState } from 'react'
import { Link, useParams } from 'react-router-dom'
import {
  beforeAfterUrl,
  getReport,
  getRun,
  type RunDetail,
} from '../api/client'
import ChatPanel from '../components/ChatPanel'
import JsonViewer from '../components/JsonViewer'
import LogsAccordion from '../components/LogsAccordion'
import MarkdownViewer from '../components/MarkdownViewer'
import MetricsTable from '../components/MetricsTable'
import StatusBadge from '../components/StatusBadge'

const TABS = [
  'Overview',
  'Metrics',
  'Plan JSON',
  'Validation',
  'Visuals',
  'Report',
  'Logs',
  'Chat',
] as const
type Tab = (typeof TABS)[number]

export default function RunDetailPage() {
  const { runId } = useParams<{ runId: string }>()
  const [data, setData] = useState<RunDetail | null>(null)
  const [report, setReport] = useState('')
  const [tab, setTab] = useState<Tab>('Overview')
  const [error, setError] = useState('')

  useEffect(() => {
    if (!runId) return
    getRun(runId)
      .then((d) => {
        setData(d)
        return getReport(runId).then(setReport).catch(() => {})
      })
      .catch((e) => setError(e.message))
  }, [runId])

  if (error)
    return (
      <p className="error">
        {error} — <Link to="/runs">back to runs</Link>
      </p>
    )
  if (!data || !runId) return <p>Loading…</p>

  return (
    <div className="page">
      <h1>
        Run {data.run_id} <StatusBadge status={data.status} />
      </h1>
      <div className="tabs">
        {TABS.map((t) => (
          <button
            key={t}
            className={t === tab ? 'tab active' : 'tab'}
            onClick={() => setTab(t)}
          >
            {t}
          </button>
        ))}
      </div>

      {tab === 'Overview' && (
        <div>
          <dl className="overview">
            <dt>Input</dt>
            <dd>{data.input_filename}</dd>
            <dt>Issues</dt>
            <dd>{data.issues.join(', ') || 'none detected'}</dd>
            <dt>Applied ops</dt>
            <dd>{data.applied_ops.join(', ') || '—'}</dd>
            <dt>Metadata</dt>
            <dd>
              {Object.entries(data.metadata_summary || {})
                .map(([k, v]) => `${k}: ${v}`)
                .join(' · ') || '—'}
            </dd>
            {data.genai_model && (
              <>
                <dt>GenAI model</dt>
                <dd>
                  {data.genai_model} ({data.genai_llm_calls} LLM calls)
                </dd>
              </>
            )}
          </dl>
          {Object.keys(data.explainability || {}).length > 0 && (
            <section>
              <h2>Explainability</h2>
              {Object.entries(data.explainability).map(([k, v]) => (
                <p key={k}>
                  <strong>{k.replace(/_/g, ' ')}:</strong>{' '}
                  {Array.isArray(v) ? v.join(' · ') : String(v)}
                </p>
              ))}
            </section>
          )}
        </div>
      )}

      {tab === 'Metrics' && (
        <MetricsTable before={data.metrics_before} after={data.metrics_after} />
      )}

      {tab === 'Plan JSON' && <JsonViewer data={data.plan_json} />}

      {tab === 'Validation' && <JsonViewer data={data.validation} />}

      {tab === 'Visuals' && (
        <div className="visuals">
          <img
            src={beforeAfterUrl(runId)}
            alt="before / after comparison"
            onError={(e) => {
              ;(e.target as HTMLImageElement).alt = 'No image available'
            }}
          />
        </div>
      )}

      {tab === 'Report' && <MarkdownViewer markdown={report} />}

      {tab === 'Logs' && <LogsAccordion logs={data.agent_logs || []} />}

      {tab === 'Chat' && (
        <ChatPanel runId={runId} history={data.chat_history || []} />
      )}
    </div>
  )
}
