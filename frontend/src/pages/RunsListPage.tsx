import { useEffect, useState } from 'react'
import { Link } from 'react-router-dom'
import { getRuns, type RunSummary } from '../api/client'
import StatusBadge from '../components/StatusBadge'

function fmtTime(t: string | number): string {
  const d = typeof t === 'number' ? new Date(t * 1000) : new Date(t)
  return Number.isNaN(d.getTime()) ? String(t) : d.toLocaleString()
}

export default function RunsListPage() {
  const [runs, setRuns] = useState<RunSummary[]>([])
  const [error, setError] = useState('')
  const [loading, setLoading] = useState(true)

  useEffect(() => {
    getRuns()
      .then(setRuns)
      .catch((e) => setError(e.message))
      .finally(() => setLoading(false))
  }, [])

  if (loading) return <p>Loading…</p>
  if (error) return <p className="error">{error}</p>

  return (
    <div className="page">
      <h1>Runs</h1>
      {runs.length === 0 ? (
        <p className="muted">
          No runs yet — <Link to="/">upload a DICOM</Link> to start.
        </p>
      ) : (
        <table className="runs-table">
          <thead>
            <tr>
              <th>Run</th>
              <th>File</th>
              <th>Time</th>
              <th>Status</th>
              <th>Issues</th>
              <th>Model</th>
            </tr>
          </thead>
          <tbody>
            {runs.map((r) => (
              <tr key={r.run_id}>
                <td>
                  <Link to={`/runs/${r.run_id}`}>{r.run_id}</Link>
                </td>
                <td>{r.input_filename}</td>
                <td>{fmtTime(r.timestamp)}</td>
                <td>
                  <StatusBadge status={r.status} />
                </td>
                <td>{r.issues.join(', ') || '—'}</td>
                <td>{r.genai_model || 'deterministic'}</td>
              </tr>
            ))}
          </tbody>
        </table>
      )}
    </div>
  )
}
