import { useEffect, useRef, useState } from 'react'
import { useNavigate } from 'react-router-dom'
import { pollStatus, startRun, uploadFile } from '../api/client'
import FileUpload from '../components/FileUpload'

const MODELS = ['gpt-5-mini', 'gpt-5', 'gpt-4o', 'o4-mini']
const POLL_MS = 2000
const MAX_POLLS = 300

export default function UploadPage() {
  const navigate = useNavigate()
  const [file, setFile] = useState<File | null>(null)
  const [genai, setGenai] = useState(false)
  const [autotune, setAutotune] = useState(false)
  const [model, setModel] = useState(MODELS[0])
  const [maxIters, setMaxIters] = useState(4)
  const [phase, setPhase] = useState<'idle' | 'uploading' | 'running'>('idle')
  const [error, setError] = useState('')
  const timer = useRef<number | null>(null)

  useEffect(() => () => {
    if (timer.current) window.clearTimeout(timer.current)
  }, [])

  async function handleRun() {
    if (!file) return
    setError('')
    setPhase('uploading')
    try {
      const up = await uploadFile(file)
      const run = await startRun({
        file_id: up.file_id,
        genai,
        autotune,
        model: genai ? model : undefined,
        max_iters: genai ? maxIters : undefined,
      })
      setPhase('running')
      let polls = 0
      const tick = async () => {
        polls += 1
        try {
          const st = await pollStatus(run.run_id)
          if (st.status === 'completed' || st.status === 'error') {
            navigate(`/runs/${run.run_id}`)
            return
          }
        } catch {
          /* transient poll errors are fine */
        }
        if (polls < MAX_POLLS) {
          timer.current = window.setTimeout(tick, POLL_MS)
        } else {
          setError('Run timed out — check the runs list.')
          setPhase('idle')
        }
      }
      timer.current = window.setTimeout(tick, POLL_MS)
    } catch (e) {
      setError(e instanceof Error ? e.message : 'run failed')
      setPhase('idle')
    }
  }

  return (
    <div className="page">
      <h1>Analyse a DICOM study</h1>
      <FileUpload onFile={setFile} disabled={phase !== 'idle'} />

      <div className="options">
        <label>
          <input
            type="checkbox"
            checked={genai}
            onChange={(e) => setGenai(e.target.checked)}
          />{' '}
          GenAI agentic mode (LLM planner + tuner)
        </label>
        <label>
          <input
            type="checkbox"
            checked={autotune}
            onChange={(e) => setAutotune(e.target.checked)}
          />{' '}
          On-device autotune (LLM-free parameter sweep)
        </label>
        {genai && (
          <>
            <label>
              Model{' '}
              <select value={model} onChange={(e) => setModel(e.target.value)}>
                {MODELS.map((m) => (
                  <option key={m}>{m}</option>
                ))}
              </select>
            </label>
            <label>
              Max tuning iterations{' '}
              <input
                type="number"
                min={1}
                max={10}
                value={maxIters}
                onChange={(e) => setMaxIters(Number(e.target.value))}
              />
            </label>
          </>
        )}
      </div>

      <button
        className="primary"
        disabled={!file || phase !== 'idle'}
        onClick={handleRun}
      >
        {phase === 'idle' && 'Run QA pipeline'}
        {phase === 'uploading' && 'Uploading…'}
        {phase === 'running' && 'Running on TPU… (polling)'}
      </button>
      {error && <p className="error">{error}</p>}
    </div>
  )
}
