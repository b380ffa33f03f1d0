import { useState } from 'react'
import type { LogEntry } from '../api/client'

export default function LogsAccordion({ logs }: { logs: LogEntry[] }) {
  const phases = new Map<string, LogEntry[]>()
  for (const entry of logs) {
    const key = entry.phase || 'general'
    if (!phases.has(key)) phases.set(key, [])
    phases.get(key)!.push(entry)
  }
  if (phases.size === 0) return <p className="muted">No agent traces recorded.</p>
  return (
    <div className="logs">
      {[...phases.entries()].map(([phase, entries]) => (
        <Phase key={phase} phase={phase} entries={entries} />
      ))}
    </div>
  )
}

function Phase({ phase, entries }: { phase: string; entries: LogEntry[] }) {
  const [open, setOpen] = useState(false)
  return (
    <div className="log-phase">
      <button className="log-header" onClick={() => setOpen(!open)}>
        {open ? '▾' : '▸'} {phase} ({entries.length})
      </button>
      {open && (
        <ul>
          {entries.map((e, i) => (
            <li key={i}>
              <span className="log-event">{e.event}</span> {e.detail}
            </li>
          ))}
        </ul>
      )}
    </div>
  )
}
