import { useState } from 'react'
import { sendChat, type ChatMessage } from '../api/client'

interface Props {
  runId: string
  history: ChatMessage[]
}

export default function ChatPanel({ runId, history }: Props) {
  const [messages, setMessages] = useState<ChatMessage[]>(history)
  const [draft, setDraft] = useState('')
  const [busy, setBusy] = useState(false)
  const [error, setError] = useState('')

  async function submit() {
    const message = draft.trim()
    if (!message || busy) return
    setDraft('')
    setError('')
    setBusy(true)
    setMessages((m) => [...m, { role: 'user', content: message }])
    try {
      const reply = await sendChat(runId, message)
      setMessages((m) => [...m, { role: 'assistant', content: reply }])
    } catch (e) {
      setError(e instanceof Error ? e.message : 'chat failed')
    } finally {
      setBusy(false)
    }
  }

  return (
    <div className="chat">
      <div className="chat-messages">
        {messages.length === 0 && (
          <p className="muted">Ask about this run's metrics, plan, or results.</p>
        )}
        {messages.map((m, i) => (
          <div key={i} className={`chat-msg chat-${m.role}`}>
            <strong>{m.role === 'user' ? 'You' : 'Assistant'}:</strong>{' '}
            {m.content}
          </div>
        ))}
        {busy && <div className="chat-msg chat-assistant muted">thinking…</div>}
      </div>
      {error && <p className="error">{error}</p>}
      <div className="chat-input">
        <input
          value={draft}
          maxLength={2000}
          placeholder="Ask a question about this run…"
          onChange={(e) => setDraft(e.target.value)}
          onKeyDown={(e) => e.key === 'Enter' && submit()}
        />
        <button onClick={submit} disabled={busy || !draft.trim()}>
          Send
        </button>
      </div>
    </div>
  )
}
