const COLORS: Record<string, string> = {
  pending: '#b58900',
  running: '#268bd2',
  completed: '#2aa198',
  error: '#dc322f',
}

export default function StatusBadge({ status }: { status: string }) {
  const color = COLORS[status] ?? '#657b83'
  return (
    <span className="badge" style={{ background: color }}>
      {status}
    </span>
  )
}
