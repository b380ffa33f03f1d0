export default function JsonViewer({ data }: { data: unknown }) {
  let text: string
  if (typeof data === 'string') {
    try {
      text = JSON.stringify(JSON.parse(data), null, 2)
    } catch {
      text = data
    }
  } else {
    text = JSON.stringify(data, null, 2)
  }
  return <pre className="json-viewer">{text || '—'}</pre>
}
