/**
 * Tiny dependency-free markdown renderer: headings, bold, code, tables,
 * lists — enough for the QA report format (mdx/io/report.py).
 */

function escapeHtml(s: string): string {
  return s
    .replace(/&/g, '&amp;')
    .replace(/</g, '&lt;')
    .replace(/>/g, '&gt;')
}

function inline(s: string): string {
  return s
    .replace(/\*\*(.+?)\*\*/g, '<strong>$1</strong>')
    .replace(/`([^`]+)`/g, '<code>$1</code>')
    .replace(/\*(.+?)\*/g, '<em>$1</em>')
}

function render(md: string): string {
  const lines = md.split('\n')
  const out: string[] = []
  let inTable = false
  let inList = false
  for (const raw of lines) {
    const line = escapeHtml(raw)
    const h = line.match(/^(#{1,4})\s+(.*)$/)
    if (h) {
      if (inList) { out.push('</ul>'); inList = false }
      if (inTable) { out.push('</table>'); inTable = false }
      out.push(`<h${h[1].length}>${inline(h[2])}</h${h[1].length}>`)
      continue
    }
    if (/^\|/.test(line)) {
      if (/^\|[\s\-|:]+\|$/.test(line)) continue // separator row
      const cells = line.split('|').slice(1, -1).map((c) => inline(c.trim()))
      if (!inTable) {
        out.push('<table><tr>' + cells.map((c) => `<th>${c}</th>`).join('') + '</tr>')
        inTable = true
      } else {
        out.push('<tr>' + cells.map((c) => `<td>${c}</td>`).join('') + '</tr>')
      }
      continue
    }
    if (inTable) { out.push('</table>'); inTable = false }
    const li = line.match(/^\s*[-*]\s+(.*)$/)
    if (li) {
      if (!inList) { out.push('<ul>'); inList = true }
      out.push(`<li>${inline(li[1])}</li>`)
      continue
    }
    if (inList) { out.push('</ul>'); inList = false }
    if (line.trim() === '') out.push('')
    else out.push(`<p>${inline(line)}</p>`)
  }
  if (inList) out.push('</ul>')
  if (inTable) out.push('</table>')
  return out.join('\n')
}

export default function MarkdownViewer({ markdown }: { markdown: string }) {
  return (
    <div
      className="markdown"
      dangerouslySetInnerHTML={{ __html: render(markdown) }}
    />
  )
}
