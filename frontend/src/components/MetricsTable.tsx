interface Props {
  before: Record<string, number>
  after: Record<string, number>
}

// The 16-metric contract (mdx/core/metrics.py METRIC_KEYS).
const METRIC_LABELS: Record<string, string> = {
  sigma: 'Noise σ (wavelet-MAD)',
  lap_var: 'Sharpness (Laplacian var)',
  std: 'Contrast (global std)',
  pct_low: 'Clipped shadows %',
  pct_high: 'Clipped highlights %',
  entropy: 'Histogram entropy',
  edge_density: 'Edge density',
  gradient_mag_mean: 'Gradient mean',
  gradient_mag_std: 'Gradient std',
  snr_proxy: 'SNR proxy',
  cnr_proxy: 'CNR proxy',
  laplacian_energy: 'Laplacian energy',
  histogram_spread: 'Histogram spread (IQR)',
  local_contrast_std: 'Local contrast std',
  gradient_strength: 'Gradient strength',
  gradient_entropy: 'Gradient entropy',
}

const LOWER_IS_BETTER = new Set(['sigma', 'pct_low', 'pct_high'])

function fmt(v: number | undefined): string {
  if (v === undefined || Number.isNaN(v)) return '—'
  if (Math.abs(v) >= 100) return v.toFixed(1)
  if (Math.abs(v) >= 1) return v.toFixed(4)
  return v.toFixed(6)
}

function deltaClass(key: string, b?: number, a?: number): string {
  if (b === undefined || a === undefined || a === b) return ''
  const improved = LOWER_IS_BETTER.has(key) ? a < b : a > b
  return improved ? 'delta-good' : 'delta-bad'
}

export default function MetricsTable({ before, after }: Props) {
  const keys = Object.keys(METRIC_LABELS).filter(
    (k) => k in before || k in after,
  )
  return (
    <table className="metrics-table">
      <thead>
        <tr>
          <th>Metric</th>
          <th>Before</th>
          <th>After</th>
          <th>Δ</th>
        </tr>
      </thead>
      <tbody>
        {keys.map((k) => {
          const b = before[k]
          const a = after[k]
          const d = b !== undefined && a !== undefined ? a - b : undefined
          return (
            <tr key={k}>
              <td>{METRIC_LABELS[k]}</td>
              <td>{fmt(b)}</td>
              <td>{fmt(a)}</td>
              <td className={deltaClass(k, b, a)}>{fmt(d)}</td>
            </tr>
          )
        })}
      </tbody>
    </table>
  )
}
