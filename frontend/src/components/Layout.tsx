import type { ReactNode } from 'react'
import { NavLink } from 'react-router-dom'

export default function Layout({ children }: { children: ReactNode }) {
  return (
    <div className="layout">
      <header className="topbar">
        <span className="brand">🩻 mdx — Medical Imaging QA</span>
        <nav>
          <NavLink to="/" end>
            Upload
          </NavLink>
          <NavLink to="/runs">Runs</NavLink>
        </nav>
        <span className="tag">TPU-native</span>
      </header>
      <main className="content">{children}</main>
      <footer className="footer">
        Not for clinical diagnosis — visualisation aid only.
      </footer>
    </div>
  )
}
