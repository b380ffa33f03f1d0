import { defineConfig } from 'vite'
import react from '@vitejs/plugin-react'

// Dev-server proxy so `npm run dev` talks to the mdx API on :5000
// without CORS friction; production builds read VITE_API_URL.
export default defineConfig({
  plugins: [react()],
  server: {
    proxy: {
      '/api': 'http://localhost:5000',
    },
  },
})
