import { useRef, useState, type DragEvent } from 'react'

interface Props {
  onFile: (file: File) => void
  disabled?: boolean
}

export default function FileUpload({ onFile, disabled }: Props) {
  const inputRef = useRef<HTMLInputElement>(null)
  const [dragOver, setDragOver] = useState(false)
  const [name, setName] = useState('')

  function pick(file: File | undefined) {
    if (!file) return
    setName(file.name)
    onFile(file)
  }

  function onDrop(e: DragEvent) {
    e.preventDefault()
    setDragOver(false)
    if (!disabled) pick(e.dataTransfer.files[0])
  }

  return (
    <div
      className={`dropzone ${dragOver ? 'dropzone-over' : ''}`}
      onClick={() => !disabled && inputRef.current?.click()}
      onDragOver={(e) => {
        e.preventDefault()
        setDragOver(true)
      }}
      onDragLeave={() => setDragOver(false)}
      onDrop={onDrop}
    >
      <input
        ref={inputRef}
        type="file"
        accept=".dcm,.dicom"
        hidden
        onChange={(e) => pick(e.target.files?.[0])}
      />
      {name ? (
        <span>📄 {name}</span>
      ) : (
        <span>Drop a DICOM file here or click to browse (.dcm, .dicom — max 50 MB)</span>
      )}
    </div>
  )
}
