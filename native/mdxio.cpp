// mdxio — native host-side kernels for the mdx DICOM ingest path.
//
// The reference is pure Python (zero native code, SURVEY.md: requirements
// are numpy/scipy/skimage only); its per-pixel work is delegated to NumPy.
// On a TPU-VM host the ingest path (unpack → modality rescale → min-max
// normalise) competes with the feeding of the device queue, so these
// kernels do the conversion in one or two streaming passes with OpenMP
// across frames, replacing three temporary-allocating NumPy sweeps.
//
// Exposed C ABI (see mdx/io/native.py ctypes bindings):
//   mdxio_rescale_f32_<src>  : src → float32 * slope + intercept
//   mdxio_minmax_f32         : min/max of a float32 buffer
//   mdxio_normalize_f32      : in-place (x - lo) / (hi - lo)
//   mdxio_rescale_norm_<src> : fused rescale + per-call min-max normalise
//   mdxio_packbits_{decode,encode} : DICOM RLE PackBits (PS3.5 Annex G)
//   mdxio_jpegll_diffs       : JPEG Lossless entropy decode (T.81 H/F.2)
//   mdxio_jpegll_pack        : JPEG Lossless entropy encode bit packer
//
// Build: make -C native  (g++ -O3 -march=native -fopenmp -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstddef>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

#define RESCALE_IMPL(suffix, SRC_T)                                         \
  void mdxio_rescale_f32_##suffix(const SRC_T *src, int64_t n, float slope, \
                                  float intercept, float *out) {            \
    _Pragma("omp parallel for schedule(static)")                            \
    for (int64_t i = 0; i < n; ++i) {                                       \
      out[i] = static_cast<float>(src[i]) * slope + intercept;              \
    }                                                                       \
  }

RESCALE_IMPL(u8, uint8_t)
RESCALE_IMPL(s8, int8_t)
RESCALE_IMPL(u16, uint16_t)
RESCALE_IMPL(s16, int16_t)
RESCALE_IMPL(u32, uint32_t)
RESCALE_IMPL(s32, int32_t)

void mdxio_minmax_f32(const float *src, int64_t n, float *lo_out,
                      float *hi_out) {
  float lo = src[0], hi = src[0];
#if defined(_OPENMP)
#pragma omp parallel for schedule(static) reduction(min : lo) \
    reduction(max : hi)
#endif
  for (int64_t i = 0; i < n; ++i) {
    lo = std::min(lo, src[i]);
    hi = std::max(hi, src[i]);
  }
  *lo_out = lo;
  *hi_out = hi;
}

void mdxio_normalize_f32(float *buf, int64_t n, float lo, float hi) {
  const float range = hi - lo;
  // match the NumPy path's constant-image guard (range < 1e-8 → zeros)
  if (range < 1e-8f) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; ++i) buf[i] = 0.0f;
    return;
  }
  const float inv = 1.0f / range;
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; ++i) buf[i] = (buf[i] - lo) * inv;
}

// Fused: rescale into `out`, then min-max normalise, optionally inverting
// first (MONOCHROME1: x → max - x happens implicitly by negating slope and
// normalising — the caller passes invert=1 to flip).
#define RESCALE_NORM_IMPL(suffix, SRC_T)                                     \
  void mdxio_rescale_norm_##suffix(const SRC_T *src, int64_t n, float slope, \
                                   float intercept, int invert,              \
                                   float *out) {                             \
    mdxio_rescale_f32_##suffix(src, n, slope, intercept, out);               \
    float lo, hi;                                                            \
    mdxio_minmax_f32(out, n, &lo, &hi);                                      \
    if (invert) {                                                            \
      const float range = hi - lo;                                           \
      if (range <= 0.0f) {                                                   \
        mdxio_normalize_f32(out, n, lo, hi);                                 \
        return;                                                              \
      }                                                                      \
      const float inv = 1.0f / range;                                        \
      _Pragma("omp parallel for schedule(static)")                           \
      for (int64_t i = 0; i < n; ++i) out[i] = (hi - out[i]) * inv;          \
    } else {                                                                 \
      mdxio_normalize_f32(out, n, lo, hi);                                   \
    }                                                                        \
  }

RESCALE_NORM_IMPL(u8, uint8_t)
RESCALE_NORM_IMPL(s8, int8_t)
RESCALE_NORM_IMPL(u16, uint16_t)
RESCALE_NORM_IMPL(s16, int16_t)
RESCALE_NORM_IMPL(u32, uint32_t)
RESCALE_NORM_IMPL(s32, int32_t)

// ---------------------------------------------------------------------------
// PackBits (DICOM RLE Lossless, PS3.5 Annex G) — byte-serial codecs.
//
// The Python loops in mdx/io/rle.py run one interpreter iteration per
// control byte (~hundreds of thousands per 16-bit 512² segment); these are
// the same algorithms with identical control flow, so outputs are
// bit-identical (asserted in tests/test_native.py).  Serial by design:
// PackBits streams have sequential data dependence; frame-level
// parallelism belongs to the caller (one frame per worker).
// ---------------------------------------------------------------------------

// Decode up to `expected` output bytes.  Returns the number of bytes
// produced (== expected on success; < expected means the stream was too
// short), or -1 for a literal run truncated by the input end, -2 for a
// replicate run with no byte to repeat — the exact error taxonomy of the
// Python reference implementation.
int64_t mdxio_packbits_decode(const uint8_t *src, int64_t n, uint8_t *out,
                              int64_t expected) {
  int64_t i = 0, o = 0;
  while (i < n && o < expected) {
    const uint8_t ctrl = src[i++];
    if (ctrl < 128) {
      const int64_t cnt = static_cast<int64_t>(ctrl) + 1;
      if (i + cnt > n) return -1;
      const int64_t c = std::min(cnt, expected - o);
      for (int64_t k = 0; k < c; ++k) out[o + k] = src[i + k];
      o += c;
      i += cnt;
    } else if (ctrl > 128) {
      if (i >= n) return -2;
      const int64_t cnt = 257 - static_cast<int64_t>(ctrl);
      const int64_t c = std::min(cnt, expected - o);
      const uint8_t v = src[i++];
      for (int64_t k = 0; k < c; ++k) out[o + k] = v;
      o += c;
    }
    // ctrl == 128: no-op
  }
  return o;
}

// Encode `n` bytes; `out` needs capacity >= n + n/128 + 2 (worst case:
// all literal blocks).  Returns bytes written.  Identical run/literal
// boundaries to the Python encoder (replicate runs >=3, literals <=128,
// literal scan stops before the next >=3 replicate run).
// ---------------------------------------------------------------------------
// JPEG Lossless (ITU-T T.81 process 14) entropy decode — the serial hot
// loop of mdx/io/jpegll.py: destuffed scan bytes → per-sample signed
// differences (Huffman per F.2.2.3 + DC magnitude-category extend, with
// SSSS=16 meaning +32768 and no extra bits).  Prediction/undifferencing
// stays on the vectorised NumPy side.  Identical control flow and error
// taxonomy to _scan_diffs_py (bit-identical diffs, fuzz-asserted in
// tests/test_dicom_jpegll.py): returns `count` on success, -1 truncated
// input, -2 invalid code/symbol, -3 table mismatch.
// ---------------------------------------------------------------------------

int64_t mdxio_jpegll_diffs(const uint8_t *seg, int64_t n,
                           const uint8_t *counts /* 16 */,
                           const uint8_t *values, int64_t n_values,
                           int64_t count, int32_t *out) {
  int32_t mincode[17], maxcode[17], valptr[17];
  int code = 0, k = 0;
  for (int L = 1; L <= 16; ++L) {
    const int c = counts[L - 1];
    maxcode[L] = -1;
    valptr[L] = 0;
    mincode[L] = 0;
    if (c) {
      valptr[L] = k;
      mincode[L] = code;
      code += c;
      maxcode[L] = code - 1;
      k += c;
    }
    code <<= 1;
  }
  if (k != n_values) return -3;
  int64_t i = 0;  // byte cursor; bitpos counts consumed MSB-first bits
  int bitpos = 0;
  for (int64_t m = 0; m < count; ++m) {
    int c = 0, L = 0;
    for (;;) {
      if (i >= n) return -1;
      const int bit = (seg[i] >> (7 - bitpos)) & 1;
      if (++bitpos == 8) {
        bitpos = 0;
        ++i;
      }
      c = (c << 1) | bit;
      if (++L > 16) return -2;
      if (maxcode[L] >= c) break;
    }
    const int s = values[valptr[L] + c - mincode[L]];
    int32_t d;
    if (s == 0) {
      d = 0;
    } else if (s == 16) {
      d = 32768;
    } else if (s > 16) {
      return -2;
    } else {
      int v = 0;
      for (int b = 0; b < s; ++b) {
        if (i >= n) return -1;
        v = (v << 1) | ((seg[i] >> (7 - bitpos)) & 1);
        if (++bitpos == 8) {
          bitpos = 0;
          ++i;
        }
      }
      d = (v >= (1 << (s - 1))) ? v : v - (1 << s) + 1;
    }
    out[m] = d;
  }
  return count;
}

int64_t mdxio_packbits_encode(const uint8_t *src, int64_t n, uint8_t *out) {
  int64_t i = 0, o = 0;
  while (i < n) {
    int64_t run = 1;
    while (i + run < n && run < 128 && src[i + run] == src[i]) ++run;
    if (run >= 3) {
      out[o++] = static_cast<uint8_t>(257 - run);
      out[o++] = src[i];
      i += run;
      continue;
    }
    int64_t j = i + 1;
    while (j < n && (j - i) < 128) {
      if (j + 2 < n && src[j] == src[j + 1] && src[j + 1] == src[j + 2])
        break;
      ++j;
    }
    out[o++] = static_cast<uint8_t>(j - i - 1);
    for (int64_t k = i; k < j; ++k) out[o++] = src[k];
    i = j;
  }
  return o;
}

// ---------------------------------------------------------------------------
// JPEG Lossless entropy ENCODE bit packer — the serial hot loop of
// mdx/io/jpegll.py _pack_segment: per-sample (Huffman code, extra bits)
// → MSB-first bit stream, 1-padded to a byte, 0xFF byte-stuffed inline.
// Bit-identical to the NumPy packer (fuzz-asserted in
// tests/test_dicom_jpegll.py).  `ssss` are the per-sample categories
// (0..16), `evals` the pre-adjusted extra-bit values; `code_of`/`len_of`
// index by category.  `out` needs capacity >= count*8 + 2 (<=32 bits per
// sample, doubled by worst-case stuffing).  Returns bytes written.
// ---------------------------------------------------------------------------

int64_t mdxio_jpegll_pack(const uint8_t *ssss, const int64_t *evals,
                          int64_t count, const int64_t *code_of,
                          const int64_t *len_of, uint8_t *out) {
  int64_t o = 0;
  uint64_t acc = 0;  // low `nacc` bits are the pending bit stream tail
  int nacc = 0;
  for (int64_t m = 0; m < count; ++m) {
    const int s = ssss[m];
    const int eb = (s == 0 || s == 16) ? 0 : s;
    const int nb = static_cast<int>(len_of[s]) + eb;
    acc = (acc << nb) |
          ((static_cast<uint64_t>(code_of[s]) << eb) |
           static_cast<uint64_t>(evals[m]));
    nacc += nb;
    while (nacc >= 8) {
      const uint8_t b = static_cast<uint8_t>(acc >> (nacc - 8));
      out[o++] = b;
      if (b == 0xFF) out[o++] = 0x00;
      nacc -= 8;
      acc &= (uint64_t(1) << nacc) - 1;
    }
  }
  if (nacc) {
    const uint8_t b = static_cast<uint8_t>(
        (acc << (8 - nacc)) | ((uint64_t(1) << (8 - nacc)) - 1));
    out[o++] = b;
    if (b == 0xFF) out[o++] = 0x00;
  }
  return o;
}

}  // extern "C"
