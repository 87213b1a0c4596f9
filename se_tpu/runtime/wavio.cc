// Native WAV decode + batch assembly for the data loader hot path.
//
// The reference's data pipeline decodes wavs in Python per utterance
// (Uformer/data.py:123-150). This C library does the RIFF parse, PCM->float
// conversion, RMS gain, and crop in C++ so the host input pipeline keeps up
// with the TPU; se_tpu/runtime/native.py binds it with ctypes and
// se_tpu/data/wav.py uses it when built (pure-python fallback otherwise).
//
// Build: see se_tpu/runtime/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <cmath>

extern "C" {

// Parse a RIFF/WAVE buffer; convert to float32 in [-1, 1).
// Returns number of samples written to `out` (mono: first channel), or -1.
// `out_capacity` is in samples; `sr_out` receives the sample rate.
int64_t wav_decode(const uint8_t* data, int64_t size, float* out,
                   int64_t out_capacity, int32_t* sr_out) {
  if (size < 12 || memcmp(data, "RIFF", 4) != 0 ||
      memcmp(data + 8, "WAVE", 4) != 0) {
    return -1;
  }
  int64_t pos = 12;
  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  const uint8_t* raw = nullptr;
  int64_t raw_size = 0;
  while (pos + 8 <= size) {
    const uint8_t* id = data + pos;
    uint32_t chunk = 0;
    memcpy(&chunk, data + pos + 4, 4);
    const uint8_t* body = data + pos + 8;
    if (pos + 8 + chunk > size) break;
    if (memcmp(id, "fmt ", 4) == 0 && chunk >= 16) {
      memcpy(&audio_format, body, 2);
      memcpy(&channels, body + 2, 2);
      memcpy(&sr, body + 4, 4);
      memcpy(&bits, body + 14, 2);
      if (audio_format == 0xFFFE) audio_format = (bits == 32 ? 1 : 1);
    } else if (memcmp(id, "data", 4) == 0) {
      raw = body;
      raw_size = chunk;
    }
    pos += 8 + chunk + (chunk & 1);
  }
  if (raw == nullptr || channels == 0) return -1;
  *sr_out = static_cast<int32_t>(sr);

  int64_t n_total;
  if (audio_format == 1 && bits == 16) {
    n_total = raw_size / 2;
  } else if (audio_format == 1 && bits == 24) {
    n_total = raw_size / 3;
  } else if (audio_format == 1 && bits == 32) {
    n_total = raw_size / 4;
  } else if (audio_format == 3 && bits == 32) {
    n_total = raw_size / 4;
  } else {
    return -1;
  }
  int64_t n_frames = n_total / channels;
  if (n_frames > out_capacity) n_frames = out_capacity;

  if (audio_format == 1 && bits == 16) {
    const int16_t* p = reinterpret_cast<const int16_t*>(raw);
    for (int64_t i = 0; i < n_frames; ++i)
      out[i] = static_cast<float>(p[i * channels]) / 32768.0f;
  } else if (audio_format == 1 && bits == 24) {
    for (int64_t i = 0; i < n_frames; ++i) {
      const uint8_t* b = raw + 3 * i * channels;
      int32_t v = b[0] | (b[1] << 8) | (b[2] << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      out[i] = static_cast<float>(v) / 8388608.0f;
    }
  } else if (audio_format == 1 && bits == 32) {
    const int32_t* p = reinterpret_cast<const int32_t*>(raw);
    for (int64_t i = 0; i < n_frames; ++i)
      out[i] = static_cast<float>(p[i * channels]) / 2147483648.0f;
  } else {  // float32
    const float* p = reinterpret_cast<const float*>(raw);
    for (int64_t i = 0; i < n_frames; ++i) out[i] = p[i * channels];
  }
  return n_frames;
}

// RMS gain c = sqrt(n / sum(x^2)) (ref Uformer/data.py:136).
float rms_gain(const float* x, int64_t n) {
  double e = 0.0;
  for (int64_t i = 0; i < n; ++i) e += static_cast<double>(x[i]) * x[i];
  if (e < 1e-12) e = 1e-12;
  return static_cast<float>(sqrt(static_cast<double>(n) / e));
}

// Scale in place.
void scale(float* x, int64_t n, float c) {
  for (int64_t i = 0; i < n; ++i) x[i] *= c;
}

// Copy a crop of `len` samples starting at `start` into dst (zero-padded).
void crop_pad(const float* x, int64_t n, int64_t start, float* dst,
              int64_t len) {
  for (int64_t i = 0; i < len; ++i) {
    int64_t j = start + i;
    dst[i] = (j < n) ? x[j] : 0.0f;
  }
}

}  // extern "C"
