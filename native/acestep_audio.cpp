// Native audio kernels for the ACE-Step TPU framework's host-side data path.
//
// The reference stack leans on torchaudio/ffmpeg for WAV decode, resampling,
// and normalization (acestep/audio_utils.py). Those run on the host CPU and
// sit on the request path (reference-audio ingest, dataset preprocessing) —
// here they are C++ (built with `make -C native`) behind a ctypes wrapper
// with a scipy fallback (acestep_tpu/utils/native_audio.py).
//
// Exposed C ABI:
//   as_resample_poly : Kaiser-windowed-sinc polyphase resampling (planar f32)
//   as_f32_to_i16    : peak-scan + normalize + interleave + int16 quantize
//   as_i16_to_f32    : de-interleave + float conversion
//   as_peak          : max |x|

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// max |x| over n floats
float as_peak(const float* x, int64_t n) {
  float peak = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    float a = x[i] < 0 ? -x[i] : x[i];
    if (a > peak) peak = a;
  }
  return peak;
}

// planar f32 (ch, n) -> interleaved int16 (n, ch), scaling peak to target_gain
// (target_gain <= 0 means clip-guard only).
void as_f32_to_i16(const float* x, int64_t n, int ch, float target_gain,
                   int16_t* out) {
  float peak = as_peak(x, n * ch);
  float scale = 1.0f;
  if (target_gain > 0.0f && peak > 1e-9f) {
    scale = target_gain / peak;
  } else if (peak > 1.0f) {
    scale = 1.0f / peak;
  }
  for (int64_t i = 0; i < n; ++i) {
    for (int c = 0; c < ch; ++c) {
      float v = x[c * n + i] * scale;
      if (v > 1.0f) v = 1.0f;
      if (v < -1.0f) v = -1.0f;
      out[i * ch + c] = (int16_t)lrintf(v * 32767.0f);
    }
  }
}

// interleaved int16 (n, ch) -> planar f32 (ch, n)
void as_i16_to_f32(const int16_t* x, int64_t n, int ch, float* out) {
  const float inv = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) {
    for (int c = 0; c < ch; ++c) {
      out[c * n + i] = (float)x[i * ch + c] * inv;
    }
  }
}

static double kaiser_i0(double x) {
  // Modified Bessel function of the first kind, order 0 (series expansion).
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-12 * sum) break;
  }
  return sum;
}

// Polyphase windowed-sinc resampler: planar f32 (ch, in_len) at sr_in ->
// planar f32 (ch, out_len) at sr_out where out_len = in_len * up / down
// after reduction. Caller provides out sized ceil(in_len * sr_out / sr_in).
// Returns actual output length.
int64_t as_resample_poly(const float* in, int64_t in_len, int ch, int sr_in,
                         int sr_out, float* out) {
  if (sr_in == sr_out) {
    memcpy(out, in, sizeof(float) * (size_t)(in_len * ch));
    return in_len;
  }
  // reduce ratio
  int a = sr_in, b = sr_out;
  while (b) { int t = a % b; a = b; b = t; }
  const int g = a;
  const int up = sr_out / g, down = sr_in / g;

  // Kaiser-windowed sinc, cutoff at min(1/up, 1/down) of Nyquist.
  const int half_taps_per_phase = 10;
  const double cutoff = 0.5 / (up > down ? up : down);
  const int half = half_taps_per_phase * (up > down ? up : down);
  const double beta = 8.6;  // ~ -80 dB stopband
  const double i0b = kaiser_i0(beta);

  std::vector<double> h(2 * half + 1);
  for (int i = -half; i <= half; ++i) {
    double t = (double)i;
    double sinc = (i == 0) ? 2.0 * cutoff
                           : sin(2.0 * M_PI * cutoff * t) / (M_PI * t);
    double w = kaiser_i0(beta * sqrt(1.0 - (t / half) * (t / half))) / i0b;
    h[i + half] = sinc * w * up;
  }

  const int64_t out_len = (in_len * (int64_t)up) / down;
  for (int c = 0; c < ch; ++c) {
    const float* src = in + (int64_t)c * in_len;
    float* dst = out + (int64_t)c * out_len;
    for (int64_t m = 0; m < out_len; ++m) {
      // output sample m corresponds to upsampled index m*down
      const int64_t pos_up = m * (int64_t)down;   // index in up-rate grid
      const int64_t n0 = pos_up / up;             // nearest input index
      const int phase = (int)(pos_up % up);
      double acc = 0.0;
      // h index: k such that tap aligns: up-grid offset = phase + j*up
      for (int64_t j = -(half / up) - 1; j <= (half / up) + 1; ++j) {
        const int64_t nin = n0 - j;
        if (nin < 0 || nin >= in_len) continue;
        const int64_t hidx = (int64_t)half + phase + j * up;
        if (hidx < 0 || hidx > 2 * half) continue;
        acc += (double)src[nin] * h[hidx];
      }
      dst[m] = (float)acc;
    }
  }
  return out_len;
}

}  // extern "C"
