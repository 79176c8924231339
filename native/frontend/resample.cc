// Polyphase windowed-sinc resampler (host-side, streaming-capable).
//
// Same filter design as freeze_omni_tpu/frontend/wav.py::resample (and
// torchaudio's sinc_interp_hann Resample, the reference's choice at
// bin/inference.py:110): lowpass_filter_width=6, hann^2 window, rolloff 0.99.
// The one-shot path bit-matches the Python implementation (both accumulate in
// double); the streaming push/flush path emits identical samples chunk by
// chunk so the serving ingest can resample arbitrary-rate client audio with
// bounded memory and no end-of-stream dependency.

#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Resampler {
  int orig_sr = 0;
  int new_sr = 0;
  int up = 1;    // new_sr / gcd
  int down = 1;  // orig_sr / gcd
  int width = 0;
  int klen = 0;                  // 2*width + up
  std::vector<double> kernel;    // [up, klen], row-major

  // streaming state
  std::vector<float> hist;   // raw input samples from index hist_start
  long long hist_start = 0;  // absolute input index of hist[0]
  long long n_in = 0;        // total input samples received
  long long next_block = 0;  // next output block j to compute
  long long emitted = 0;     // output samples emitted so far
};

long long gcd_ll(long long a, long long b) {
  while (b) { long long t = a % b; a = b; b = t; }
  return a;
}

void init_kernel(Resampler* s, int lowpass_filter_width, double rolloff) {
  const double base_freq =
      (s->orig_sr < s->new_sr ? s->orig_sr : s->new_sr) * rolloff / 2.0;
  s->width = static_cast<int>(
      std::ceil(lowpass_filter_width * s->orig_sr / (2.0 * base_freq)));
  s->klen = 2 * s->width + s->up;
  s->kernel.assign(static_cast<size_t>(s->up) * s->klen, 0.0);
  const double scale = 2.0 * base_freq / s->orig_sr;
  for (int p = 0; p < s->up; ++p) {
    for (int k = 0; k < s->klen; ++k) {
      double t = (static_cast<double>(-p) / s->new_sr +
                  static_cast<double>(k - s->width) / s->orig_sr) *
                 (2.0 * base_freq);
      if (t < -lowpass_filter_width) t = -lowpass_filter_width;
      if (t > lowpass_filter_width) t = lowpass_filter_width;
      const double w =
          std::cos(t * M_PI / lowpass_filter_width / 2.0);
      const double window = w * w;
      const double sinc =
          t == 0.0 ? 1.0 : std::sin(M_PI * t) / (M_PI * t);
      s->kernel[static_cast<size_t>(p) * s->klen + k] = sinc * window * scale;
    }
  }
}

// Output sample count for n input samples (matches the Python target_len).
long long out_len_for(const Resampler* s, long long n) {
  // ceil(new_sr * n / orig_sr)
  return (static_cast<long long>(s->new_sr) * n + s->orig_sr - 1) / s->orig_sr;
}

// Compute block j (all `up` phases) into out. Input sample x[i] is read as 0
// outside [0, limit); `get` resolves absolute input index -> value using the
// history buffer.
void compute_block(const Resampler* s, long long j, long long limit,
                   double* out) {
  const long long first = j * s->down - s->width;  // absolute input index of k=0
  for (int p = 0; p < s->up; ++p) {
    const double* krow = s->kernel.data() + static_cast<size_t>(p) * s->klen;
    double acc = 0.0;
    for (int k = 0; k < s->klen; ++k) {
      const long long i = first + k;
      if (i < 0 || i >= limit) continue;
      const long long h = i - s->hist_start;
      acc += static_cast<double>(s->hist[static_cast<size_t>(h)]) * krow[k];
    }
    out[p] = acc;
  }
}

}  // namespace

extern "C" {

void* resample_create(int orig_sr, int new_sr, int lowpass_filter_width,
                      double rolloff) {
  if (orig_sr <= 0 || new_sr <= 0) return nullptr;
  auto* s = new Resampler();
  s->orig_sr = orig_sr;
  s->new_sr = new_sr;
  const long long g = gcd_ll(orig_sr, new_sr);
  s->up = static_cast<int>(new_sr / g);
  s->down = static_cast<int>(orig_sr / g);
  init_kernel(s, lowpass_filter_width, rolloff);
  return s;
}

void resample_destroy(void* h) { delete static_cast<Resampler*>(h); }

void resample_reset(void* h) {
  auto* s = static_cast<Resampler*>(h);
  s->hist.clear();
  s->hist_start = 0;
  s->n_in = 0;
  s->next_block = 0;
  s->emitted = 0;
}

long long resample_out_len(void* h, long long n) {
  return out_len_for(static_cast<Resampler*>(h), n);
}

// Streaming: upper bound on samples push may emit for n new input samples.
long long resample_push_cap(void* h, long long n) {
  auto* s = static_cast<Resampler*>(h);
  return (n / s->down + 2) * s->up;
}

// Push n input samples; emits every output block whose full kernel support is
// already available. Returns the number of output samples written.
long long resample_push(void* h, const float* x, long long n, float* out) {
  auto* s = static_cast<Resampler*>(h);
  s->hist.insert(s->hist.end(), x, x + n);
  s->n_in += n;
  long long wrote = 0;
  std::vector<double> block(static_cast<size_t>(s->up));
  // Block j reads absolute input [j*down - width, j*down - width + klen);
  // computable once that window needs no future sample.
  while (s->next_block * s->down - s->width + s->klen <= s->n_in) {
    compute_block(s, s->next_block, s->n_in, block.data());
    for (int p = 0; p < s->up; ++p)
      out[wrote++] = static_cast<float>(block[static_cast<size_t>(p)]);
    ++s->next_block;
  }
  s->emitted += wrote;
  // retain only what future blocks can still read; when down > klen the next
  // block's window can start beyond the received samples — clamp so
  // hist_start stays aligned with the absolute index of the next append
  long long need_from = s->next_block * s->down - s->width;
  if (need_from > s->n_in) need_from = s->n_in;
  if (need_from > s->hist_start) {
    const long long drop = need_from - s->hist_start;
    if (drop >= static_cast<long long>(s->hist.size())) {
      s->hist.clear();
    } else {
      s->hist.erase(s->hist.begin(), s->hist.begin() + drop);
    }
    s->hist_start = need_from;
  }
  return wrote;
}

// Cap for flush output.
long long resample_flush_cap(void* h) {
  auto* s = static_cast<Resampler*>(h);
  const long long total = out_len_for(s, s->n_in);
  const long long rem = total - s->emitted;
  return rem > 0 ? rem : 0;
}

// End of stream: compute the remaining blocks with zero padding and truncate
// to the exact one-shot output length. Returns samples written.
long long resample_flush(void* h, float* out) {
  auto* s = static_cast<Resampler*>(h);
  const long long total = out_len_for(s, s->n_in);
  long long wrote = 0;
  std::vector<double> block(static_cast<size_t>(s->up));
  while (s->emitted + wrote < total) {
    compute_block(s, s->next_block, s->n_in, block.data());
    for (int p = 0; p < s->up && s->emitted + wrote < total; ++p)
      out[wrote++] = static_cast<float>(block[static_cast<size_t>(p)]);
    ++s->next_block;
  }
  s->emitted += wrote;
  return wrote;
}

// One-shot convenience: x[n] -> out[resample_out_len(h, n)] on a fresh state.
void resample_compute(void* h, const float* x, long long n, float* out) {
  auto* s = static_cast<Resampler*>(h);
  resample_reset(h);
  long long wrote = resample_push(h, x, n, out);
  wrote += resample_flush(h, out + wrote);
  resample_reset(h);
  (void)s;
  (void)wrote;
}

}  // extern "C"
