// Native audio frontend: Kaldi-compatible log-mel fbank + streaming chunkers.
//
// Role: the reference's host-side feature extraction runs through torchaudio's
// C++ Kaldi kernels (bin/inference.py:77-78, models/AudioFeatureGating.py:65-69).
// This library owns that host stage natively for the TPU framework: framing,
// DC removal, pre-emphasis, Povey window, iterative radix-2 real FFT, mel
// filterbank and log floor, plus the stateful streaming chunkers
// (audioEncoderProcessor's 16+3-frame window, AudioFeatureGating's 28+4
// window) so the per-chunk hot path is a single C call from the serving loop.
//
// Exposed via a C ABI for ctypes (no pybind11 in the image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr float kLogFloor = 1.19209290e-07f;  // float32 epsilon (Kaldi floor)

struct FbankConfig {
  int sample_rate;
  int num_bins;
  int frame_length;  // samples
  int frame_shift;   // samples
  int nfft;          // padded pow2
  float preemph = 0.97f;
  bool remove_dc = true;
};

struct Fbank {
  FbankConfig cfg;
  std::vector<float> window;              // [frame_length] Povey
  std::vector<float> mel;                 // dense [num_bins, nfft/2+1]
  std::vector<int> mel_lo, mel_hi;        // sparse support per bin
  std::vector<int> bitrev;                // FFT bit reversal
  std::vector<float> tw_cos, tw_sin;      // twiddles per stage, flattened
  // scratch
  std::vector<float> re, im, power, frame;
};

double mel_scale(double f) { return 1127.0 * std::log(1.0 + f / 700.0); }

void init_fbank(Fbank* s) {
  const auto& c = s->cfg;
  // Povey window
  s->window.resize(c.frame_length);
  double a = 2.0 * M_PI / (c.frame_length - 1);
  for (int i = 0; i < c.frame_length; ++i)
    s->window[i] = std::pow(0.5 - 0.5 * std::cos(a * i), 0.85);

  // mel filters over bins [0, nfft/2); nyquist column zero
  int nbins_fft = c.nfft / 2;
  double fft_bin_width = double(c.sample_rate) / c.nfft;
  double mel_low = mel_scale(20.0);
  double mel_high = mel_scale(c.sample_rate / 2.0);
  double mel_delta = (mel_high - mel_low) / (c.num_bins + 1);
  s->mel.assign(size_t(c.num_bins) * (nbins_fft + 1), 0.0f);
  s->mel_lo.resize(c.num_bins);
  s->mel_hi.resize(c.num_bins);
  for (int b = 0; b < c.num_bins; ++b) {
    double left = mel_low + b * mel_delta;
    double center = left + mel_delta;
    double right = center + mel_delta;
    int lo = nbins_fft, hi = 0;
    for (int j = 0; j < nbins_fft; ++j) {
      double m = mel_scale(fft_bin_width * j);
      double up = (m - left) / (center - left);
      double down = (right - m) / (right - center);
      double w = up < down ? up : down;
      if (w > 0.0) {
        s->mel[size_t(b) * (nbins_fft + 1) + j] = float(w);
        if (j < lo) lo = j;
        if (j > hi) hi = j;
      }
    }
    s->mel_lo[b] = lo <= hi ? lo : 0;
    s->mel_hi[b] = lo <= hi ? hi : -1;
  }

  // FFT tables
  int n = c.nfft;
  s->bitrev.resize(n);
  int bits = 0;
  while ((1 << bits) < n) ++bits;
  for (int i = 0; i < n; ++i) {
    int r = 0;
    for (int b = 0; b < bits; ++b) r |= ((i >> b) & 1) << (bits - 1 - b);
    s->bitrev[i] = r;
  }
  s->tw_cos.resize(n);  // stage-major: for len=2..n, half entries
  s->tw_sin.resize(n);
  int idx = 0;
  for (int len = 2; len <= n; len <<= 1) {
    for (int k = 0; k < len / 2; ++k) {
      double ang = -2.0 * M_PI * k / len;
      s->tw_cos[idx] = float(std::cos(ang));
      s->tw_sin[idx] = float(std::sin(ang));
      ++idx;
    }
  }
  s->re.resize(n);
  s->im.resize(n);
  s->power.resize(n / 2 + 1);
  s->frame.resize(c.frame_length);
}

void fft_inplace(Fbank* s) {
  int n = s->cfg.nfft;
  float* re = s->re.data();
  float* im = s->im.data();
  // bit-reverse permutation (done by caller filling in reversed order)
  int idx = 0;
  for (int len = 2; len <= n; len <<= 1) {
    int half = len / 2;
    const float* tc = s->tw_cos.data() + idx;
    const float* ts = s->tw_sin.data() + idx;
    for (int i = 0; i < n; i += len) {
      for (int k = 0; k < half; ++k) {
        float wr = tc[k], wi = ts[k];
        float xr = re[i + k + half], xi = im[i + k + half];
        float tr = xr * wr - xi * wi;
        float ti = xr * wi + xi * wr;
        re[i + k + half] = re[i + k] - tr;
        im[i + k + half] = im[i + k] - ti;
        re[i + k] += tr;
        im[i + k] += ti;
      }
    }
    idx += half;
  }
}

void compute_frame(Fbank* s, const float* x, float* out_bins) {
  const auto& c = s->cfg;
  float* f = s->frame.data();
  std::memcpy(f, x, sizeof(float) * c.frame_length);
  if (c.remove_dc) {
    double mean = 0.0;
    for (int i = 0; i < c.frame_length; ++i) mean += f[i];
    mean /= c.frame_length;
    for (int i = 0; i < c.frame_length; ++i) f[i] -= float(mean);
  }
  if (c.preemph != 0.0f) {
    for (int i = c.frame_length - 1; i > 0; --i) f[i] -= c.preemph * f[i - 1];
    f[0] -= c.preemph * f[0];
  }
  for (int i = 0; i < c.frame_length; ++i) f[i] *= s->window[i];

  // load into FFT buffers in bit-reversed order
  int n = c.nfft;
  for (int i = 0; i < n; ++i) {
    int r = s->bitrev[i];
    s->re[i] = r < c.frame_length ? f[r] : 0.0f;
    s->im[i] = 0.0f;
  }
  fft_inplace(s);
  int nb = n / 2;
  for (int j = 0; j <= nb; ++j)
    s->power[j] = s->re[j] * s->re[j] + s->im[j] * s->im[j];

  int cols = nb + 1;
  for (int b = 0; b < c.num_bins; ++b) {
    double acc = 0.0;
    const float* w = s->mel.data() + size_t(b) * cols;
    for (int j = s->mel_lo[b]; j <= s->mel_hi[b]; ++j)
      acc += double(w[j]) * s->power[j];
    out_bins[b] = std::log(acc > kLogFloor ? float(acc) : kLogFloor);
  }
}

// Streaming chunker: waveform ring + feature context ring (both reference
// chunker state machines are instances of this shape).
struct Chunker {
  Fbank* fbank;
  int steps_per_chunk;   // new fbank frames per chunk (16 offline / 28 duplex)
  int context_steps;     // carried feature frames (3 / 4)
  int samples_per_chunk; // frame_shift * steps_per_chunk
  float scale;           // 32768 offline / 32767 duplex
  std::vector<float> sample_buf;  // [samples_per_chunk + overlap]
  std::vector<float> feat_buf;    // [(steps+context) * num_bins]
};

}  // namespace

extern "C" {

void* fbank_create(int sample_rate, int num_bins, double frame_ms,
                   double shift_ms) {
  auto* s = new Fbank();
  s->cfg.sample_rate = sample_rate;
  s->cfg.num_bins = num_bins;
  s->cfg.frame_length = int(sample_rate * frame_ms / 1000.0);
  s->cfg.frame_shift = int(sample_rate * shift_ms / 1000.0);
  int n = 1;
  while (n < s->cfg.frame_length) n <<= 1;
  s->cfg.nfft = n;
  init_fbank(s);
  return s;
}

void fbank_destroy(void* h) { delete static_cast<Fbank*>(h); }

int fbank_num_frames(void* h, int num_samples) {
  auto* s = static_cast<Fbank*>(h);
  if (num_samples < s->cfg.frame_length) return 0;
  return 1 + (num_samples - s->cfg.frame_length) / s->cfg.frame_shift;
}

// wave: [n] float (already scaled, e.g. x32768); out: [m * num_bins]
void fbank_compute(void* h, const float* wave, int n, float* out) {
  auto* s = static_cast<Fbank*>(h);
  int m = fbank_num_frames(h, n);
  for (int t = 0; t < m; ++t)
    compute_frame(s, wave + size_t(t) * s->cfg.frame_shift,
                  out + size_t(t) * s->cfg.num_bins);
}

void* chunker_create(int sample_rate, int num_bins, double frame_ms,
                     double shift_ms, int steps_per_chunk, int context_steps,
                     double scale) {
  auto* c = new Chunker();
  c->fbank = static_cast<Fbank*>(
      fbank_create(sample_rate, num_bins, frame_ms, shift_ms));
  c->steps_per_chunk = steps_per_chunk;
  c->context_steps = context_steps;
  c->samples_per_chunk = c->fbank->cfg.frame_shift * steps_per_chunk;
  c->scale = float(scale);
  int overlap = c->fbank->cfg.frame_length - c->fbank->cfg.frame_shift;
  c->sample_buf.assign(c->samples_per_chunk + overlap, 0.0f);
  c->feat_buf.assign(size_t(steps_per_chunk + context_steps) * num_bins, 0.0f);
  return c;
}

void chunker_destroy(void* h) {
  auto* c = static_cast<Chunker*>(h);
  fbank_destroy(c->fbank);
  delete c;
}

int chunker_chunk_samples(void* h) {
  return static_cast<Chunker*>(h)->samples_per_chunk;
}

int chunker_frames_per_step(void* h) {
  auto* c = static_cast<Chunker*>(h);
  return c->steps_per_chunk + c->context_steps;
}

void chunker_reset(void* h) {
  auto* c = static_cast<Chunker*>(h);
  std::fill(c->sample_buf.begin(), c->sample_buf.end(), 0.0f);
  std::fill(c->feat_buf.begin(), c->feat_buf.end(), 0.0f);
}

// audio: [samples_per_chunk] float in [-1, 1];
// out: [(steps+context) * num_bins] feature window (the model input chunk)
void chunker_process(void* h, const float* audio, float* out) {
  auto* c = static_cast<Chunker*>(h);
  const auto& fc = c->fbank->cfg;
  int overlap = fc.frame_length - fc.frame_shift;
  int nbins = fc.num_bins;
  // waveform ring: carry last `overlap` samples
  std::memmove(c->sample_buf.data(), c->sample_buf.data() + c->samples_per_chunk,
               sizeof(float) * overlap);
  for (int i = 0; i < c->samples_per_chunk; ++i)
    c->sample_buf[overlap + i] = audio[i] * c->scale;
  // feature ring: carry last `context_steps` frames
  size_t ctx = size_t(c->context_steps) * nbins;
  size_t steps = size_t(c->steps_per_chunk) * nbins;
  std::memmove(c->feat_buf.data(), c->feat_buf.data() + steps,
               sizeof(float) * ctx);
  fbank_compute(c->fbank, c->sample_buf.data(),
                int(c->sample_buf.size()), c->feat_buf.data() + ctx);
  std::memcpy(out, c->feat_buf.data(),
              sizeof(float) * (ctx + steps));
}

}  // extern "C"
