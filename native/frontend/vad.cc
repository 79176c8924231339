// Native streaming VAD core: log-mel fbank + GRU frame classifier.
//
// Role: the reference runs silero-vad (a packaged native model) per 32 ms
// chunk per identity via the absent `periphrals.PureVAD`
// (bin/dialog_state_pred.py:134, 477). Our learned VAD's inference twin
// (duplex/vad.py LearnedVAD._prob) is a per-frame numpy GRU loop — measured
// ~740 us per 32 ms chunk, i.e. ~3 host cores at 128 duplex streams, which
// makes the Python loop the HOST-side capacity ceiling of the serving stack.
// This kernel owns the whole probability path natively (feature extraction
// through GRU through the output sigmoid), one C call per chunk.
//
// Semantics mirror LearnedVAD._prob exactly:
//   wav = carry ++ audio; if len < frame_length: buffer, emit nothing
//   m frames of 16 ms / 8 ms Kaldi fbank over wav*32768
//   x = (feats - mean) * scale            (per-bin normalization)
//   per frame: z = sig([x,h]Wz+bz); r = sig([x,h]Wr+br);
//              hh = tanh([x, r*h]Wh+bh); h = (1-z)h + z*hh
//              p = sig(h . wo + bo)
//   carry = wav[m*frame_shift:]; return mean(p)
//
// The GRU weights arrive packed row-major exactly as stored in the .npz
// (wz/wr/wh: [in+hidden, hidden], b*: [hidden], wo: [hidden], bo scalar).

#include <cmath>
#include <cstring>
#include <vector>

// from fbank.cc (same translation unit set in build.sh)
extern "C" {
void* fbank_create(int sample_rate, int num_bins, double frame_ms,
                   double shift_ms);
void fbank_destroy(void* h);
int fbank_num_frames(void* h, int num_samples);
void fbank_compute(void* h, const float* wave, int n, float* out);
}

namespace {

struct VadGru {
  void* fbank = nullptr;
  int num_bins = 0;
  int hidden = 0;
  int frame_length = 0;
  int frame_shift = 0;
  // packed weights: [in+hidden, hidden] row-major
  std::vector<float> wz, wr, wh, bz, br, bh, wo, mean, scale;
  float bo = 0.0f;
  // streaming state
  std::vector<float> h;      // [hidden]
  std::vector<float> carry;  // < frame_length + frame_shift samples
  // scratch
  std::vector<float> wav, feats, x, z, r, hh, xrh;
};

inline float sigmoidf(float v) { return 1.0f / (1.0f + std::exp(-v)); }

// y[hidden] = concat(a[na], b[nb]) @ W[(na+nb), hidden] + bias
void affine2(const float* a, int na, const float* b, int nb, const float* W,
             const float* bias, int hidden, float* y) {
  for (int j = 0; j < hidden; ++j) y[j] = bias[j];
  for (int i = 0; i < na; ++i) {
    const float v = a[i];
    if (v == 0.0f) continue;
    const float* row = W + size_t(i) * hidden;
    for (int j = 0; j < hidden; ++j) y[j] += v * row[j];
  }
  for (int i = 0; i < nb; ++i) {
    const float v = b[i];
    if (v == 0.0f) continue;
    const float* row = W + size_t(na + i) * hidden;
    for (int j = 0; j < hidden; ++j) y[j] += v * row[j];
  }
}

}  // namespace

extern "C" {

void* vad_create(int sample_rate, double frame_ms, double shift_ms,
                 int num_bins, int hidden, const float* wz, const float* wr,
                 const float* wh, const float* bz, const float* br,
                 const float* bh, const float* wo, float bo,
                 const float* mean, const float* scale) {
  auto* s = new VadGru();
  s->fbank = fbank_create(sample_rate, num_bins, frame_ms, shift_ms);
  s->num_bins = num_bins;
  s->hidden = hidden;
  s->frame_length = int(sample_rate * frame_ms / 1000.0);
  s->frame_shift = int(sample_rate * shift_ms / 1000.0);
  size_t wn = size_t(num_bins + hidden) * hidden;
  s->wz.assign(wz, wz + wn);
  s->wr.assign(wr, wr + wn);
  s->wh.assign(wh, wh + wn);
  s->bz.assign(bz, bz + hidden);
  s->br.assign(br, br + hidden);
  s->bh.assign(bh, bh + hidden);
  s->wo.assign(wo, wo + hidden);
  s->bo = bo;
  s->mean.assign(mean, mean + num_bins);
  s->scale.assign(scale, scale + num_bins);
  s->h.assign(hidden, 0.0f);
  s->z.resize(hidden);
  s->r.resize(hidden);
  s->hh.resize(hidden);
  s->xrh.resize(hidden);
  return s;
}

void vad_destroy(void* h) {
  auto* s = static_cast<VadGru*>(h);
  fbank_destroy(s->fbank);
  delete s;
}

void vad_reset(void* h) {
  auto* s = static_cast<VadGru*>(h);
  std::fill(s->h.begin(), s->h.end(), 0.0f);
  s->carry.clear();
}

// audio: [n] float in [-1, 1]. Returns 1 and writes the mean frame speech
// probability to *prob when at least one frame completed; 0 when the samples
// were buffered (prob untouched).
int vad_push(void* h, const float* audio, int n, float* prob) {
  auto* s = static_cast<VadGru*>(h);
  s->wav.resize(s->carry.size() + n);
  if (!s->carry.empty())
    std::memcpy(s->wav.data(), s->carry.data(),
                sizeof(float) * s->carry.size());
  for (int i = 0; i < n; ++i)
    s->wav[s->carry.size() + i] = audio[i] * 32768.0f;
  int total = int(s->wav.size());
  if (total < s->frame_length) {
    s->carry.assign(s->wav.begin(), s->wav.end());
    return 0;
  }
  int m = 1 + (total - s->frame_length) / s->frame_shift;
  s->carry.assign(s->wav.begin() + size_t(m) * s->frame_shift, s->wav.end());

  s->feats.resize(size_t(m) * s->num_bins);
  fbank_compute(s->fbank, s->wav.data(), total, s->feats.data());

  double psum = 0.0;
  s->x.resize(s->num_bins);
  for (int t = 0; t < m; ++t) {
    const float* f = s->feats.data() + size_t(t) * s->num_bins;
    for (int j = 0; j < s->num_bins; ++j)
      s->x[j] = (f[j] - s->mean[j]) * s->scale[j];
    affine2(s->x.data(), s->num_bins, s->h.data(), s->hidden, s->wz.data(),
            s->bz.data(), s->hidden, s->z.data());
    affine2(s->x.data(), s->num_bins, s->h.data(), s->hidden, s->wr.data(),
            s->br.data(), s->hidden, s->r.data());
    for (int j = 0; j < s->hidden; ++j) {
      s->z[j] = sigmoidf(s->z[j]);
      s->xrh[j] = sigmoidf(s->r[j]) * s->h[j];
    }
    affine2(s->x.data(), s->num_bins, s->xrh.data(), s->hidden, s->wh.data(),
            s->bh.data(), s->hidden, s->hh.data());
    float acc = s->bo;
    for (int j = 0; j < s->hidden; ++j) {
      float hj = (1.0f - s->z[j]) * s->h[j] + s->z[j] * std::tanh(s->hh[j]);
      s->h[j] = hj;
      acc += hj * s->wo[j];
    }
    psum += sigmoidf(acc);
  }
  *prob = float(psum / m);
  return 1;
}

}  // extern "C"
