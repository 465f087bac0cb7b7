// Native DSP core for the input pipeline: WAV decode + log-mel extraction.
//
// TPU-native equivalent of the role cuDNN/torch played in the reference's
// DataLoader workers (/root/reference/data_utils.py:37-54, stft.py): the
// host-side hot path of mel extraction — framing, Hann windowing, a
// radix-2 real FFT, triangular (slaney) mel projection, log compression —
// implemented dependency-free in C++ and exposed through a C ABI for
// ctypes. Numerics match tacotron2_tpu.audio (same formulas); see
// tests/test_native.py for the cross-check against the numpy/JAX paths.
//
// Build: native/build.sh  ->  libtaco_dsp.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ------------------------------------------------------------ real FFT
// Iterative radix-2 complex FFT over n points (n = power of two).
struct Fft {
  int n;
  std::vector<double> cos_tab, sin_tab;
  std::vector<int> rev;

  explicit Fft(int n_) : n(n_), cos_tab(n_ / 2), sin_tab(n_ / 2), rev(n_) {
    for (int i = 0; i < n / 2; ++i) {
      cos_tab[i] = std::cos(2 * kPi * i / n);
      sin_tab[i] = std::sin(2 * kPi * i / n);
    }
    int log2n = 0;
    while ((1 << log2n) < n) ++log2n;
    for (int i = 0; i < n; ++i) {
      int r = 0;
      for (int b = 0; b < log2n; ++b) r |= ((i >> b) & 1) << (log2n - 1 - b);
      rev[i] = r;
    }
  }

  // in-place FFT of interleaved (re, im) pairs
  void run(double* re, double* im) const {
    for (int i = 0; i < n; ++i) {
      if (rev[i] > i) {
        std::swap(re[i], re[rev[i]]);
        std::swap(im[i], im[rev[i]]);
      }
    }
    for (int len = 2; len <= n; len <<= 1) {
      int step = n / len;
      for (int start = 0; start < n; start += len) {
        for (int k = 0; k < len / 2; ++k) {
          double c = cos_tab[k * step], s = sin_tab[k * step];
          int a = start + k, b = start + k + len / 2;
          double tre = re[b] * c + im[b] * s;   // e^{-i theta} * x_b
          double tim = -re[b] * s + im[b] * c;
          re[b] = re[a] - tre;
          im[b] = im[a] - tim;
          re[a] += tre;
          im[a] += tim;
        }
      }
    }
  }
};

// ---------------------------------------------------- mel configuration
double HzToMel(double f) {  // slaney scale (audio/filters.py)
  constexpr double f_sp = 200.0 / 3.0;
  constexpr double min_log_hz = 1000.0;
  const double min_log_mel = min_log_hz / f_sp;
  const double log_step = std::log(6.4) / 27.0;
  if (f >= min_log_hz) return min_log_mel + std::log(f / min_log_hz) / log_step;
  return f / f_sp;
}

double MelToHz(double m) {
  constexpr double f_sp = 200.0 / 3.0;
  constexpr double min_log_hz = 1000.0;
  const double min_log_mel = min_log_hz / f_sp;
  const double log_step = std::log(6.4) / 27.0;
  if (m >= min_log_mel) return min_log_hz * std::exp(log_step * (m - min_log_mel));
  return f_sp * m;
}

struct MelContext {
  int sr, n_fft, hop, win, n_mels, n_bins;
  std::vector<float> window;                  // padded periodic hann (n_fft)
  std::vector<std::vector<float>> mel_w;      // n_mels x n_bins (sparse-ish)
  std::vector<int> mel_lo, mel_hi;            // nonzero column ranges
  std::unique_ptr<Fft> fft;
};

}  // namespace

extern "C" {

// Create an extraction context. Returns an opaque handle (or null).
void* taco_mel_init(int sr, int n_fft, int hop, int win, int n_mels,
                    double fmin, double fmax) {
  if (n_fft & (n_fft - 1)) return nullptr;  // need power of two
  auto* ctx = new MelContext;
  ctx->sr = sr;
  ctx->n_fft = n_fft;
  ctx->hop = hop;
  ctx->win = win;
  ctx->n_mels = n_mels;
  ctx->n_bins = n_fft / 2 + 1;
  ctx->fft = std::make_unique<Fft>(n_fft);

  ctx->window.assign(n_fft, 0.0f);
  int start = (n_fft - win) / 2;
  for (int i = 0; i < win; ++i)
    ctx->window[start + i] =
        static_cast<float>(0.5 - 0.5 * std::cos(2 * kPi * i / win));

  // slaney mel filterbank with area normalization
  std::vector<double> edges(n_mels + 2);
  double mlo = HzToMel(fmin), mhi = HzToMel(fmax);
  for (int i = 0; i < n_mels + 2; ++i)
    edges[i] = MelToHz(mlo + (mhi - mlo) * i / (n_mels + 1));
  ctx->mel_w.assign(n_mels, std::vector<float>(ctx->n_bins, 0.0f));
  ctx->mel_lo.assign(n_mels, ctx->n_bins);
  ctx->mel_hi.assign(n_mels, 0);
  for (int m = 0; m < n_mels; ++m) {
    double norm = 2.0 / (edges[m + 2] - edges[m]);
    for (int k = 0; k < ctx->n_bins; ++k) {
      double freq = 0.5 * sr * k / (ctx->n_bins - 1);
      double lower = (freq - edges[m]) / (edges[m + 1] - edges[m]);
      double upper = (edges[m + 2] - freq) / (edges[m + 2] - edges[m + 1]);
      double w = std::fmin(lower, upper);
      if (w > 0) {
        ctx->mel_w[m][k] = static_cast<float>(w * norm);
        ctx->mel_lo[m] = std::min(ctx->mel_lo[m], k);
        ctx->mel_hi[m] = std::max(ctx->mel_hi[m], k + 1);
      }
    }
  }
  return ctx;
}

void taco_mel_free(void* handle) { delete static_cast<MelContext*>(handle); }

// Number of frames the extractor will produce for n_samples of audio.
int taco_mel_frames(void* handle, int n_samples) {
  auto* ctx = static_cast<MelContext*>(handle);
  return 1 + n_samples / ctx->hop;
}

// Extract log-mels. audio: n_samples floats in [-1, 1]. out: row-major
// (n_mels, n_frames). Returns n_frames, or -1 on error.
int taco_mel_extract(void* handle, const float* audio, int n_samples,
                     float* out) {
  auto* ctx = static_cast<MelContext*>(handle);
  if (!ctx || n_samples <= 0) return -1;
  const int n_fft = ctx->n_fft, hop = ctx->hop, n_bins = ctx->n_bins;
  const int pad = n_fft / 2;
  const int n_frames = 1 + n_samples / hop;

  // reflect-padded sample accessor
  auto sample = [&](long i) -> double {
    i -= pad;
    if (i < 0) i = -i;                       // left reflect
    if (i >= n_samples) i = 2 * (n_samples - 1) - i;  // right reflect
    return audio[i];
  };

  std::vector<double> re(n_fft), im(n_fft), mag(n_bins);
  for (int t = 0; t < n_frames; ++t) {
    const long base = static_cast<long>(t) * hop;
    for (int i = 0; i < n_fft; ++i) {
      re[i] = sample(base + i) * ctx->window[i];
      im[i] = 0.0;
    }
    ctx->fft->run(re.data(), im.data());
    for (int k = 0; k < n_bins; ++k)
      mag[k] = std::sqrt(re[k] * re[k] + im[k] * im[k]);
    for (int m = 0; m < ctx->n_mels; ++m) {
      double acc = 0.0;
      const auto& row = ctx->mel_w[m];
      for (int k = ctx->mel_lo[m]; k < ctx->mel_hi[m]; ++k)
        acc += row[k] * mag[k];
      out[static_cast<long>(m) * n_frames + t] =
          static_cast<float>(std::log(std::fmax(acc, 1e-5)));
    }
  }
  return n_frames;
}

// ------------------------------------------------------------- WAV I/O
// Minimal RIFF/WAVE PCM16 + float32 reader (the LJSpeech format is PCM16,
// matching scipy.io.wavfile usage in reference utils.py:13-15).
// Returns sample count written to out (caller allocates via probe call
// with out=null), or -1 on error. Samples are raw integer range
// (divide by max_wav_value like the reference does).
int taco_wav_read(const char* path, float* out, int max_samples,
                  int* sample_rate) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  auto rd_u32 = [&]() {
    unsigned char b[4];
    if (std::fread(b, 1, 4, f) != 4) return -1L;
    return static_cast<long>(b[0] | b[1] << 8 | b[2] << 16 |
                             (static_cast<long>(b[3]) << 24));
  };
  auto rd_u16 = [&]() {
    unsigned char b[2];
    if (std::fread(b, 1, 2, f) != 2) return -1;
    return b[0] | b[1] << 8;
  };
  char tag[5] = {0};
  if (std::fread(tag, 1, 4, f) != 4 || std::strcmp(tag, "RIFF")) goto fail;
  rd_u32();  // riff size
  if (std::fread(tag, 1, 4, f) != 4 || std::strcmp(tag, "WAVE")) goto fail;

  {
    int fmt = 0, channels = 1, bits = 16;
    long n = -1;
    while (std::fread(tag, 1, 4, f) == 4) {
      long size = rd_u32();
      if (size < 0) goto fail;
      if (!std::strcmp(tag, "fmt ")) {
        fmt = rd_u16();
        channels = rd_u16();
        long sr = rd_u32();
        if (sample_rate) *sample_rate = static_cast<int>(sr);
        rd_u32();  // byte rate
        rd_u16();  // block align
        bits = rd_u16();
        std::fseek(f, size - 16, SEEK_CUR);
      } else if (!std::strcmp(tag, "data")) {
        int bytes_per = bits / 8;
        n = size / bytes_per / channels;
        if (!out) { std::fclose(f); return static_cast<int>(n); }
        if (n > max_samples) n = max_samples;
        std::vector<unsigned char> buf(size);
        if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size))
          goto fail;
        for (long i = 0; i < n; ++i) {
          const unsigned char* p = &buf[i * channels * bytes_per];
          if (fmt == 1 && bits == 16) {
            int16_t v = static_cast<int16_t>(p[0] | p[1] << 8);
            out[i] = static_cast<float>(v);
          } else if (fmt == 3 && bits == 32) {
            float v;
            std::memcpy(&v, p, 4);
            out[i] = v * 32768.0f;  // float wavs normalized to int16 range
          } else {
            goto fail;
          }
        }
        std::fclose(f);
        return static_cast<int>(n);
      } else {
        std::fseek(f, size + (size & 1), SEEK_CUR);
      }
    }
  }
fail:
  std::fclose(f);
  return -1;
}

}  // extern "C"
