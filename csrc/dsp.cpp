// Native host-side DSP for the serving path: kaldi fbank + resampling.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the host
// runtime work the reference delegated to torchaudio/librosa C++ kernels:
// per-request feature extraction (kaldi-compliant log-mel fbank) and
// polyphase resampling, callable from Python via ctypes (utils/native.py)
// with bit-equivalent numpy fallbacks (frontend/features.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libindextts_dsp.so dsp.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------------------
// iterative radix-2 complex FFT (n must be a power of two)
// ---------------------------------------------------------------------------
void fft_radix2(std::vector<double>& re, std::vector<double>& im) {
  const size_t n = re.size();
  // bit reversal
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * kPi / static_cast<double>(len);
    const double wr = std::cos(ang), wi = std::sin(ang);
    for (size_t i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (size_t k = 0; k < len / 2; ++k) {
        const size_t a = i + k, b = i + k + len / 2;
        const double tr = re[b] * cr - im[b] * ci;
        const double ti = re[b] * ci + im[b] * cr;
        re[b] = re[a] - tr;
        im[b] = im[a] - ti;
        re[a] += tr;
        im[a] += ti;
        const double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

double hz_to_mel_kaldi(double f) { return 1127.0 * std::log(1.0 + f / 700.0); }

}  // namespace

extern "C" {

// Kaldi-style mel filterbank (matches frontend/features.py kaldi_mel_filters):
// out: (n_freqs, num_bins) row-major.
void kaldi_mel_filters(int num_bins, int fft_length, int sample_rate,
                       double low_freq, double high_freq, float* out) {
  const int n_freqs = fft_length / 2 + 1;
  const double low_mel = hz_to_mel_kaldi(low_freq);
  const double high_mel = hz_to_mel_kaldi(high_freq);
  std::vector<double> mel_points(num_bins + 2);
  for (int i = 0; i < num_bins + 2; ++i)
    mel_points[i] = low_mel + (high_mel - low_mel) * i / (num_bins + 1);
  const double bin_width = static_cast<double>(sample_rate) / fft_length;
  for (int f = 0; f < n_freqs; ++f) {
    const double mel = hz_to_mel_kaldi(bin_width * f);
    for (int b = 0; b < num_bins; ++b) {
      const double left = mel_points[b], center = mel_points[b + 1],
                   right = mel_points[b + 2];
      double w = 0.0;
      const double up = (mel - left) / (center - left);
      const double down = (right - mel) / (right - center);
      w = up < down ? up : down;
      out[f * num_bins + b] = static_cast<float>(w > 0.0 ? w : 0.0);
    }
  }
}

// Kaldi fbank core (matches frontend/features.py kaldi_fbank_core):
// snip-edges framing, per-frame DC removal, preemphasis (edge-replicated),
// povey window, power spectrum, mel projection, log with floor.
// wav: (n,) float; out: (num_frames, num_bins) row-major float32.
// Returns the number of frames written.
int kaldi_fbank(const float* wav, int64_t n, int num_bins, int sample_rate,
                int frame_length, int hop, int fft_length, double preemph,
                double low_freq, double high_freq, double mel_floor,
                float* out) {
  if (n < frame_length) return 0;
  const int num_frames = 1 + static_cast<int>((n - frame_length) / hop);
  const int n_freqs = fft_length / 2 + 1;

  // povey window
  std::vector<double> window(frame_length);
  for (int i = 0; i < frame_length; ++i) {
    const double h = 0.5 - 0.5 * std::cos(2.0 * kPi * i / (frame_length - 1));
    window[i] = std::pow(h, 0.85);
  }
  std::vector<float> filters(static_cast<size_t>(n_freqs) * num_bins);
  kaldi_mel_filters(num_bins, fft_length, sample_rate, low_freq, high_freq,
                    filters.data());

  std::vector<double> frame(frame_length), re(fft_length), im(fft_length);
  std::vector<double> power(n_freqs);
  for (int t = 0; t < num_frames; ++t) {
    const float* src = wav + static_cast<int64_t>(t) * hop;
    double mean = 0.0;
    for (int i = 0; i < frame_length; ++i) mean += src[i];
    mean /= frame_length;
    for (int i = 0; i < frame_length; ++i) frame[i] = src[i] - mean;
    // preemphasis with first-sample replication
    for (int i = frame_length - 1; i > 0; --i)
      frame[i] -= preemph * frame[i - 1];
    frame[0] -= preemph * frame[0];
    for (int i = 0; i < frame_length; ++i) frame[i] *= window[i];

    std::fill(re.begin(), re.end(), 0.0);
    std::fill(im.begin(), im.end(), 0.0);
    std::copy(frame.begin(), frame.end(), re.begin());
    fft_radix2(re, im);
    for (int f = 0; f < n_freqs; ++f) power[f] = re[f] * re[f] + im[f] * im[f];

    for (int b = 0; b < num_bins; ++b) {
      double acc = 0.0;
      for (int f = 0; f < n_freqs; ++f)
        acc += power[f] * filters[static_cast<size_t>(f) * num_bins + b];
      if (acc < mel_floor) acc = mel_floor;
      out[static_cast<size_t>(t) * num_bins + b] =
          static_cast<float>(std::log(acc));
    }
  }
  return num_frames;
}

// Windowed-sinc polyphase resampler (kaiser window, beta 8.555 ~ scipy
// resample_poly default quality). in: (n,), out buffer sized
// ceil(n * up / down). Returns output length.
int64_t resample_poly(const float* in, int64_t n, int up, int down,
                      float* out) {
  // FIR lowpass at min(1/up, 1/down) of the upsampled Nyquist
  const int half_taps_per_phase = 10;
  const int taps = 2 * half_taps_per_phase * (up > down ? up : down) + 1;
  const double cutoff = 1.0 / (up > down ? up : down);
  const double beta = 8.555;
  // kaiser window via I0
  auto bessel_i0 = [](double x) {
    double sum = 1.0, term = 1.0;
    for (int k = 1; k < 32; ++k) {
      term *= (x / (2.0 * k)) * (x / (2.0 * k));
      sum += term;
      if (term < 1e-16 * sum) break;
    }
    return sum;
  };
  const double i0b = bessel_i0(beta);
  std::vector<double> h(taps);
  const int mid = taps / 2;
  for (int i = 0; i < taps; ++i) {
    const double t = i - mid;
    const double sinc =
        t == 0.0 ? cutoff : std::sin(kPi * cutoff * t) / (kPi * t);
    const double r = 2.0 * i / (taps - 1) - 1.0;
    const double w = bessel_i0(beta * std::sqrt(1.0 - r * r)) / i0b;
    h[i] = sinc * w * up;
  }
  const int64_t out_len = (n * up + down - 1) / down;
  for (int64_t m = 0; m < out_len; ++m) {
    // output sample m corresponds to upsampled index m*down
    const int64_t u = m * down;
    double acc = 0.0;
    // x_up[j] = in[j/up] when j%up==0; convolve with h centered at u
    const int64_t j_lo = u - mid;
    // first input index >= ceil(j_lo / up)
    int64_t k0 = j_lo >= 0 ? (j_lo + up - 1) / up : -((-j_lo) / up);
    for (int64_t k = k0;; ++k) {
      const int64_t j = k * up;
      const int64_t tap = j - j_lo;
      if (tap >= taps) break;
      if (k >= 0 && k < n && tap >= 0) acc += in[k] * h[tap];
    }
    out[m] = static_cast<float>(acc);
  }
  return out_len;
}

// int16 PCM -> float32 [-1, 1]
void pcm16_to_float(const int16_t* in, int64_t n, float* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] / 32768.0f;
}

// float32 -> int16 with clamp (reference: wav = clamp(32767*wav, ±32767))
void float_to_pcm16(const float* in, int64_t n, int16_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i] * 32767.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32767.0f) v = -32767.0f;
    out[i] = static_cast<int16_t>(v);
  }
}

}  // extern "C"
