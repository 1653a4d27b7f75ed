// Native STFT phase vocoder (time stretch) for the augmentation pipeline.
//
// Drop-in fast path for data/augment.py:phase_vocoder_stretch — the hot
// transform of the training input pipeline (time_stretch + pitch_shift are
// ~80 % of the augmentation batch cost; ROOFLINE.md "Training input
// pipeline"). The algorithm mirrors the numpy implementation operation for
// operation (librosa-style: n_fft 2048, hop 512, periodic Hann, reflect
// padding, linear magnitude interpolation, wrapped-delta phase
// accumulation), so the two paths agree to FFT rounding error (~1e-10) and
// the Python path remains the numerics oracle.
//
// Matching-the-oracle details that are easy to get wrong:
//  * np.round / np.fft half-even rounding -> std::nearbyint (default
//    rounding mode) and an explicit half-even for the output length
//    (Python's round()).
//  * time_steps = np.arange(0, n_frames, rate): count is
//    ceil(n_frames / rate) in double arithmetic, value i*rate.
//  * np.fft.irfft ignores the imaginary parts of bins 0 and n/2.
//
// Build: make -C native (compiled into libaudioio.so; C ABI via ctypes in
// audio/native.py).

#include <cmath>
#include <complex>
#include <cstdint>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;
constexpr int kNFFT = 2048;
constexpr int kHop = 512;
constexpr int kPad = kNFFT / 2;
constexpr int kBins = kNFFT / 2 + 1;

// Iterative radix-2 complex FFT over split re/im arrays with per-stage
// CONTIGUOUS twiddle tables (the classic layout fix: tw[k*step] strided
// access and std::complex aliasing made the naive version ~10x slower than
// pocketfft; this one is within ~2x, enough to win overall).
struct FftTables {
  // stage s (len = 2^(s+1)): half = 2^s twiddles, stored contiguously;
  // twiddles depend only on len, so the kNFFT/2-point transforms used by
  // the real pack/unpack just read the prefix of stages
  std::vector<double> tw_re, tw_im;  // forward sign; inverse negates im
  std::vector<int> tw_off;           // offset of stage s's table
  std::vector<int> half_rev;         // bit-reverse permutation for kNFFT/2
  FftTables() : half_rev(kNFFT / 2) {
    constexpr int H = kNFFT / 2;
    int lg = 0;
    while ((1 << lg) < H) ++lg;
    for (int i = 0; i < H; ++i) {
      int r = 0;
      for (int b = 0; b < lg; ++b) r |= ((i >> b) & 1) << (lg - 1 - b);
      half_rev[i] = r;
    }
    int off = 0;
    for (int len = 2; len <= kNFFT; len <<= 1) {
      tw_off.push_back(off);
      int half = len >> 1;
      for (int k = 0; k < half; ++k) {
        double ang = -2.0 * kPi * k / len;
        tw_re.push_back(std::cos(ang));
        tw_im.push_back(std::sin(ang));
      }
      off += half;
    }
  }
};

const FftTables& tables() {
  static FftTables t;
  return t;
}

// rfft of a real length-kNFFT signal via one complex FFT of size kNFFT/2
// (even/odd packing), writing kBins magnitudes/phases directly.
void rfft_real(const double* x, double* out_re, double* out_im) {
  constexpr int H = kNFFT / 2;
  const FftTables& t = tables();

  // pack: z[i] = x[2i] + j*x[2i+1], FFT of size H
  double zr[H], zi[H];
  for (int i = 0; i < H; ++i) {
    zr[i] = x[2 * i];
    zi[i] = x[2 * i + 1];
  }
  for (int i = 0; i < H; ++i) {
    int j = t.half_rev[i];
    if (i < j) {
      std::swap(zr[i], zr[j]);
      std::swap(zi[i], zi[j]);
    }
  }
  int stage = 0;
  for (int len = 2; len <= H; len <<= 1, ++stage) {
    int half = len >> 1;
    const double* wr = t.tw_re.data() + t.tw_off[stage];
    const double* wi = t.tw_im.data() + t.tw_off[stage];
    for (int i = 0; i < H; i += len) {
      double* ar = zr + i;
      double* ai = zi + i;
      for (int k = 0; k < half; ++k) {
        double tr = wr[k] * ar[k + half] - wi[k] * ai[k + half];
        double ti = wr[k] * ai[k + half] + wi[k] * ar[k + half];
        double ur = ar[k], ui = ai[k];
        ar[k] = ur + tr;
        ai[k] = ui + ti;
        ar[k + half] = ur - tr;
        ai[k + half] = ui - ti;
      }
    }
  }
  // unpack: X[k] = (Z[k] + conj(Z[H-k]))/2 + e^{-j*2*pi*k/N} * (Z[k] -
  // conj(Z[H-k])) / (2j),  k = 0..H (Z[H] := Z[0])
  for (int k = 0; k <= H; ++k) {
    int kr = (H - k) & (H - 1);  // H-k mod H
    double er = 0.5 * (zr[k & (H - 1)] + zr[kr]);
    double ei = 0.5 * (zi[k & (H - 1)] - zi[kr]);
    double orr = 0.5 * (zi[k & (H - 1)] + zi[kr]);
    double oi = -0.5 * (zr[k & (H - 1)] - zr[kr]);
    double ang = -2.0 * kPi * k / kNFFT;
    double cr = std::cos(ang), ci = std::sin(ang);
    out_re[k] = er + cr * orr - ci * oi;
    out_im[k] = ei + cr * oi + ci * orr;
  }
}

// Python round(): half to even.
long long round_half_even(double v) {
  double f = std::floor(v);
  double d = v - f;
  long long n = static_cast<long long>(f);
  if (d > 0.5 || (d == 0.5 && (n & 1))) ++n;
  return n;
}

// Inverse of rfft_real via the same half-size packing: given the hermitian
// half-spectrum X[0..H] (imag of bins 0 and H already zero), produce the
// length-kNFFT real signal. Z[k] = E[k] + j*O[k] with
// E = (X[k] + conj(X[H-k]))/2, O = (X[k] - conj(X[H-k]))/2 * e^{+2pi jk/N};
// x = interleave(IFFT_H(Z)).
void irfft_real(const double* Xre, const double* Xim, double* out) {
  constexpr int H = kNFFT / 2;
  const FftTables& t = tables();

  double zr[H], zi[H];
  for (int k = 0; k < H; ++k) {
    int kr = H - k;  // index into X (0..H)
    double er = 0.5 * (Xre[k] + Xre[kr]);
    double ei = 0.5 * (Xim[k] - Xim[kr]);
    double dr = 0.5 * (Xre[k] - Xre[kr]);
    double di = 0.5 * (Xim[k] + Xim[kr]);
    double ang = 2.0 * kPi * k / kNFFT;
    double cr = std::cos(ang), ci = std::sin(ang);
    double orr = dr * cr - di * ci;
    double oi = dr * ci + di * cr;
    // Z = E + j*O
    zr[k] = er - oi;
    zi[k] = ei + orr;
  }
  for (int i = 0; i < H; ++i) {
    int j = t.half_rev[i];
    if (i < j) {
      std::swap(zr[i], zr[j]);
      std::swap(zi[i], zi[j]);
    }
  }
  int stage = 0;
  for (int len = 2; len <= H; len <<= 1, ++stage) {
    int half = len >> 1;
    const double* wr = t.tw_re.data() + t.tw_off[stage];
    const double* wi = t.tw_im.data() + t.tw_off[stage];
    for (int i = 0; i < H; i += len) {
      double* ar = zr + i;
      double* ai = zi + i;
      for (int k = 0; k < half; ++k) {
        double tr = wr[k] * ar[k + half] + wi[k] * ai[k + half];
        double ti = wr[k] * ai[k + half] - wi[k] * ar[k + half];
        double ur = ar[k], ui = ai[k];
        ar[k] = ur + tr;
        ai[k] = ui + ti;
        ar[k + half] = ur - tr;
        ai[k + half] = ui - ti;
      }
    }
  }
  const double inv = 1.0 / H;
  for (int i = 0; i < H; ++i) {
    out[2 * i] = zr[i] * inv;
    out[2 * i + 1] = zi[i] * inv;
  }
}

}  // namespace

extern "C" {

long long audioio_stretch_out_length(long long n, double rate) {
  if (rate <= 0.0) return -1;
  return round_half_even(static_cast<double>(n) / rate);
}

// Time-stretch x by `rate`; out must hold audioio_stretch_out_length(n,
// rate) doubles. Requires n > kPad: the single reflection below indexes
// x[kPad] and x[n-1-kPad], and numpy's np.pad switches to multi-reflection
// when pad >= n — that edge stays on the Python path. Returns 0 on success.
int audioio_phase_vocoder_stretch(const double* x, long long n, double rate,
                                  double* out) {
  if (rate <= 0.0 || n <= kPad) return 1;
  long long target_len = audioio_stretch_out_length(n, rate);
  if (target_len <= 0) return 1;

  // periodic Hann (np.hanning(kNFFT + 1)[:-1])
  std::vector<double> window(kNFFT);
  for (int i = 0; i < kNFFT; ++i)
    window[i] = 0.5 - 0.5 * std::cos(2.0 * kPi * i / kNFFT);

  // reflect padding (np.pad mode="reflect": edge not repeated)
  long long np_len = n + 2 * kPad;
  std::vector<double> xp(np_len);
  for (long long i = 0; i < kPad; ++i) xp[i] = x[kPad - i];
  for (long long i = 0; i < n; ++i) xp[kPad + i] = x[i];
  for (long long i = 0; i < kPad; ++i) xp[kPad + n + i] = x[n - 2 - i];

  int n_frames = static_cast<int>(1 + (np_len - kNFFT) / kHop);
  // forward STFT: mag/phase per (frame, bin)
  std::vector<double> mag(static_cast<size_t>(n_frames) * kBins);
  std::vector<double> phase(static_cast<size_t>(n_frames) * kBins);
#pragma omp parallel for schedule(static)
  for (int f = 0; f < n_frames; ++f) {
    double buf[kNFFT], sre[kBins], sim[kBins];
    const double* src = xp.data() + static_cast<long long>(f) * kHop;
    for (int i = 0; i < kNFFT; ++i) buf[i] = src[i] * window[i];
    rfft_real(buf, sre, sim);
    for (int k = 0; k < kBins; ++k) {
      mag[static_cast<size_t>(f) * kBins + k] = std::hypot(sre[k], sim[k]);
      phase[static_cast<size_t>(f) * kBins + k] = std::atan2(sim[k], sre[k]);
    }
  }

  // time steps (np.arange(0, n_frames, rate))
  int n_out = static_cast<int>(
      std::ceil(static_cast<double>(n_frames) / rate));
  if (n_out < 1) n_out = (n_frames > 0) ? 1 : 0;

  // interpolated magnitudes + accumulated phases, then overlap-add iSTFT
  long long out_buf_len = kNFFT + static_cast<long long>(kHop) * (n_out - 1);
  std::vector<double> acc(out_buf_len, 0.0), wsum(out_buf_len, 0.0);
  std::vector<double> phase_acc(kBins);
  // phi_advance[k] = linspace(0, pi*kHop, kBins) = pi*kHop*k/(kBins-1)
  std::vector<double> phi_advance(kBins);
  for (int k = 0; k < kBins; ++k)
    phi_advance[k] = kPi * kHop * k / (kBins - 1);
  for (int k = 0; k < kBins; ++k) phase_acc[k] = phase[k];  // frame 0

  std::vector<double> spec_re(kBins), spec_im(kBins), frame(kNFFT);
  for (int t = 0; t < n_out; ++t) {
    double ts = t * rate;
    int i0 = static_cast<int>(ts);  // astype(int): truncation
    int i1 = (i0 + 1 < n_frames) ? i0 + 1 : n_frames - 1;
    double frac = ts - i0;
    const double* m0 = mag.data() + static_cast<size_t>(i0) * kBins;
    const double* m1 = mag.data() + static_cast<size_t>(i1) * kBins;
    // spectrum for this output frame from the CURRENT phase accumulator
    for (int k = 0; k < kBins; ++k) {
      double m = (1.0 - frac) * m0[k] + frac * m1[k];
      spec_re[k] = m * std::cos(phase_acc[k]);
      spec_im[k] = m * std::sin(phase_acc[k]);
    }
    // np.fft.irfft ignores the imag parts of bins 0 and n/2
    spec_im[0] = 0.0;
    spec_im[kBins - 1] = 0.0;
    irfft_real(spec_re.data(), spec_im.data(), frame.data());
    double* dst = acc.data() + static_cast<long long>(t) * kHop;
    double* wdst = wsum.data() + static_cast<long long>(t) * kHop;
    for (int i = 0; i < kNFFT; ++i) {
      dst[i] += frame[i] * window[i];
      wdst[i] += window[i] * window[i];
    }
    // advance the phase accumulator to the next step
    const double* p0 = phase.data() + static_cast<size_t>(i0) * kBins;
    const double* p1 = phase.data() + static_cast<size_t>(i1) * kBins;
    for (int k = 0; k < kBins; ++k) {
      double dphase = p1[k] - p0[k] - phi_advance[k];
      dphase -= 2.0 * kPi * std::nearbyint(dphase / (2.0 * kPi));
      phase_acc[k] += phi_advance[k] + dphase;
    }
  }

  // normalize, drop the analysis padding, fit to target length
  for (long long i = 0; i < out_buf_len; ++i) {
    double w = wsum[i] > 1e-10 ? wsum[i] : 1e-10;
    acc[i] /= w;
  }
  long long avail = out_buf_len - kPad;
  for (long long i = 0; i < target_len; ++i)
    out[i] = (i < avail) ? acc[kPad + i] : 0.0;
  return 0;
}

}  // extern "C"
