// Native audio loader: WAV decode + polyphase sinc resample.
//
// TPU-native equivalent of the reference's C audio stack (libsndfile decode
// + soxr/torchaudio resample, SURVEY §2.3): the host-side data loader that
// feeds device buffers. Exposed through a C ABI consumed via ctypes
// (audio/native.py); the Python implementations in audio/io.py and
// ops/resample.py remain as the reference fallback and the numerics oracle
// (the resampler here reproduces torchaudio.functional.resample with
// sinc_interp_hann, lowpass_filter_width=6, rolloff=0.99 — identical to
// ops/resample.py, which is tested against golden invariants).
//
// Build: make -C native   (produces libaudioio.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct WavInfo {
  uint16_t format = 0;       // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  const uint8_t* data = nullptr;  // points into the file buffer
  size_t data_size = 0;
};

// Chunk ids that legitimately trail a data chunk (mirror of
// audio/io.py KNOWN_TRAILING_CHUNKS — keep the two lists in sync): used to
// tell an explicitly empty data chunk followed by metadata apart from a
// streaming-recorder size placeholder whose samples run to EOF.
static const char* kKnownTrailingChunks[] = {
    "LIST", "fact", "cue ", "smpl", "inst", "bext", "junk", "JUNK",
    "PAD ", "id3 ", "ID3 ", "afsp", "FLLR", "plst", "note", "labl"};

static bool is_known_trailing_chunk(const uint8_t* buf, size_t len,
                                    size_t pos) {
  if (pos + 8 > len) return false;
  uint32_t size;
  memcpy(&size, buf + pos + 4, 4);
  if (static_cast<uint64_t>(pos) + 8 + size > len + 1)  // +1: pad slack
    return false;
  for (const char* id : kKnownTrailingChunks)
    if (memcmp(buf + pos, id, 4) == 0) return true;
  return false;
}

bool parse_wav(const uint8_t* buf, size_t len, WavInfo* out) {
  if (len < 12 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return false;
  size_t pos = 12;
  bool have_fmt = false;
  while (pos + 8 <= len) {
    const uint8_t* hdr = buf + pos;
    uint32_t size;
    memcpy(&size, hdr + 4, 4);
    const uint8_t* body = hdr + 8;
    if (pos + 8 + size > len) size = static_cast<uint32_t>(len - pos - 8);
    if (memcmp(hdr, "data", 4) == 0 && size == 0 && pos + 8 < len &&
        !is_known_trailing_chunk(buf, len, pos + 8)) {
      // unfinalized streaming-recorder header: samples run to EOF
      size = static_cast<uint32_t>(len - pos - 8);
    }
    if (memcmp(hdr, "fmt ", 4) == 0 && size >= 16) {
      memcpy(&out->format, body, 2);
      memcpy(&out->channels, body + 2, 2);
      memcpy(&out->sample_rate, body + 4, 4);
      memcpy(&out->bits, body + 14, 2);
      if (out->format == 0xFFFE && size >= 26) {  // WAVE_FORMAT_EXTENSIBLE
        memcpy(&out->format, body + 24, 2);
      }
      have_fmt = true;
    } else if (memcmp(hdr, "data", 4) == 0) {
      out->data = body;
      out->data_size = size;
    }
    pos += 8 + size + (size & 1);  // word-aligned chunks
  }
  return have_fmt && out->data != nullptr && out->channels > 0;
}

// Decode interleaved samples to float32 in [-1, 1] (torchaudio scaling).
bool decode_samples(const WavInfo& w, std::vector<float>* out) {
  const size_t bytes_per = w.bits / 8;
  if (bytes_per == 0) return false;
  const size_t n = w.data_size / bytes_per;
  out->resize(n);
  const uint8_t* p = w.data;
  if (w.format == 3 && w.bits == 32) {
    memcpy(out->data(), p, n * 4);
  } else if (w.format == 3 && w.bits == 64) {
    for (size_t i = 0; i < n; i++) {
      double v;
      memcpy(&v, p + 8 * i, 8);
      (*out)[i] = static_cast<float>(v);
    }
  } else if (w.format == 1 && w.bits == 16) {
    for (size_t i = 0; i < n; i++) {
      int16_t v;
      memcpy(&v, p + 2 * i, 2);
      (*out)[i] = v / 32768.0f;
    }
  } else if (w.format == 1 && w.bits == 8) {
    for (size_t i = 0; i < n; i++) (*out)[i] = (p[i] - 128) / 128.0f;
  } else if (w.format == 1 && w.bits == 24) {
    for (size_t i = 0; i < n; i++) {
      int32_t v = p[3 * i] | (p[3 * i + 1] << 8) | (p[3 * i + 2] << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      (*out)[i] = static_cast<float>(v) / static_cast<float>(1 << 23);
    }
  } else if (w.format == 1 && w.bits == 32) {
    for (size_t i = 0; i < n; i++) {
      int32_t v;
      memcpy(&v, p + 4 * i, 4);
      (*out)[i] = static_cast<float>(static_cast<double>(v) / 2147483648.0);
    }
  } else {
    return false;
  }
  return true;
}

uint64_t gcd64(uint64_t a, uint64_t b) { return b == 0 ? a : gcd64(b, a % b); }

// torchaudio _get_sinc_resample_kernel (sinc_interp_hann), float64 design.
void design_kernel(int orig_freq, int new_freq, int lowpass_filter_width,
                   double rolloff, std::vector<double>* kernels, int* width_out,
                   int* kw_out) {
  const double base_freq = std::min(orig_freq, new_freq) * rolloff;
  const int width =
      static_cast<int>(std::ceil(lowpass_filter_width * orig_freq / base_freq));
  const int kw = 2 * width + orig_freq;
  kernels->assign(static_cast<size_t>(new_freq) * kw, 0.0);
  for (int p = 0; p < new_freq; p++) {
    for (int j = 0; j < kw; j++) {
      const double idx = static_cast<double>(j - width) / orig_freq;
      double t = (-static_cast<double>(p) / new_freq + idx) * base_freq;
      t = std::max(-static_cast<double>(lowpass_filter_width),
                   std::min(static_cast<double>(lowpass_filter_width), t));
      const double window =
          std::pow(std::cos(t * kPi / lowpass_filter_width / 2.0), 2.0);
      const double tt = t * kPi;
      const double sinc = tt == 0.0 ? 1.0 : std::sin(tt) / tt;
      (*kernels)[static_cast<size_t>(p) * kw + j] =
          sinc * window * (base_freq / orig_freq);
    }
  }
  *width_out = width;
  *kw_out = kw;
}

}  // namespace

extern "C" {

// Returns 0 on success. Fills header info so the caller can size buffers.
int audioio_wav_info(const char* path, int* channels, int* sample_rate,
                     long long* num_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(len));
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    fclose(f);
    return 2;
  }
  fclose(f);
  WavInfo w;
  if (!parse_wav(buf.data(), buf.size(), &w)) return 3;
  // sub-byte / missing bits_per_sample (e.g. 4-bit ADPCM), zero channels,
  // or zero sample rate (unfinalized recorder headers): return an error
  // code instead of dividing by zero (SIGFPE would kill the whole process
  // and defeat the C-ABI error fallback in audio/native.py)
  if (w.bits < 8 || w.channels < 1 || w.sample_rate < 1) return 3;
  *channels = w.channels;
  *sample_rate = w.sample_rate;
  *num_frames = static_cast<long long>(w.data_size / (w.bits / 8) / w.channels);
  return 0;
}

// Decode + mono channel-mean into `out` (caller allocates num_frames
// floats). v2 reports the ACTUAL decoded frame count: the file is re-read
// here after the caller sized `out` from audioio_wav_info, and an
// actively-written recorder file may have shrunk in between — without the
// out-param the caller would return an np.empty tail of garbage heap.
int audioio_read_mono_v2(const char* path, float* out, long long out_capacity,
                         int* sample_rate, long long* out_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(len));
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    fclose(f);
    return 2;
  }
  fclose(f);
  WavInfo w;
  if (!parse_wav(buf.data(), buf.size(), &w)) return 3;
  std::vector<float> interleaved;
  if (!decode_samples(w, &interleaved)) return 4;
  const long long frames =  // parse_wav guarantees channels > 0
      static_cast<long long>(interleaved.size() / w.channels);
  if (frames > out_capacity) return 5;
  const int C = w.channels;
  for (long long i = 0; i < frames; i++) {
    float acc = 0.0f;
    for (int c = 0; c < C; c++) acc += interleaved[i * C + c];
    out[i] = acc / C;
  }
  *sample_rate = w.sample_rate;
  *out_frames = frames;
  return 0;
}

// Legacy ABI (pre-v2 .so consumers): actual frame count discarded.
int audioio_read_mono(const char* path, float* out, long long out_capacity,
                      int* sample_rate) {
  long long frames = 0;
  return audioio_read_mono_v2(path, out, out_capacity, sample_rate, &frames);
}

long long audioio_resampled_length(long long n, int orig_freq, int new_freq) {
  // a sample_rate=0 header would otherwise reach an unsigned division by
  // zero here — SIGFPE that kills the host process (no C-ABI fallback)
  if (orig_freq < 1 || new_freq < 1 || n < 0) return -1;
  const uint64_t g = gcd64(orig_freq, new_freq);
  const uint64_t up = new_freq / g, down = orig_freq / g;
  return static_cast<long long>(
      (static_cast<unsigned long long>(n) * up + down - 1) / down);
}

// Polyphase resample float32 mono; out sized via audioio_resampled_length.
// Kernel is designed in float64 (torchaudio parity) then applied in float32
// with OpenMP across output blocks — the fp32 dot products match the
// Python/BLAS path to ~1e-6, and the parallel blocks beat it on wall clock.
int audioio_resample(const float* in, long long n, int orig_freq, int new_freq,
                     float* out) {
  if (orig_freq < 1 || new_freq < 1 || n < 0) return 6;
  if (orig_freq == new_freq) {
    memcpy(out, in, sizeof(float) * static_cast<size_t>(n));
    return 0;
  }
  const uint64_t g = gcd64(orig_freq, new_freq);
  const int up = static_cast<int>(new_freq / g);
  const int down = static_cast<int>(orig_freq / g);
  // kernel table is ~ up * (2*ceil(6*down/0.99) + down) doubles AFTER gcd
  // reduction; a corrupt u32 header rate reduces huge and would drive the
  // vector allocation into bad_alloc, which (uncaught) terminates the
  // host process. Real pairs — incl. augmentation's fictitious pitch
  // ratios like 96:77 — reduce far below this bound (matches the Python
  // guard ops/resample._MAX_KERNEL_ELEMENTS).
  const uint64_t width_est = (600ULL * down + 98) / 99;  // ceil(6*down/0.99)
  if (static_cast<uint64_t>(up) * (2 * width_est + down) > 16000000ULL)
    return 6;
  std::vector<double> kernels64;
  int width, kw;
  design_kernel(down, up, 6, 0.99, &kernels64, &width, &kw);
  std::vector<float> kernels(kernels64.begin(), kernels64.end());

  const long long out_len = audioio_resampled_length(n, orig_freq, new_freq);
  const long long padded = n + width + width + down;
  std::vector<float> x(static_cast<size_t>(padded), 0.0f);
  memcpy(x.data() + width, in, sizeof(float) * static_cast<size_t>(n));

  const long long num_blocks = (padded - kw) / down + 1;
  const float* __restrict__ xp = x.data();
  const float* __restrict__ kp = kernels.data();
#pragma omp parallel for schedule(static)
  for (long long b = 0; b < num_blocks; b++) {
    const float* __restrict__ frame = xp + b * down;
    for (int p = 0; p < up; p++) {
      const long long o = b * up + p;
      if (o >= out_len) break;
      const float* __restrict__ k = kp + static_cast<size_t>(p) * kw;
      float acc = 0.0f;
#pragma omp simd reduction(+ : acc)
      for (int j = 0; j < kw; j++) acc += frame[j] * k[j];
      out[o] = acc;
    }
  }
  return 0;
}

}  // extern "C"
