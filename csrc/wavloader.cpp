// Native batch WAV decoder for the host input pipeline.
//
// The reference's audio decode runs in torchaudio's C++ backend inside
// DataLoader workers (/root/reference/src/dataloader.py:98-135). This is the
// aum_tpu equivalent: a small C++ library that decodes a batch of WAV files
// into a caller-provided (batch, max_samples) float32 buffer with an
// internal thread pool, so the Python host loop never touches sample data.
// Exposed via ctypes (aum_tpu/data/native.py); falls back to the pure-Python
// decoder when the shared library is absent.
//
// Supports RIFF/WAVE PCM 8/16/24/32-bit and IEEE float32, first channel,
// mean-subtracted and zero-padded/cropped to max_samples — matching
// AudioJsonDataset.waveform semantics (aum_tpu/data/datasets.py).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavResult {
  int64_t n_samples = 0;  // true sample count before pad/crop
  int sample_rate = 0;
  int status = 0;  // 0 ok, <0 error
};

int decode_one(const char* path, float* out, int64_t max_samples,
               WavResult* res) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return res->status = -1;

  auto fail = [&](int code) {
    std::fclose(f);
    return res->status = code;
  };

  char riff[4];
  uint32_t riff_size;
  char wave[4];
  if (std::fread(riff, 1, 4, f) != 4 || std::memcmp(riff, "RIFF", 4) ||
      std::fread(&riff_size, 4, 1, f) != 1 ||
      std::fread(wave, 1, 4, f) != 4 || std::memcmp(wave, "WAVE", 4))
    return fail(-2);

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  bool have_fmt = false;

  // Chunk walk: find fmt then data.
  for (;;) {
    char id[4];
    uint32_t size;
    if (std::fread(id, 1, 4, f) != 4 || std::fread(&size, 4, 1, f) != 1)
      return fail(-3);
    if (!std::memcmp(id, "fmt ", 4)) {
      uint8_t buf[16];
      if (size < 16 || std::fread(buf, 1, 16, f) != 16) return fail(-4);
      fmt = buf[0] | (buf[1] << 8);
      channels = buf[2] | (buf[3] << 8);
      std::memcpy(&sample_rate, buf + 4, 4);
      bits = buf[14] | (buf[15] << 8);
      if (size > 16) std::fseek(f, size - 16, SEEK_CUR);
      have_fmt = true;
    } else if (!std::memcmp(id, "data", 4)) {
      if (!have_fmt || channels == 0) return fail(-5);
      const int bytes = bits / 8;
      if (bytes == 0) return fail(-6);
      const int64_t frames = size / (bytes * channels);
      const int64_t n = frames < max_samples ? frames : max_samples;

      std::vector<uint8_t> raw(static_cast<size_t>(size));
      const size_t got = std::fread(raw.data(), 1, size, f);
      const int64_t got_frames =
          static_cast<int64_t>(got) / (bytes * channels);
      const int64_t use = got_frames < n ? got_frames : n;

      double sum = 0.0;
      for (int64_t i = 0; i < use; ++i) {
        const uint8_t* p = raw.data() + i * bytes * channels;  // channel 0
        float v = 0.f;
        if (fmt == 3 && bits == 32) {  // IEEE float
          std::memcpy(&v, p, 4);
        } else if (bits == 16) {
          int16_t s;
          std::memcpy(&s, p, 2);
          v = s / 32768.0f;
        } else if (bits == 32) {
          int32_t s;
          std::memcpy(&s, p, 4);
          v = s / 2147483648.0f;
        } else if (bits == 8) {
          v = (p[0] - 128) / 128.0f;
        } else if (bits == 24) {
          int32_t s = p[0] | (p[1] << 8) | (p[2] << 16);
          if (s >= (1 << 23)) s -= (1 << 24);
          v = s / 8388608.0f;
        } else {
          return fail(-7);
        }
        out[i] = v;
        sum += v;
      }
      // mean-subtract over the true (uncropped-within-buffer) samples
      const float mean = use > 0 ? static_cast<float>(sum / use) : 0.f;
      for (int64_t i = 0; i < use; ++i) out[i] -= mean;
      for (int64_t i = use; i < max_samples; ++i) out[i] = 0.f;

      res->n_samples = frames;
      res->sample_rate = static_cast<int>(sample_rate);
      std::fclose(f);
      return res->status = 0;
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
}

}  // namespace

extern "C" {

// Decode one file. Returns 0 on success.
int aum_decode_wav(const char* path, float* out, int64_t max_samples,
                   int64_t* n_samples, int* sample_rate) {
  WavResult r;
  decode_one(path, out, max_samples, &r);
  *n_samples = r.n_samples;
  *sample_rate = r.sample_rate;
  return r.status;
}

// Decode a batch of `n` files into out[n * max_samples] with `threads`
// worker threads. statuses/n_samples/sample_rates are length-n outputs.
void aum_decode_wav_batch(const char** paths, int n, float* out,
                          int64_t max_samples, int64_t* n_samples,
                          int* sample_rates, int* statuses, int threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      WavResult r;
      decode_one(paths[i], out + static_cast<int64_t>(i) * max_samples,
                 max_samples, &r);
      n_samples[i] = r.n_samples;
      sample_rates[i] = r.sample_rate;
      statuses[i] = r.status;
    }
  };
  if (threads <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
