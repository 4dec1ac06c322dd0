// Multithreaded host-side wav batch decoder (the TPU-native runtime
// replacement for the reference's torchaudio/sox native IO, SURVEY.md
// section 2.2: wav loading happened in C/C++ inside dataloader workers).
//
// One call decodes a whole batch of RIFF/WAVE files in parallel into a
// preallocated (n, max_samples) float32 buffer, normalized exactly like
// tpuasr.data.manifest.load_wav (scipy conventions):
//   PCM16 /32768, PCM32 /2^31, PCM24 sign-extended <<8 then /2^31,
//   PCM8 (unsigned) (x-128)/128, IEEE float32 as-is; multi-channel ->
//   mean of converted channels.
//
// Exposed via ctypes (tpuasr/native/wav_batch.py); no Python objects or
// GIL anywhere, so decode scales with host cores while the device runs.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int parse_one(const char* path, float* out, long long max_samples,
              int* len_out, int* sr_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> buf((size_t)sz);
  if (sz < 44 || fread(buf.data(), 1, (size_t)sz, f) != (size_t)sz) {
    fclose(f);
    return 2;
  }
  fclose(f);
  if (memcmp(buf.data(), "RIFF", 4) || memcmp(buf.data() + 8, "WAVE", 4))
    return 3;

  auto rd16 = [&](long long p) { return (int)(buf[p] | (buf[p + 1] << 8)); };
  auto rd32 = [&](long long p) {
    return (uint32_t)(buf[p] | (buf[p + 1] << 8) | (buf[p + 2] << 16) |
                      ((uint32_t)buf[p + 3] << 24));
  };

  long long pos = 12;
  int fmt = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  const unsigned char* data = nullptr;
  long long data_len = 0;
  while (pos + 8 <= sz) {
    uint32_t csz = rd32(pos + 4);
    if (!memcmp(&buf[pos], "fmt ", 4) && pos + 24 <= sz) {
      fmt = rd16(pos + 8);
      channels = rd16(pos + 10);
      sr = rd32(pos + 12);
      bits = rd16(pos + 22);
      // WAVE_FORMAT_EXTENSIBLE: real format is the first word of the GUID.
      // Guard against truncated files whose fmt chunk CLAIMS >= 40 bytes.
      if (fmt == 0xFFFE && csz >= 40 && pos + 34 <= sz)
        fmt = rd16(pos + 8 + 24);
    } else if (!memcmp(&buf[pos], "data", 4)) {
      data = &buf[pos + 8];
      data_len = csz;
      if (pos + 8 + data_len > sz) data_len = sz - pos - 8;
    }
    pos += 8 + csz + (csz & 1);  // chunks are word-aligned
  }
  if (!data || channels <= 0 || bits <= 0 || sr == 0) return 4;
  // Sub-byte encodings (e.g. IMA ADPCM, fmt 0x11 with bits=4) would make
  // bytes==0 below and SIGFPE on the frame division: reject as unsupported.
  if (bits < 8 || bits % 8 != 0) return 5;

  int bytes = bits / 8;
  long long frames = data_len / ((long long)channels * bytes);
  long long n = frames < max_samples ? frames : max_samples;
  double inv_ch = 1.0 / channels;

  if (fmt == 1 && bits == 16 && channels == 1) {
    // Fast path for the dominant case (mono PCM16): a single
    // auto-vectorized convert-scale pass (~8 GB/s; the generic loop below
    // is scalar because of the per-sample channel reduction).
    const int16_t* src = reinterpret_cast<const int16_t*>(data);
    constexpr float kScale = 1.0f / 32768.0f;
    for (long long i = 0; i < n; i++) out[i] = (float)src[i] * kScale;
    *len_out = (int)n;
    *sr_out = (int)sr;
    return 0;
  }

  for (long long i = 0; i < n; i++) {
    double acc = 0.0;
    const unsigned char* p = data + i * channels * bytes;
    for (int c = 0; c < channels; c++, p += bytes) {
      double v;
      if (fmt == 1 && bits == 16) {
        v = (double)(int16_t)(p[0] | (p[1] << 8)) / 32768.0;
      } else if (fmt == 1 && bits == 32) {
        v = (double)(int32_t)(p[0] | (p[1] << 8) | (p[2] << 16) |
                              ((uint32_t)p[3] << 24)) /
            2147483648.0;
      } else if (fmt == 1 && bits == 24) {
        int32_t s = (int32_t)((p[0] << 8) | (p[1] << 16) |
                              ((uint32_t)p[2] << 24));
        v = (double)s / 2147483648.0;  // scipy: 24-bit lives in the top bytes
      } else if (fmt == 1 && bits == 8) {
        v = ((double)p[0] - 128.0) / 128.0;
      } else if (fmt == 3 && bits == 32) {
        float fv;
        memcpy(&fv, p, 4);
        v = fv;
      } else {
        return 5;  // unsupported encoding
      }
      acc += v;
    }
    out[i] = (float)(acc * inv_ch);
  }
  *len_out = (int)n;
  *sr_out = (int)sr;
  return 0;
}

}  // namespace

extern "C" {

// Decode n wav files into out (n, max_samples) float32 (rows past each
// length are left untouched — pass a zeroed buffer for padding).
// Returns 0 on success, else (index of first failing file + 1); errs[i]
// holds the per-file error code (0 ok).
int wav_batch_load(const char** paths, int n, float* out, int* lens,
                   int* srs, int* errs, long long max_samples,
                   int num_threads) {
  if (num_threads < 1) num_threads = 1;
  if (num_threads > n) num_threads = n;
  std::atomic<long long> next(0);
  auto worker = [&]() {
    for (;;) {
      long long i = next.fetch_add(1);
      if (i >= n) break;
      errs[i] = parse_one(paths[i], out + i * max_samples, max_samples,
                          &lens[i], &srs[i]);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < num_threads; t++) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  for (int i = 0; i < n; i++)
    if (errs[i]) return i + 1;
  return 0;
}

}  // extern "C"
