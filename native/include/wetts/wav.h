// 16-bit PCM WAV read/write (native-equivalent of runtime/core/frontend/wav.h).
#ifndef WETTS_WAV_H_
#define WETTS_WAV_H_

#include <cstdint>
#include <string>
#include <vector>

namespace wetts {

struct WavData {
  int sample_rate = 0;
  int num_channels = 0;
  std::vector<float> samples;  // interleaved, [-1, 1]
};

// Returns false on malformed files. Supports PCM16 / PCM32 / float32.
bool ReadWav(const std::string& path, WavData* out);

// Writes mono-or-interleaved float samples as 16-bit PCM.
bool WriteWav(const std::string& path, const float* samples, size_t n,
              int sample_rate, int num_channels = 1);

// int16 PCM variant (audio already scaled, e.g. from the embedded engine).
bool WriteWav(const std::string& path, const int16_t* pcm, size_t n,
              int sample_rate, int num_channels = 1);

// In-memory 16-bit PCM WAV (header + data), for the HTTP server's
// base64-WAV JSON responses (parity: runtime/core/http/http_server.cc:96-115).
std::vector<uint8_t> WavBytes(const int16_t* pcm, size_t n, int sample_rate,
                              int num_channels = 1);

}  // namespace wetts

#endif  // WETTS_WAV_H_
