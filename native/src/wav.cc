#include "wetts/wav.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <fstream>

namespace wetts {

namespace {

struct ChunkHeader {
  char id[4];
  uint32_t size;
};

template <typename T>
bool ReadRaw(std::ifstream& in, T* out) {
  in.read(reinterpret_cast<char*>(out), sizeof(T));
  return static_cast<bool>(in);
}

}  // namespace

bool ReadWav(const std::string& path, WavData* out) {
  std::ifstream in(path, std::ios::binary);
  if (!in.is_open()) return false;
  char riff[4], wave[4];
  uint32_t riff_size;
  in.read(riff, 4);
  ReadRaw(in, &riff_size);
  in.read(wave, 4);
  if (!in || std::memcmp(riff, "RIFF", 4) != 0 ||
      std::memcmp(wave, "WAVE", 4) != 0) {
    return false;
  }
  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  std::vector<char> data;
  ChunkHeader ch;
  while (ReadRaw(in, &ch)) {
    if (std::memcmp(ch.id, "fmt ", 4) == 0) {
      uint16_t block_align;
      uint32_t byte_rate;
      ReadRaw(in, &audio_format);
      ReadRaw(in, &channels);
      ReadRaw(in, &sample_rate);
      ReadRaw(in, &byte_rate);
      ReadRaw(in, &block_align);
      ReadRaw(in, &bits);
      if (ch.size > 16) in.seekg(ch.size - 16, std::ios::cur);
    } else if (std::memcmp(ch.id, "data", 4) == 0) {
      data.resize(ch.size);
      in.read(data.data(), ch.size);
    } else {
      in.seekg(ch.size + (ch.size & 1), std::ios::cur);
    }
  }
  if (sample_rate == 0 || channels == 0 || data.empty()) return false;
  out->sample_rate = static_cast<int>(sample_rate);
  out->num_channels = channels;
  size_t n = 0;
  if (audio_format == 1 && bits == 16) {
    n = data.size() / 2;
    out->samples.resize(n);
    const int16_t* p = reinterpret_cast<const int16_t*>(data.data());
    for (size_t i = 0; i < n; ++i) out->samples[i] = p[i] / 32768.0f;
  } else if (audio_format == 1 && bits == 32) {
    n = data.size() / 4;
    out->samples.resize(n);
    const int32_t* p = reinterpret_cast<const int32_t*>(data.data());
    for (size_t i = 0; i < n; ++i) out->samples[i] = p[i] / 2147483648.0f;
  } else if (audio_format == 3 && bits == 32) {
    n = data.size() / 4;
    out->samples.resize(n);
    std::memcpy(out->samples.data(), data.data(), data.size());
  } else {
    return false;
  }
  return true;
}

std::vector<uint8_t> WavBytes(const int16_t* pcm, size_t n, int sample_rate,
                              int num_channels) {
  uint32_t data_size = static_cast<uint32_t>(n * 2);
  uint32_t riff_size = 36 + data_size;
  uint16_t fmt = 1, bits = 16;
  uint16_t block_align = static_cast<uint16_t>(num_channels * 2);
  uint32_t byte_rate = sample_rate * block_align;
  uint32_t fmt_size = 16;
  uint16_t ch16 = static_cast<uint16_t>(num_channels);
  uint32_t sr = static_cast<uint32_t>(sample_rate);
  std::vector<uint8_t> out;
  out.reserve(44 + data_size);
  auto put = [&out](const void* p, size_t len) {
    const uint8_t* b = reinterpret_cast<const uint8_t*>(p);
    out.insert(out.end(), b, b + len);
  };
  put("RIFF", 4);
  put(&riff_size, 4);
  put("WAVEfmt ", 8);
  put(&fmt_size, 4);
  put(&fmt, 2);
  put(&ch16, 2);
  put(&sr, 4);
  put(&byte_rate, 4);
  put(&block_align, 2);
  put(&bits, 2);
  put("data", 4);
  put(&data_size, 4);
  put(pcm, data_size);
  return out;
}

bool WriteWav(const std::string& path, const int16_t* pcm, size_t n,
              int sample_rate, int num_channels) {
  std::ofstream outf(path, std::ios::binary);
  if (!outf.is_open()) return false;
  std::vector<uint8_t> bytes = WavBytes(pcm, n, sample_rate, num_channels);
  outf.write(reinterpret_cast<const char*>(bytes.data()), bytes.size());
  return static_cast<bool>(outf);
}

bool WriteWav(const std::string& path, const float* samples, size_t n,
              int sample_rate, int num_channels) {
  std::vector<int16_t> pcm(n);
  for (size_t i = 0; i < n; ++i) {
    float v = std::max(-1.0f, std::min(1.0f, samples[i]));
    pcm[i] = static_cast<int16_t>(std::lround(v * 32767.0f));
  }
  return WriteWav(path, pcm.data(), n, sample_rate, num_channels);
}

}  // namespace wetts
