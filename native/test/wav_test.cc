// WAV round-trip test.
#include <cassert>
#include <cmath>
#include <cstdio>
#include <iostream>
#include <vector>

#include "wetts/wav.h"

int main() {
  std::vector<float> samples(1600);
  for (size_t i = 0; i < samples.size(); ++i) {
    samples[i] = 0.5f * std::sin(2 * 3.14159265f * 440 * i / 16000.0f);
  }
  const char* path = "/tmp/wetts_wav_test.wav";
  if (!wetts::WriteWav(path, samples.data(), samples.size(), 16000)) {
    std::cerr << "write failed" << std::endl;
    return 1;
  }
  wetts::WavData data;
  if (!wetts::ReadWav(path, &data)) {
    std::cerr << "read failed" << std::endl;
    return 1;
  }
  if (data.sample_rate != 16000 || data.num_channels != 1 ||
      data.samples.size() != samples.size()) {
    std::cerr << "metadata mismatch" << std::endl;
    return 1;
  }
  for (size_t i = 0; i < samples.size(); ++i) {
    if (std::fabs(data.samples[i] - samples[i]) > 2.0f / 32768.0f) {
      std::cerr << "sample mismatch at " << i << std::endl;
      return 1;
    }
  }
  std::remove(path);
  std::cout << "wav round-trip OK" << std::endl;
  return 0;
}
