// Embedded-CPython TTS engine.
//
// Native-equivalent of the reference's C++ model layer
// (runtime/core/model/{onnx_model,vits_model,tts}.cc): where the reference
// owns ONNX Runtime sessions, this owns an embedded CPython interpreter that
// drives the XLA/PJRT-backed SynthesisEngine (wetts_tpu/serving/embed.py).
// C++ keeps flag parsing, orchestration, WAV I/O, and the HTTP server.
//
// Thread-safety: Init() must be called once from the main thread; after it
// returns, Synthesize()/StreamSynthesize() may be called from any thread
// (each call acquires the GIL).

#ifndef WETTS_EMBED_ENGINE_H_
#define WETTS_EMBED_ENGINE_H_

#include <cstdint>
#include <functional>
#include <string>
#include <vector>

namespace wetts {

class EmbeddedTts {
 public:
  EmbeddedTts() = default;
  ~EmbeddedTts();
  EmbeddedTts(const EmbeddedTts&) = delete;
  EmbeddedTts& operator=(const EmbeddedTts&) = delete;

  // repo_root: prepended to sys.path when non-empty (so the binaries run
  // from a source checkout without an installed wheel).
  bool Init(const std::string& model_dir, const std::string& repo_root,
            std::string* error);

  // Full synthesis -> int16 PCM (TTS::Synthesis semantics, tts.cc:76-89).
  bool Synthesize(const std::string& text, const std::string& speaker,
                  std::vector<int16_t>* audio, std::string* error);

  // Streaming synthesis: invokes on_chunk per decoded chunk
  // (TTS::StreamSynthesis semantics, tts.cc:91-128).
  bool StreamSynthesize(
      const std::string& text, const std::string& speaker,
      const std::function<void(const int16_t*, size_t)>& on_chunk,
      std::string* error);

  int sample_rate() const { return sample_rate_; }

 private:
  void* module_ = nullptr;  // PyObject* (opaque to keep Python.h out of here)
  int sample_rate_ = 0;
};

}  // namespace wetts

#endif  // WETTS_EMBED_ENGINE_H_
