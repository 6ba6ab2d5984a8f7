// Native synthesis binary.
//
// Parity target: runtime/core/bin/tts_main.cc:29-103 — flag-file driven
// text -> WAV synthesis, with streaming and non-streaming paths. The model
// is executed by the embedded XLA/PJRT engine (embed_engine.h); flag
// parsing, orchestration, and WAV writing are native.
//
// Usage:
//   tts_main --model_dir <bundle dir> --text "..." --wav_path out.wav \
//            [--sname <speaker>] [--streaming] [--repo_root <path>] \
//            [--flags_file <file of --flag=value lines>]

#include <cstdio>
#include <string>
#include <vector>

#include "wetts/embed_engine.h"
#include "wetts/flags.h"
#include "wetts/timer.h"
#include "wetts/wav.h"

int main(int argc, char* argv[]) {
  wetts::Flags flags;
  std::string error;
  if (!flags.Parse(argc, argv, &error)) {
    std::fprintf(stderr, "flag error: %s\n", error.c_str());
    return 1;
  }
  std::string model_dir = flags.Get("model_dir");
  std::string text = flags.Get("text");
  std::string wav_path = flags.Get("wav_path");
  std::string sname = flags.Get("sname");
  std::string repo_root = flags.Get("repo_root");
  bool streaming = flags.GetBool("streaming");
  if (model_dir.empty() || text.empty() || wav_path.empty()) {
    std::fprintf(stderr,
                 "usage: tts_main --model_dir DIR --text TEXT "
                 "--wav_path OUT.wav [--sname NAME] [--streaming]\n");
    return 1;
  }

  wetts::EmbeddedTts tts;
  wetts::Timer init_timer;
  if (!tts.Init(model_dir, repo_root, &error)) {
    std::fprintf(stderr, "init failed: %s\n", error.c_str());
    return 1;
  }
  std::fprintf(stderr, "engine ready in %d ms (sample rate %d)\n",
               init_timer.Elapsed(), tts.sample_rate());

  std::vector<int16_t> audio;
  wetts::Timer synth_timer;
  if (streaming) {
    bool ok = tts.StreamSynthesize(
        text, sname,
        [&audio](const int16_t* pcm, size_t n) {
          audio.insert(audio.end(), pcm, pcm + n);
        },
        &error);
    if (!ok) {
      std::fprintf(stderr, "stream synthesis failed: %s\n", error.c_str());
      return 1;
    }
  } else {
    if (!tts.Synthesize(text, sname, &audio, &error)) {
      std::fprintf(stderr, "synthesis failed: %s\n", error.c_str());
      return 1;
    }
  }
  int synth_ms = synth_timer.Elapsed();
  double audio_s =
      static_cast<double>(audio.size()) / std::max(1, tts.sample_rate());
  std::fprintf(stderr, "synthesized %.2fs audio in %d ms (RTF %.4f)\n",
               audio_s, synth_ms, synth_ms / 1000.0 / std::max(1e-9, audio_s));

  if (!wetts::WriteWav(wav_path, audio.data(), audio.size(),
                       tts.sample_rate())) {
    std::fprintf(stderr, "cannot write %s\n", wav_path.c_str());
    return 1;
  }
  return 0;
}
