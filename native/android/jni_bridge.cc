// JNI bridge: Java `Synthesis.init/run` over the native engine.
//
// Native-equivalent of the reference's Android JNI entry points
// (runtime/android/app/src/main/cpp/wetts.cc:56-121): init(modelDir) loads
// the engine once; run(text, speaker) synthesizes and returns int16 PCM.
// On-device TPU inference is not an Android scenario, so this seam targets
// a host build (e.g. an on-prem ARM box fronting a TPU backend via the
// embedded engine); the pure text-frontend C ABI (include/wetts/c_api.h)
// is the NDK-portable subset.
//
// Build: enabled by -DWETTS_BUILD_JNI=ON when a JDK is found (see
// native/CMakeLists.txt); not compiled in the default test build.

#include <jni.h>

#include <string>
#include <vector>

#include "wetts/embed_engine.h"

namespace {

wetts::EmbeddedTts* g_engine = nullptr;

std::string ToStdString(JNIEnv* env, jstring s) {
  const char* chars = env->GetStringUTFChars(s, nullptr);
  std::string out(chars ? chars : "");
  if (chars) env->ReleaseStringUTFChars(s, chars);
  return out;
}

}  // namespace

extern "C" {

// bool init(String modelDir): mirror of wetts.cc:56-77 (model load + flags).
JNIEXPORT jboolean JNICALL
Java_cn_org_wetts_1tpu_Synthesis_init(JNIEnv* env, jobject, jstring model_dir,
                                      jstring repo_root) {
  if (g_engine != nullptr) return JNI_TRUE;
  auto* engine = new wetts::EmbeddedTts();
  std::string error;
  if (!engine->Init(ToStdString(env, model_dir),
                    ToStdString(env, repo_root), &error)) {
    delete engine;
    env->ThrowNew(env->FindClass("java/lang/RuntimeException"),
                  error.c_str());
    return JNI_FALSE;
  }
  g_engine = engine;
  return JNI_TRUE;
}

JNIEXPORT jint JNICALL
Java_cn_org_wetts_1tpu_Synthesis_sampleRate(JNIEnv*, jobject) {
  return g_engine ? g_engine->sample_rate() : 0;
}

// short[] run(String text, String speaker): mirror of wetts.cc:79-94.
JNIEXPORT jshortArray JNICALL
Java_cn_org_wetts_1tpu_Synthesis_run(JNIEnv* env, jobject, jstring text,
                                     jstring speaker) {
  if (g_engine == nullptr) {
    env->ThrowNew(env->FindClass("java/lang/IllegalStateException"),
                  "Synthesis.init not called");
    return nullptr;
  }
  std::vector<int16_t> audio;
  std::string error;
  if (!g_engine->Synthesize(ToStdString(env, text),
                            ToStdString(env, speaker), &audio, &error)) {
    env->ThrowNew(env->FindClass("java/lang/RuntimeException"),
                  error.c_str());
    return nullptr;
  }
  jshortArray out = env->NewShortArray(static_cast<jsize>(audio.size()));
  env->SetShortArrayRegion(out, 0, static_cast<jsize>(audio.size()),
                           reinterpret_cast<const jshort*>(audio.data()));
  return out;
}

}  // extern "C"
