// Minimal JNI header stub for COMPILE-CHECKING the bridge without a JDK.
//
// The image used for CI has no JDK/NDK, but leaving jni_bridge.cc entirely
// unbuilt lets bit-rot in silently. This stub declares exactly the JNI
// surface the bridge uses (string access, exceptions, short arrays) with
// aborting inline bodies, so `-DWETTS_BUILD_JNI=ON` without a JDK still
// type-checks and links the translation unit against the real embedded
// engine. A real NDK/JDK build simply finds the real <jni.h> first (the
// stub directory is only added to the include path when JNI_INCLUDE_DIRS
// is empty; see native/CMakeLists.txt).
//
// NEVER ship this to a device: every function aborts.

#ifndef WETTS_ANDROID_JNI_STUB_JNI_H_
#define WETTS_ANDROID_JNI_STUB_JNI_H_

#include <cstdint>
#include <cstdlib>

#define JNIEXPORT __attribute__((visibility("default")))
#define JNICALL
#define JNI_TRUE 1
#define JNI_FALSE 0

typedef uint8_t jboolean;
typedef int32_t jint;
typedef int32_t jsize;
typedef int16_t jshort;

class _jobject {};
class _jclass : public _jobject {};
class _jstring : public _jobject {};
class _jshortArray : public _jobject {};
typedef _jobject* jobject;
typedef _jclass* jclass;
typedef _jstring* jstring;
typedef _jshortArray* jshortArray;

struct JNIEnv {
  const char* GetStringUTFChars(jstring, jboolean*) { std::abort(); }
  void ReleaseStringUTFChars(jstring, const char*) { std::abort(); }
  jclass FindClass(const char*) { std::abort(); }
  jint ThrowNew(jclass, const char*) { std::abort(); }
  jshortArray NewShortArray(jsize) { std::abort(); }
  void SetShortArrayRegion(jshortArray, jsize, jsize, const jshort*) {
    std::abort();
  }
};

#endif  // WETTS_ANDROID_JNI_STUB_JNI_H_
