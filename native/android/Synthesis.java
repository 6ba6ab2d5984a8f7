// Java side of the JNI bridge (reference:
// runtime/android/app/src/main/java/cn/org/wenet/wetts/Synthesis.java).
package cn.org.wetts_tpu;

public final class Synthesis {
  static {
    System.loadLibrary("wetts_jni");
  }

  private Synthesis() {}

  public static native boolean init(String modelDir, String repoRoot);

  public static native int sampleRate();

  public static native short[] run(String text, String speaker);
}
