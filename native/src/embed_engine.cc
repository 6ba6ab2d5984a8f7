// Embedded-CPython TTS engine implementation (see embed_engine.h).

#include "wetts/embed_engine.h"

#include <Python.h>

#include <mutex>

namespace wetts {

namespace {

std::once_flag g_py_init_once;

void InitPythonOnce(const std::string& repo_root) {
  std::call_once(g_py_init_once, [&repo_root]() {
    if (!Py_IsInitialized()) {
      PyConfig config;
      PyConfig_InitPythonConfig(&config);
      // Leave argv empty; the binary owns its own flags.
      Py_InitializeFromConfig(&config);
      PyConfig_Clear(&config);
    }
    if (!repo_root.empty()) {
      PyObject* sys_path = PySys_GetObject("path");  // borrowed
      if (sys_path != nullptr) {
        PyObject* root = PyUnicode_FromString(repo_root.c_str());
        PyList_Insert(sys_path, 0, root);
        Py_XDECREF(root);
      }
    }
    // Release the GIL so worker threads can acquire it via PyGILState.
    (void)PyEval_SaveThread();
  });
}

std::string FetchPyError() {
  PyObject *type = nullptr, *value = nullptr, *tb = nullptr;
  PyErr_Fetch(&type, &value, &tb);
  PyErr_NormalizeException(&type, &value, &tb);
  std::string msg = "python error";
  if (value != nullptr) {
    PyObject* s = PyObject_Str(value);
    if (s != nullptr) {
      const char* c = PyUnicode_AsUTF8(s);
      if (c != nullptr) msg = c;
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
  return msg;
}

class GilGuard {
 public:
  GilGuard() : state_(PyGILState_Ensure()) {}
  ~GilGuard() { PyGILState_Release(state_); }

 private:
  PyGILState_STATE state_;
};

bool AppendPcm(PyObject* bytes, std::vector<int16_t>* audio) {
  char* buf = nullptr;
  Py_ssize_t len = 0;
  if (PyBytes_AsStringAndSize(bytes, &buf, &len) != 0) return false;
  const int16_t* pcm = reinterpret_cast<const int16_t*>(buf);
  audio->insert(audio->end(), pcm, pcm + len / 2);
  return true;
}

}  // namespace

EmbeddedTts::~EmbeddedTts() {
  if (module_ != nullptr && Py_IsInitialized()) {
    GilGuard gil;
    Py_DECREF(reinterpret_cast<PyObject*>(module_));
  }
}

bool EmbeddedTts::Init(const std::string& model_dir,
                       const std::string& repo_root, std::string* error) {
  InitPythonOnce(repo_root);
  GilGuard gil;
  PyObject* mod = PyImport_ImportModule("wetts_tpu.serving.embed");
  if (mod == nullptr) {
    *error = "import wetts_tpu.serving.embed failed: " + FetchPyError();
    return false;
  }
  PyObject* rate =
      PyObject_CallMethod(mod, "init", "s", model_dir.c_str());
  if (rate == nullptr) {
    *error = "embed.init failed: " + FetchPyError();
    Py_DECREF(mod);
    return false;
  }
  sample_rate_ = static_cast<int>(PyLong_AsLong(rate));
  Py_DECREF(rate);
  module_ = mod;
  return true;
}

bool EmbeddedTts::Synthesize(const std::string& text,
                             const std::string& speaker,
                             std::vector<int16_t>* audio,
                             std::string* error) {
  GilGuard gil;
  PyObject* mod = reinterpret_cast<PyObject*>(module_);
  PyObject* bytes = PyObject_CallMethod(mod, "synthesize", "ss", text.c_str(),
                                        speaker.c_str());
  if (bytes == nullptr) {
    *error = "embed.synthesize failed: " + FetchPyError();
    return false;
  }
  bool ok = AppendPcm(bytes, audio);
  if (!ok) *error = "synthesize returned a non-bytes object";
  Py_DECREF(bytes);
  return ok;
}

bool EmbeddedTts::StreamSynthesize(
    const std::string& text, const std::string& speaker,
    const std::function<void(const int16_t*, size_t)>& on_chunk,
    std::string* error) {
  GilGuard gil;
  PyObject* mod = reinterpret_cast<PyObject*>(module_);
  PyObject* gen = PyObject_CallMethod(mod, "stream_synthesize", "ss",
                                      text.c_str(), speaker.c_str());
  if (gen == nullptr) {
    *error = "embed.stream_synthesize failed: " + FetchPyError();
    return false;
  }
  PyObject* iter = PyObject_GetIter(gen);
  Py_DECREF(gen);
  if (iter == nullptr) {
    *error = "stream_synthesize did not return an iterator";
    return false;
  }
  PyObject* item = nullptr;
  while ((item = PyIter_Next(iter)) != nullptr) {
    char* buf = nullptr;
    Py_ssize_t len = 0;
    if (PyBytes_AsStringAndSize(item, &buf, &len) == 0) {
      on_chunk(reinterpret_cast<const int16_t*>(buf),
               static_cast<size_t>(len / 2));
    }
    Py_DECREF(item);
  }
  bool ok = !PyErr_Occurred();
  if (!ok) *error = "streaming iteration failed: " + FetchPyError();
  Py_DECREF(iter);
  return ok;
}

}  // namespace wetts
