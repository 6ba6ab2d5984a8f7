// Native HTTP synthesis server.
//
// Parity target: runtime/core/http/http_server.cc:38-152 +
// bin/http_server_main.cc — blocking accept loop, thread-per-connection,
// GET params `text` and `name`, response JSON {"audio": <base64 WAV>}.
// Adds /stream (chunked int16 PCM) mirroring the decoupled Triton streaming
// recipe (runtime/cpu_triton_stream). Model execution runs on the embedded
// XLA/PJRT engine; one synthesis at a time per chip (mutex), matching the
// single-session serialization of the reference's shared Ort session.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <csignal>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "wetts/embed_engine.h"
#include "wetts/flags.h"
#include "wetts/timer.h"
#include "wetts/wav.h"

namespace {

wetts::EmbeddedTts* g_tts = nullptr;
std::mutex g_synth_mutex;

std::string Base64Encode(const uint8_t* data, size_t n) {
  static const char kTable[] =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  std::string out;
  out.reserve((n + 2) / 3 * 4);
  for (size_t i = 0; i < n; i += 3) {
    uint32_t v = data[i] << 16;
    if (i + 1 < n) v |= data[i + 1] << 8;
    if (i + 2 < n) v |= data[i + 2];
    out.push_back(kTable[(v >> 18) & 63]);
    out.push_back(kTable[(v >> 12) & 63]);
    out.push_back(i + 1 < n ? kTable[(v >> 6) & 63] : '=');
    out.push_back(i + 2 < n ? kTable[v & 63] : '=');
  }
  return out;
}

std::string UrlDecode(const std::string& s) {
  std::string out;
  out.reserve(s.size());
  for (size_t i = 0; i < s.size(); ++i) {
    if (s[i] == '+') {
      out.push_back(' ');
    } else if (s[i] == '%' && i + 2 < s.size()) {
      char hex[3] = {s[i + 1], s[i + 2], 0};
      out.push_back(static_cast<char>(std::strtol(hex, nullptr, 16)));
      i += 2;
    } else {
      out.push_back(s[i]);
    }
  }
  return out;
}

std::string JsonEscape(const std::string& s) {
  std::string out;
  for (char c : s) {
    switch (c) {
      case '"': out += "\\\""; break;
      case '\\': out += "\\\\"; break;
      case '\n': out += "\\n"; break;
      case '\r': out += "\\r"; break;
      case '\t': out += "\\t"; break;
      default:
        if (static_cast<unsigned char>(c) < 0x20) {
          char buf[8];
          std::snprintf(buf, sizeof(buf), "\\u%04x", c);
          out += buf;
        } else {
          out.push_back(c);
        }
    }
  }
  return out;
}

void SendAll(int fd, const std::string& data) {
  size_t sent = 0;
  while (sent < data.size()) {
    ssize_t n = ::send(fd, data.data() + sent, data.size() - sent, 0);
    if (n <= 0) return;
    sent += static_cast<size_t>(n);
  }
}

void SendJson(int fd, int code, const std::string& body) {
  const char* status = code == 200 ? "200 OK"
                       : code == 400 ? "400 Bad Request"
                                     : "500 Internal Server Error";
  std::string resp = "HTTP/1.1 " + std::string(status) +
                     "\r\nContent-Type: application/json\r\nContent-Length: " +
                     std::to_string(body.size()) +
                     "\r\nConnection: close\r\n\r\n" + body;
  SendAll(fd, resp);
}

// Query-string -> (text, name)
void ParseQuery(const std::string& query, std::string* text,
                std::string* name) {
  size_t pos = 0;
  while (pos < query.size()) {
    size_t amp = query.find('&', pos);
    std::string pair = query.substr(
        pos, amp == std::string::npos ? std::string::npos : amp - pos);
    size_t eq = pair.find('=');
    if (eq != std::string::npos) {
      std::string key = pair.substr(0, eq);
      std::string value = UrlDecode(pair.substr(eq + 1));
      if (key == "text") *text = value;
      if (key == "name") *name = value;
    }
    if (amp == std::string::npos) break;
    pos = amp + 1;
  }
}

void HandleStream(int fd, const std::string& text, const std::string& name) {
  SendAll(fd,
          "HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n"
          "Transfer-Encoding: chunked\r\nConnection: close\r\n\r\n");
  std::string error;
  std::lock_guard<std::mutex> lock(g_synth_mutex);
  bool ok = g_tts->StreamSynthesize(
      text, name,
      [fd](const int16_t* pcm, size_t n) {
        size_t bytes = n * 2;
        char head[32];
        std::snprintf(head, sizeof(head), "%zx\r\n", bytes);
        SendAll(fd, head);
        std::string payload(reinterpret_cast<const char*>(pcm), bytes);
        SendAll(fd, payload + "\r\n");
      },
      &error);
  if (!ok) std::fprintf(stderr, "stream error: %s\n", error.c_str());
  SendAll(fd, "0\r\n\r\n");
}

void HandleConnection(int fd) {
  std::string request;
  char buf[4096];
  // Read until end of headers (GET only; no body expected).
  while (request.find("\r\n\r\n") == std::string::npos) {
    ssize_t n = ::recv(fd, buf, sizeof(buf), 0);
    if (n <= 0) break;
    request.append(buf, static_cast<size_t>(n));
    if (request.size() > 1 << 20) break;
  }
  size_t sp1 = request.find(' ');
  size_t sp2 = request.find(' ', sp1 + 1);
  if (sp1 == std::string::npos || sp2 == std::string::npos) {
    ::close(fd);
    return;
  }
  std::string target = request.substr(sp1 + 1, sp2 - sp1 - 1);
  std::string path = target, query;
  size_t qm = target.find('?');
  if (qm != std::string::npos) {
    path = target.substr(0, qm);
    query = target.substr(qm + 1);
  }
  std::string text, name;
  ParseQuery(query, &text, &name);
  if (text.empty()) {
    SendJson(fd, 400,
             "{\"status\": \"failed\", \"message\": \"missing `text`\"}");
    ::close(fd);
    return;
  }
  if (path == "/stream") {
    HandleStream(fd, text, name);
    ::close(fd);
    return;
  }
  std::vector<int16_t> audio;
  std::string error;
  wetts::Timer timer;
  bool ok;
  {
    std::lock_guard<std::mutex> lock(g_synth_mutex);
    ok = g_tts->Synthesize(text, name, &audio, &error);
  }
  if (!ok) {
    SendJson(fd, 500, "{\"status\": \"failed\", \"message\": \"" +
                          JsonEscape(error) + "\"}");
    ::close(fd);
    return;
  }
  std::fprintf(stderr, "synthesized %zu samples in %d ms\n", audio.size(),
               timer.Elapsed());
  std::vector<uint8_t> wav =
      wetts::WavBytes(audio.data(), audio.size(), g_tts->sample_rate());
  std::string body = "{\"status\": \"ok\", \"message\": \"success\", "
                     "\"sample_rate\": " +
                     std::to_string(g_tts->sample_rate()) +
                     ", \"audio\": \"" + Base64Encode(wav.data(), wav.size()) +
                     "\"}";
  SendJson(fd, 200, body);
  ::close(fd);
}

}  // namespace

int main(int argc, char* argv[]) {
  std::signal(SIGPIPE, SIG_IGN);
  wetts::Flags flags;
  std::string error;
  if (!flags.Parse(argc, argv, &error)) {
    std::fprintf(stderr, "flag error: %s\n", error.c_str());
    return 1;
  }
  std::string model_dir = flags.Get("model_dir");
  std::string repo_root = flags.Get("repo_root");
  int port = flags.GetInt("port", 8080);
  if (model_dir.empty()) {
    std::fprintf(stderr,
                 "usage: http_server_main --model_dir DIR [--port N]\n");
    return 1;
  }

  wetts::EmbeddedTts tts;
  if (!tts.Init(model_dir, repo_root, &error)) {
    std::fprintf(stderr, "init failed: %s\n", error.c_str());
    return 1;
  }
  g_tts = &tts;

  int listen_fd = ::socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  ::setsockopt(listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (::bind(listen_fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) !=
          0 ||
      ::listen(listen_fd, 64) != 0) {
    std::fprintf(stderr, "cannot listen on port %d\n", port);
    return 1;
  }
  std::fprintf(stderr, "listening on :%d (sample rate %d)\n", port,
               tts.sample_rate());
  // Blocking accept loop, thread-per-connection (http_server.cc:139-151).
  for (;;) {
    int fd = ::accept(listen_fd, nullptr, nullptr);
    if (fd < 0) continue;
    std::thread(HandleConnection, fd).detach();
  }
  return 0;
}
