// Minimal gflags-style flag parsing with flags-file support.
//
// Native-equivalent of the reference's gflags usage: tts_main reads
// `--flag=value` lines from `--frontend_flags` / `--vits_flags` files
// (runtime/core/bin/tts_main.cc:62-66, gflags::ReadFromFlagsFile). This
// header keeps the same UX (`--flag=value` or `--flag value` on the command
// line, one `--flag=value` per line in a flags file, '#' comments) without
// the gflags dependency.

#ifndef WETTS_FLAGS_H_
#define WETTS_FLAGS_H_

#include <fstream>
#include <map>
#include <string>
#include <vector>

namespace wetts {

class Flags {
 public:
  // Parses argv; any `--flags_file=<path>` flag is expanded in place
  // (command-line values win over flags-file values).
  bool Parse(int argc, char* argv[], std::string* error) {
    std::map<std::string, std::string> cli;
    for (int i = 1; i < argc; ++i) {
      std::string arg = argv[i];
      if (arg.rfind("--", 0) != 0) {
        *error = "unexpected positional argument: " + arg;
        return false;
      }
      arg = arg.substr(2);
      std::string key, value;
      size_t eq = arg.find('=');
      if (eq != std::string::npos) {
        key = arg.substr(0, eq);
        value = arg.substr(eq + 1);
      } else if (i + 1 < argc && std::string(argv[i + 1]).rfind("--", 0) != 0) {
        key = arg;
        value = argv[++i];
      } else {
        key = arg;
        value = "true";  // bare boolean flag
      }
      cli[key] = value;
    }
    auto ff = cli.find("flags_file");
    if (ff != cli.end()) {
      if (!LoadFile(ff->second, error)) return false;
    }
    for (const auto& kv : cli) values_[kv.first] = kv.second;
    return true;
  }

  bool LoadFile(const std::string& path, std::string* error) {
    std::ifstream in(path);
    if (!in) {
      *error = "cannot open flags file: " + path;
      return false;
    }
    std::string line;
    while (std::getline(in, line)) {
      // trim
      size_t b = line.find_first_not_of(" \t\r");
      if (b == std::string::npos) continue;
      size_t e = line.find_last_not_of(" \t\r");
      line = line.substr(b, e - b + 1);
      if (line.empty() || line[0] == '#') continue;
      if (line.rfind("--", 0) != 0) {
        *error = "malformed flags-file line: " + line;
        return false;
      }
      size_t eq = line.find('=');
      if (eq == std::string::npos) {
        values_[line.substr(2)] = "true";
      } else {
        values_[line.substr(2, eq - 2)] = line.substr(eq + 1);
      }
    }
    return true;
  }

  std::string Get(const std::string& key,
                  const std::string& fallback = "") const {
    auto it = values_.find(key);
    return it == values_.end() ? fallback : it->second;
  }

  int GetInt(const std::string& key, int fallback) const {
    auto it = values_.find(key);
    return it == values_.end() ? fallback : std::stoi(it->second);
  }

  bool GetBool(const std::string& key, bool fallback = false) const {
    auto it = values_.find(key);
    if (it == values_.end()) return fallback;
    return it->second == "true" || it->second == "1";
  }

 private:
  std::map<std::string, std::string> values_;
};

}  // namespace wetts

#endif  // WETTS_FLAGS_H_
