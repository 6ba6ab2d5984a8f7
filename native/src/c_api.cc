#include "wetts/c_api.h"

#include <cstring>
#include <sstream>
#include <string>
#include <vector>

#include "wetts/text_frontend.h"

namespace {

constexpr char kSep = '\x1e';

char* Dup(const std::string& s) {
  char* out = new char[s.size() + 1];
  std::memcpy(out, s.data(), s.size());
  out[s.size()] = '\0';
  return out;
}

char* Join(const std::vector<std::string>& items) {
  std::string out;
  for (size_t i = 0; i < items.size(); ++i) {
    if (i) out += kSep;
    out += items[i];
  }
  return Dup(out);
}

std::vector<std::string> Split(const char* s) {
  std::vector<std::string> out;
  std::stringstream ss(s ? s : "");
  std::string item;
  while (std::getline(ss, item, kSep)) out.push_back(item);
  return out;
}

}  // namespace

extern "C" {

void wetts_free(char* ptr) { delete[] ptr; }

char* wetts_sentence_segment(const char* text, size_t max_clause_len) {
  return Join(wetts::SentenceSegment(text ? text : "", max_clause_len));
}

void* wetts_wordbreak_new(const char* lexicon_path) {
  try {
    return new wetts::WordBreak(
        wetts::WordBreak::FromLexiconFile(lexicon_path));
  } catch (...) {
    return nullptr;
  }
}

void wetts_wordbreak_delete(void* handle) {
  delete static_cast<wetts::WordBreak*>(handle);
}

char* wetts_wordbreak_segment(void* handle, const char* text) {
  auto* wb = static_cast<wetts::WordBreak*>(handle);
  return Join(wb->Segment(text ? text : ""));
}

void* wetts_lexicon_new(const char* path) {
  try {
    return new wetts::Lexicon(path);
  } catch (...) {
    return nullptr;
  }
}

void wetts_lexicon_delete(void* handle) {
  delete static_cast<wetts::Lexicon*>(handle);
}

int wetts_lexicon_num_prons(void* handle, const char* word) {
  return static_cast<wetts::Lexicon*>(handle)->NumProns(word);
}

char* wetts_lexicon_prons(void* handle, const char* word) {
  return Join(static_cast<wetts::Lexicon*>(handle)->Prons(word));
}

char* wetts_sandhi(const char* word, const char* pinyin_list) {
  std::vector<std::string> pinyin = Split(pinyin_list);
  wetts::Sandhi(word ? word : "", &pinyin);
  return Join(pinyin);
}

void* wetts_g2p_en_new(const char* cmudict_path) {
  try {
    return new wetts::G2pEn(cmudict_path);
  } catch (...) {
    return nullptr;
  }
}

void wetts_g2p_en_delete(void* handle) {
  delete static_cast<wetts::G2pEn*>(handle);
}

char* wetts_g2p_en_convert(void* handle, const char* grapheme) {
  return Join(
      static_cast<wetts::G2pEn*>(handle)->Convert(grapheme ? grapheme : ""));
}

}  // extern "C"
