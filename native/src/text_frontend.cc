// Native text-frontend implementation. See include/wetts/text_frontend.h.

#include "wetts/text_frontend.h"

#include <algorithm>
#include <cctype>
#include <fstream>
#include <sstream>
#include <stdexcept>

namespace wetts {

// ---------------------------------------------------------------------------
// UTF-8
// ---------------------------------------------------------------------------

static size_t Utf8CharLen(unsigned char lead) {
  if (lead < 0x80) return 1;
  if ((lead >> 5) == 0x6) return 2;
  if ((lead >> 4) == 0xE) return 3;
  if ((lead >> 3) == 0x1E) return 4;
  return 1;
}

std::vector<std::string> SplitUtf8Chars(const std::string& text) {
  std::vector<std::string> chars;
  size_t pos = 0;
  while (pos < text.size()) {
    size_t len = Utf8CharLen(static_cast<unsigned char>(text[pos]));
    if (pos + len > text.size()) len = 1;
    chars.emplace_back(text.substr(pos, len));
    pos += len;
  }
  return chars;
}

size_t Utf8Length(const std::string& text) {
  return SplitUtf8Chars(text).size();
}

std::string Trim(const std::string& s) {
  size_t b = s.find_first_not_of(" \t\r\n");
  if (b == std::string::npos) return "";
  size_t e = s.find_last_not_of(" \t\r\n");
  return s.substr(b, e - b + 1);
}

bool IsAsciiAlnum(const std::string& ch) {
  return ch.size() == 1 &&
         std::isalnum(static_cast<unsigned char>(ch[0])) != 0;
}

bool IsEnglishWord(const std::string& word) {
  if (word.empty()) return false;
  for (char c : word) {
    unsigned char u = static_cast<unsigned char>(c);
    if (u >= 128 || !(std::isalpha(u) || c == '\'')) return false;
  }
  return true;
}

std::string ToLower(const std::string& s) {
  std::string out = s;
  std::transform(out.begin(), out.end(), out.begin(), [](unsigned char c) {
    return static_cast<char>(std::tolower(c));
  });
  return out;
}

// ---------------------------------------------------------------------------
// Sentence segmentation
// ---------------------------------------------------------------------------

namespace {

const std::unordered_set<std::string> kSentenceDelims = {
    ".", ";", "!", "?", "。", "；", "！", "？", "\n", "\r"};
const std::unordered_set<std::string> kSafeBreaks = {
    ",", "，", ":", "：", "\"", "“", "”", "、"};

}  // namespace

std::vector<std::string> SentenceSegment(const std::string& text,
                                         size_t max_clause_len) {
  std::vector<std::string> sentences;
  std::string current;
  size_t current_chars = 0;
  size_t last_safe = 0;  // byte offset into `current`
  bool in_ascii_word = false;

  auto emit = [&](const std::string& piece) {
    std::string t = Trim(piece);
    if (!t.empty()) sentences.push_back(t);
  };

  for (const auto& ch : SplitUtf8Chars(text)) {
    if (kSentenceDelims.count(ch)) {
      current += ch;
      emit(current);
      current.clear();
      current_chars = 0;
      last_safe = 0;
      in_ascii_word = false;
      continue;
    }
    bool alnum = IsAsciiAlnum(ch);
    bool space = (ch == " " || ch == "\t");
    if (kSafeBreaks.count(ch)) {
      last_safe = current.size() + ch.size();  // split AFTER the punctuation
      in_ascii_word = false;
    } else if (space) {
      last_safe = current.size();
      in_ascii_word = false;
    } else if (!in_ascii_word && alnum) {
      last_safe = current.size();
      in_ascii_word = true;
    } else if (in_ascii_word && !alnum) {
      last_safe = current.size();
      in_ascii_word = false;
    }
    current += ch;
    ++current_chars;
    if (max_clause_len > 0 && current_chars >= max_clause_len) {
      if (last_safe > 0) {
        emit(current.substr(0, last_safe));
        current = current.substr(last_safe);
        current_chars = Utf8Length(current);
      } else {
        emit(current);
        current.clear();
        current_chars = 0;
      }
      last_safe = 0;
      in_ascii_word = false;
    }
  }
  emit(current);
  return sentences;
}

// ---------------------------------------------------------------------------
// Word segmentation
// ---------------------------------------------------------------------------

WordBreak::WordBreak(const std::unordered_set<std::string>& words)
    : dict_(words) {
  for (const auto& w : dict_) max_word_bytes_ = std::max(max_word_bytes_, w.size());
}

WordBreak WordBreak::FromLexiconFile(const std::string& path) {
  std::ifstream in(path);
  if (!in.is_open()) throw std::runtime_error("cannot open " + path);
  std::unordered_set<std::string> words;
  std::string line;
  while (std::getline(in, line)) {
    size_t pos = line.find_first_of(" \t");
    std::string word = (pos == std::string::npos) ? Trim(line)
                                                  : line.substr(0, pos);
    if (!word.empty()) words.insert(word);
  }
  return WordBreak(words);
}

size_t WordBreak::LongestMatch(const std::string& text, size_t pos) const {
  size_t limit = std::min(text.size() - pos, max_word_bytes_);
  for (size_t len = limit; len >= 1; --len) {
    if (dict_.count(text.substr(pos, len))) return len;
  }
  return 0;
}

std::vector<std::string> WordBreak::Segment(const std::string& text) const {
  std::vector<std::string> words;
  size_t pos = 0;
  const size_t n = text.size();
  while (pos < n) {
    size_t match = LongestMatch(text, pos);
    if (match > 0) {
      words.push_back(text.substr(pos, match));
      pos += match;
      continue;
    }
    unsigned char ch = static_cast<unsigned char>(text[pos]);
    if (ch < 128 && std::isalnum(ch)) {
      size_t end = pos;
      while (end < n) {
        unsigned char c = static_cast<unsigned char>(text[end]);
        if (!(c < 128 && std::isalnum(c))) break;
        ++end;
      }
      words.push_back(text.substr(pos, end - pos));
      pos = end;
    } else {
      size_t len = Utf8CharLen(ch);
      if (pos + len > n) len = 1;
      words.push_back(text.substr(pos, len));
      pos += len;
    }
  }
  return words;
}

// ---------------------------------------------------------------------------
// Lexicon
// ---------------------------------------------------------------------------

Lexicon::Lexicon(const std::string& path) {
  std::ifstream in(path);
  if (!in.is_open()) throw std::runtime_error("cannot open " + path);
  std::string line;
  while (std::getline(in, line)) {
    size_t pos = line.find_first_of(" \t");
    if (pos == std::string::npos) continue;
    std::string word = line.substr(0, pos);
    std::string rest = Trim(line.substr(pos + 1));
    std::vector<std::string> prons;
    std::stringstream ss(rest);
    std::string item;
    while (std::getline(ss, item, ',')) {
      item = Trim(item);
      if (!item.empty()) prons.push_back(item);
    }
    if (!word.empty() && !prons.empty()) table_[word] = std::move(prons);
  }
}

int Lexicon::NumProns(const std::string& word) const {
  auto it = table_.find(word);
  return it == table_.end() ? 0 : static_cast<int>(it->second.size());
}

const std::vector<std::string>& Lexicon::Prons(const std::string& word) const {
  auto it = table_.find(word);
  if (it != table_.end()) return it->second;
  auto unk = table_.find("<UNK>");
  return unk != table_.end() ? unk->second : empty_;
}

// ---------------------------------------------------------------------------
// Sandhi
// ---------------------------------------------------------------------------

void Sandhi(const std::string& word, std::vector<std::string>* pinyin) {
  std::vector<std::string> chars = SplitUtf8Chars(word);
  if (chars.size() != pinyin->size() || chars.empty()) return;
  for (size_t i = 0; i + 1 < chars.size(); ++i) {
    std::string& cur = (*pinyin)[i];
    char cur_tone = cur.back();
    char next_tone = (*pinyin)[i + 1].back();
    if (cur_tone == '3' && next_tone == '3') cur.back() = '2';
    if (chars[i] == "不" && next_tone == '4') cur.back() = '2';  // 不
    if (chars[i] == "一") {                                      // 一
      if (i > 0 && chars[i - 1] == "第") {                       // 第
        cur.back() = '1';
      } else if (next_tone == '4') {
        cur.back() = '2';
      } else {
        cur.back() = '4';
      }
    }
  }
}

// ---------------------------------------------------------------------------
// English G2P
// ---------------------------------------------------------------------------

G2pEn::G2pEn(const std::string& cmudict_path) {
  std::ifstream in(cmudict_path);
  if (!in.is_open()) throw std::runtime_error("cannot open " + cmudict_path);
  std::string line;
  while (std::getline(in, line)) {
    std::stringstream ss(line);
    std::string word;
    ss >> word;
    if (word.empty()) continue;
    std::vector<std::string> phones;
    std::string p;
    while (ss >> p) phones.push_back(p);
    if (!phones.empty() && dict_.find(word) == dict_.end()) {
      dict_[word] = std::move(phones);
    }
  }
}

void G2pEn::Spell(const std::string& word,
                  std::vector<std::string>* phones) const {
  for (size_t i = 0; i < word.size(); ++i) {
    auto it = dict_.find(std::string(1, word[i]));
    if (it != dict_.end()) {
      phones->insert(phones->end(), it->second.begin(), it->second.end());
    }
    if (i + 1 < word.size()) phones->push_back("#0");
  }
}

std::vector<std::string> G2pEn::Convert(const std::string& grapheme) const {
  std::vector<std::string> phones;
  auto it = dict_.find(grapheme);
  if (it != dict_.end()) return it->second;
  if (grapheme.size() < 4) {
    Spell(grapheme, &phones);
    return phones;
  }
  // long OOV: split on '-' pieces, lookup-or-spell each
  std::vector<std::string> parts;
  std::stringstream ss(grapheme);
  std::string piece;
  while (std::getline(ss, piece, '-')) {
    if (!piece.empty()) parts.push_back(piece);
  }
  for (size_t i = 0; i < parts.size(); ++i) {
    auto pit = dict_.find(parts[i]);
    if (pit != dict_.end()) {
      phones.insert(phones.end(), pit->second.begin(), pit->second.end());
    } else {
      Spell(parts[i], &phones);
    }
    if (i + 1 < parts.size()) phones.push_back("#0");
  }
  return phones;
}

}  // namespace wetts
