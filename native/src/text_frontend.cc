// Native text-frontend implementation. See include/wetts/text_frontend.h.

#include "wetts/text_frontend.h"

#include <algorithm>
#include <cctype>
#include <fstream>
#include <sstream>
#include <stdexcept>
#include <unordered_set>
#include <utility>

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

namespace {

bool IsVowelPhone(const std::string& p) {
  static const std::unordered_set<std::string> kVowels = {
      "AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
      "IH", "IY", "OW", "OY", "UH", "UW"};
  return kVowels.count(p) > 0;
}

// ordered letter-to-sound rules, longest-match first (twin of the Python
// _LTS_MULTI table — keep the two in sync; tests/test_native_text.py
// asserts convert() parity through them)
const std::vector<std::pair<std::string, std::vector<std::string>>>&
LtsMulti() {
  static const std::vector<std::pair<std::string, std::vector<std::string>>>
      kRules = {
          {"tion", {"SH", "AH", "N"}}, {"sion", {"ZH", "AH", "N"}},
          {"ould", {"UH", "D"}},       {"ough", {"OW"}},
          {"augh", {"AO"}},            {"eigh", {"EY"}},
          {"igh", {"AY"}},             {"tch", {"CH"}},
          {"dge", {"JH"}},             {"sch", {"S", "K"}},
          {"ing", {"IH", "NG"}},       {"ck", {"K"}},
          {"ch", {"CH"}},              {"sh", {"SH"}},
          {"th", {"TH"}},              {"ph", {"F"}},
          {"wh", {"W"}},               {"ng", {"NG"}},
          {"qu", {"K", "W"}},          {"ee", {"IY"}},
          {"ea", {"IY"}},              {"oo", {"UW"}},
          {"ou", {"AW"}},              {"ow", {"OW"}},
          {"ai", {"EY"}},              {"ay", {"EY"}},
          {"oa", {"OW"}},              {"oi", {"OY"}},
          {"oy", {"OY"}},              {"au", {"AO"}},
          {"aw", {"AO"}},              {"ew", {"UW"}},
          {"ue", {"UW"}},              {"ie", {"IY"}},
          {"ei", {"EY"}},              {"ar", {"AA", "R"}},
          {"er", {"ER"}},              {"ir", {"ER"}},
          {"ur", {"ER"}},              {"or", {"AO", "R"}},
          {"ll", {"L"}},               {"ss", {"S"}},
          {"tt", {"T"}},               {"pp", {"P"}},
          {"bb", {"B"}},               {"dd", {"D"}},
          {"ff", {"F"}},               {"gg", {"G"}},
          {"mm", {"M"}},               {"nn", {"N"}},
          {"rr", {"R"}},               {"zz", {"Z"}},
      };
  return kRules;
}

const std::unordered_map<char, std::vector<std::string>>& LtsSingle() {
  static const std::unordered_map<char, std::vector<std::string>> kMap = {
      {'a', {"AE"}}, {'b', {"B"}},      {'d', {"D"}}, {'e', {"EH"}},
      {'f', {"F"}},  {'h', {"HH"}},     {'i', {"IH"}}, {'j', {"JH"}},
      {'k', {"K"}},  {'l', {"L"}},      {'m', {"M"}}, {'n', {"N"}},
      {'o', {"AA"}}, {'p', {"P"}},      {'r', {"R"}}, {'s', {"S"}},
      {'t', {"T"}},  {'u', {"AH"}},     {'v', {"V"}}, {'w', {"W"}},
      {'x', {"K", "S"}}, {'z', {"Z"}},
  };
  return kMap;
}

bool IsAsciiVowel(char c) {
  return c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u';
}

}  // namespace

std::vector<std::string> LetterToSound(const std::string& word) {
  std::string w;
  w.reserve(word.size());
  for (char c : word) w.push_back(std::tolower(static_cast<unsigned char>(c)));
  static const std::unordered_map<char, std::vector<std::string>> kMagicE = {
      {'a', {"EY"}}, {'e', {"IY"}}, {'i', {"AY"}}, {'o', {"OW"}},
      {'u', {"UW"}}};
  std::vector<std::string> phones;
  int magic_pos = -1;
  if (w.size() >= 3 && w.back() == 'e' && !IsAsciiVowel(w[w.size() - 2]) &&
      IsAsciiVowel(w[w.size() - 3])) {
    magic_pos = static_cast<int>(w.size()) - 3;
    w.pop_back();
  }
  size_t i = 0;
  while (i < w.size()) {
    if (static_cast<int>(i) == magic_pos) {
      const auto& ph = kMagicE.at(w[i]);
      phones.insert(phones.end(), ph.begin(), ph.end());
      ++i;
      continue;
    }
    bool matched = false;
    for (const auto& rule : LtsMulti()) {
      if (w.compare(i, rule.first.size(), rule.first) == 0) {
        phones.insert(phones.end(), rule.second.begin(), rule.second.end());
        i += rule.first.size();
        matched = true;
        break;
      }
    }
    if (matched) continue;
    char c = w[i];
    char nxt = (i + 1 < w.size()) ? w[i + 1] : '\0';
    bool soft = (nxt == 'e' || nxt == 'i' || nxt == 'y');
    if (i == 0 && (w.compare(0, 2, "kn") == 0 || w.compare(0, 2, "gn") == 0)) {
      phones.push_back("N");
      i += 2;
      continue;
    }
    if (i == 0 && w.compare(0, 2, "wr") == 0) {
      phones.push_back("R");
      i += 2;
      continue;
    }
    if (c == 'c') {
      phones.push_back(soft ? "S" : "K");
    } else if (c == 'g') {
      phones.push_back(soft ? "JH" : "G");
    } else if (c == 'y') {
      if (i == 0) {
        phones.push_back("Y");
      } else if (i == w.size() - 1) {
        phones.push_back("IY");
      } else {
        phones.push_back("IH");
      }
    } else {
      auto it = LtsSingle().find(c);
      if (it != LtsSingle().end()) {
        phones.insert(phones.end(), it->second.begin(), it->second.end());
      }
    }
    ++i;
  }
  // stress: first vowel primary, the rest unstressed
  std::vector<std::string> out;
  out.reserve(phones.size());
  bool seen_vowel = false;
  for (const auto& p : phones) {
    if (IsVowelPhone(p)) {
      out.push_back(p + (seen_vowel ? "0" : "1"));
      seen_vowel = true;
    } else {
      out.push_back(p);
    }
  }
  return out;
}

std::vector<std::string> G2pEn::CompoundSplit(const std::string& word) const {
  const int n = static_cast<int>(word.size());
  // best[i]: fewest-pieces split of word[0:i]; size 0 + !valid = unset
  std::vector<std::vector<std::string>> best(n + 1);
  std::vector<bool> valid(n + 1, false);
  valid[0] = true;
  for (int i = 3; i <= n; ++i) {
    for (int j = std::max(0, i - 24); j <= i - 3; ++j) {
      if (!valid[j]) continue;
      std::string piece = word.substr(j, i - j);
      if (dict_.find(piece) == dict_.end()) continue;
      if (!valid[i] || best[j].size() + 1 < best[i].size()) {
        best[i] = best[j];
        best[i].push_back(std::move(piece));
        valid[i] = true;
      }
    }
  }
  return valid[n] ? best[n] : std::vector<std::string>();
}

std::vector<std::string> G2pEn::Convert(const std::string& grapheme) const {
  std::vector<std::string> phones;
  auto it = dict_.find(grapheme);
  if (it != dict_.end()) return it->second;
  if (grapheme.size() < 4) {
    Spell(grapheme, &phones);
    return phones;
  }
  // long OOV: split on '-' pieces; each piece is looked up, spelled (if
  // short), or pronounced whole via compound split / letter-to-sound
  // (phonetisaurus-FST role, g2p_en.cc:84-114)
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
    } else if (parts[i].size() < 4) {
      Spell(parts[i], &phones);
    } else {
      std::vector<std::string> split = CompoundSplit(parts[i]);
      if (!split.empty()) {
        for (const auto& w : split) {
          const auto& ph = dict_.at(w);
          phones.insert(phones.end(), ph.begin(), ph.end());
        }
      } else {
        std::vector<std::string> lts = LetterToSound(parts[i]);
        phones.insert(phones.end(), lts.begin(), lts.end());
      }
    }
    if (i + 1 < parts.size()) phones.push_back("#0");
  }
  return phones;
}

}  // namespace wetts
