// Native text-frontend library (C++17).
//
// Native-equivalent of the reference's runtime/core/frontend/* components
// (word_break.cc, sentence_break.cc, sandhi.cc, lexicon.cc, g2p_en.cc,
// utils/string.cc), re-implemented for this framework: the latency-critical
// deterministic text pipeline runs natively; the neural parts (BERT scorer,
// VITS) run on TPU via JAX. A C ABI (wetts_c_api.h) exposes everything to
// Python through ctypes.

#ifndef WETTS_TEXT_FRONTEND_H_
#define WETTS_TEXT_FRONTEND_H_

#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace wetts {

// ---------- UTF-8 utilities ----------
std::vector<std::string> SplitUtf8Chars(const std::string& text);
size_t Utf8Length(const std::string& text);
std::string Trim(const std::string& s);
bool IsAsciiAlnum(const std::string& ch);
bool IsEnglishWord(const std::string& word);
std::string ToLower(const std::string& s);

// ---------- sentence segmentation ----------
// Splits at .;!?。；！？ and newlines; forced splits at max_clause_len prefer
// safe break points (commas/colons/quotes/、, spaces, ASCII word edges) and
// never cut inside an English word or number run.
std::vector<std::string> SentenceSegment(const std::string& text,
                                         size_t max_clause_len = 0);

// ---------- word segmentation ----------
class WordBreak {
 public:
  explicit WordBreak(const std::unordered_set<std::string>& words);
  // loads the first column of a lexicon file
  static WordBreak FromLexiconFile(const std::string& path);

  std::vector<std::string> Segment(const std::string& text) const;
  bool HasWord(const std::string& word) const {
    return dict_.count(word) > 0;
  }
  size_t DictSize() const { return dict_.size(); }

 private:
  size_t LongestMatch(const std::string& text, size_t pos) const;
  std::unordered_set<std::string> dict_;
  size_t max_word_bytes_ = 0;
};

// ---------- lexicon ----------
class Lexicon {
 public:
  explicit Lexicon(const std::string& path);
  int NumProns(const std::string& word) const;
  const std::vector<std::string>& Prons(const std::string& word) const;
  const std::unordered_map<std::string, std::vector<std::string>>& Table()
      const {
    return table_;
  }

 private:
  std::unordered_map<std::string, std::vector<std::string>> table_;
  std::vector<std::string> empty_;
};

// ---------- tone sandhi ----------
// In-place rewrite of tone-suffixed pinyin syllables for one word:
// 3+3 -> 2+3; 不 + tone4 -> bu2; 一: 第一 -> yi1, +tone4 -> yi2, else yi4.
void Sandhi(const std::string& word, std::vector<std::string>* pinyin);

// ---------- English G2P ----------
class G2pEn {
 public:
  explicit G2pEn(const std::string& cmudict_path);
  std::vector<std::string> Convert(const std::string& grapheme) const;

 private:
  void Spell(const std::string& word,
             std::vector<std::string>* phones) const;
  // fewest-pieces split into dictionary words (>= 3 chars each); empty
  // result means no full split exists (phonetisaurus-FST role, twin of
  // wetts_tpu/text/g2p_en.py::_compound_split)
  std::vector<std::string> CompoundSplit(const std::string& word) const;
  std::unordered_map<std::string, std::vector<std::string>> dict_;
};

// rule-based whole-word pronunciation for OOV words (ARPAbet); twin of
// wetts_tpu/text/g2p_en.py::letter_to_sound
std::vector<std::string> LetterToSound(const std::string& word);

}  // namespace wetts

#endif  // WETTS_TEXT_FRONTEND_H_
