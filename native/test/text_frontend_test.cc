// Unit tests for the native text frontend (assert-based; no gtest dep in
// the image). Ports the reference gtest cases (runtime/core/test/
// sandhi_test.cc, word_break_test.cc, sentence_break_test.cc).

#include <cassert>
#include <iostream>
#include <string>
#include <vector>

#include "wetts/text_frontend.h"

using wetts::SentenceSegment;
using wetts::Sandhi;
using wetts::WordBreak;

#define CHECK_EQ(a, b)                                              \
  do {                                                              \
    if (!((a) == (b))) {                                            \
      std::cerr << "FAIL at line " << __LINE__ << std::endl;        \
      return 1;                                                     \
    }                                                               \
  } while (0)

static std::vector<std::string> V(std::initializer_list<const char*> xs) {
  return std::vector<std::string>(xs.begin(), xs.end());
}

int main() {
  // ---- sandhi ----
  {
    std::vector<std::string> p = {"ni3", "hao3"};
    Sandhi("你好", &p);
    CHECK_EQ(p, V({"ni2", "hao3"}));
  }
  {
    std::vector<std::string> p = {"bu4", "yao4"};
    Sandhi("不要", &p);
    CHECK_EQ(p, V({"bu2", "yao4"}));
  }
  {
    std::vector<std::string> p = {"bu4", "hao3"};
    Sandhi("不好", &p);
    CHECK_EQ(p, V({"bu4", "hao3"}));
  }
  {
    std::vector<std::string> p = {"yi1", "ge4"};
    Sandhi("一个", &p);
    CHECK_EQ(p, V({"yi2", "ge4"}));
  }
  {
    std::vector<std::string> p = {"yi1", "qi3"};
    Sandhi("一起", &p);
    CHECK_EQ(p, V({"yi4", "qi3"}));
  }
  {
    std::vector<std::string> p = {"di4", "yi1", "ming2"};
    Sandhi("第一名", &p);
    CHECK_EQ(p, V({"di4", "yi1", "ming2"}));
  }
  {
    std::vector<std::string> p = {"bu4", "hen3", "hao3"};
    Sandhi("不很好", &p);
    CHECK_EQ(p, V({"bu4", "hen2", "hao3"}));
  }
  {
    std::vector<std::string> p = {"hao3"};
    Sandhi("好", &p);
    CHECK_EQ(p, V({"hao3"}));
  }

  // ---- sentence break ----
  CHECK_EQ(SentenceSegment("我爱编程，但是今天下雨了。明天呢？好吧！"),
           V({"我爱编程，但是今天下雨了。", "明天呢？", "好吧！"}));
  CHECK_EQ(SentenceSegment("Hello, world! Are you OK? Yes; good."),
           V({"Hello, world!", "Are you OK?", "Yes;", "good."}));
  CHECK_EQ(SentenceSegment("abc def ghi jkl", 4),
           V({"abc", "def", "ghi", "jkl"}));
  CHECK_EQ(SentenceSegment("我爱编程学习", 3), V({"我爱编", "程学习"}));
  CHECK_EQ(SentenceSegment(""), V({}));

  // ---- word break ----
  {
    WordBreak wb({"我", "爱", "我爱", "编程", "中国", "中国人", "人民"});
    CHECK_EQ(wb.Segment("我爱编程"), V({"我爱", "编程"}));
    CHECK_EQ(wb.Segment("中国人民"), V({"中国人", "民"}));
    CHECK_EQ(wb.Segment("hello world"), V({"hello", " ", "world"}));
    CHECK_EQ(wb.Segment("我爱python编程"), V({"我爱", "python", "编程"}));
    CHECK_EQ(wb.Segment("猫狗"), V({"猫", "狗"}));
    CHECK_EQ(wb.Segment(""), V({}));
  }

  std::cout << "all native text tests passed" << std::endl;
  return 0;
}
