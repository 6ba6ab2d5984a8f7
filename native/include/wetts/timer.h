// Wall-clock timer (native-equivalent of runtime/core/utils/timer.h).

#ifndef WETTS_TIMER_H_
#define WETTS_TIMER_H_

#include <chrono>

namespace wetts {

class Timer {
 public:
  Timer() : start_(std::chrono::steady_clock::now()) {}
  void Reset() { start_ = std::chrono::steady_clock::now(); }
  // Elapsed milliseconds since construction / last Reset().
  int Elapsed() const {
    return static_cast<int>(std::chrono::duration_cast<std::chrono::milliseconds>(
                                std::chrono::steady_clock::now() - start_)
                                .count());
  }

 private:
  std::chrono::steady_clock::time_point start_;
};

}  // namespace wetts

#endif  // WETTS_TIMER_H_
