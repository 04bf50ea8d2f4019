// Absolute-deadline periodic ticker for the control loop.
//
// The reference's 1 kHz loop is a free-running Python for-loop stepping
// PyBullet (src/simulate_solo.py:281-309) with no timing discipline.  For
// deployment, the control thread needs fixed-rate ticks: this uses
// clock_nanosleep(TIMER_ABSTIME) against CLOCK_MONOTONIC so periods don't
// drift, skips forward after overruns, and tracks wakeup-lateness stats.

#include "cmpc_runtime.h"

#include <time.h>

namespace {

constexpr int64_t kNsPerSec = 1000000000LL;

int64_t now_ns() {
  timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec * kNsPerSec + ts.tv_nsec;
}

}  // namespace

struct cmpc_ticker {
  int64_t period_ns;
  int64_t next_deadline_ns;
  int64_t count = 0;
  int64_t max_late_ns = 0;
  double sum_late_ns = 0.0;
};

cmpc_ticker* cmpc_ticker_create(int64_t period_ns) {
  if (period_ns <= 0) return nullptr;
  auto* t = new cmpc_ticker;
  t->period_ns = period_ns;
  t->next_deadline_ns = now_ns() + period_ns;
  return t;
}

void cmpc_ticker_destroy(cmpc_ticker* t) { delete t; }

int64_t cmpc_ticker_wait(cmpc_ticker* t) {
  timespec deadline;
  deadline.tv_sec = t->next_deadline_ns / kNsPerSec;
  deadline.tv_nsec = t->next_deadline_ns % kNsPerSec;
  while (clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &deadline,
                         nullptr) != 0) {
  }
  const int64_t late = now_ns() - t->next_deadline_ns;
  t->count += 1;
  if (late > t->max_late_ns) t->max_late_ns = late;
  t->sum_late_ns += static_cast<double>(late);
  // Advance; if we overran whole periods, skip them (no tick pileup).
  t->next_deadline_ns += t->period_ns;
  const int64_t now = now_ns();
  if (t->next_deadline_ns <= now) {
    const int64_t missed =
        (now - t->next_deadline_ns) / t->period_ns + 1;
    t->next_deadline_ns += missed * t->period_ns;
  }
  return late;
}

void cmpc_ticker_stats(const cmpc_ticker* t, int64_t* count,
                       int64_t* max_late_ns, double* mean_late_ns) {
  if (count) *count = t->count;
  if (max_late_ns) *max_late_ns = t->max_late_ns;
  if (mean_late_ns)
    *mean_late_ns = t->count ? t->sum_late_ns / t->count : 0.0;
}
