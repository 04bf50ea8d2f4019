// Trajectory bus: seqlock-protected double-buffered plan handoff.
//
// Replaces the reference's filesystem npz handoff between planner and
// controller (SURVEY.md section 5 "checkpoint/resume") with an in-memory
// realtime-safe channel: the solver thread publishes full plans; the 1 kHz
// control thread samples interpolated references without ever blocking the
// writer (readers retry on torn reads, which are rare and bounded).

#include "cmpc_runtime.h"

#include <atomic>
#include <cstring>
#include <vector>

namespace {

struct Plan {
  double t0 = 0.0;
  std::vector<double> X;  // (N+1, nx)
  std::vector<double> U;  // (N, nu)
  std::vector<double> K;  // (N, nu, nx)
};

}  // namespace

struct cmpc_bus {
  int horizon;
  int nx;
  int nu;
  double dt;
  // Double buffer with a seqlock: even sequence = stable, odd = writing.
  Plan buf[2];
  std::atomic<uint64_t> seq{0};
  std::atomic<int64_t> version{-1};
};

cmpc_bus* cmpc_bus_create(int horizon, int nx, int nu, double dt) {
  if (horizon <= 0 || nx <= 0 || nu <= 0 || dt <= 0) return nullptr;
  auto* bus = new cmpc_bus;
  bus->horizon = horizon;
  bus->nx = nx;
  bus->nu = nu;
  bus->dt = dt;
  for (auto& p : bus->buf) {
    p.X.assign(static_cast<size_t>(horizon + 1) * nx, 0.0);
    p.U.assign(static_cast<size_t>(horizon) * nu, 0.0);
    p.K.assign(static_cast<size_t>(horizon) * nu * nx, 0.0);
  }
  return bus;
}

void cmpc_bus_destroy(cmpc_bus* bus) { delete bus; }

void cmpc_bus_publish(cmpc_bus* bus, double t0, const double* X,
                      const double* U, const double* K) {
  const uint64_t s = bus->seq.load(std::memory_order_relaxed);
  // Write into the buffer NOT currently visible to readers.
  Plan& p = bus->buf[((s >> 1) + 1) & 1];
  p.t0 = t0;
  std::memcpy(p.X.data(), X, p.X.size() * sizeof(double));
  std::memcpy(p.U.data(), U, p.U.size() * sizeof(double));
  if (K) {
    std::memcpy(p.K.data(), K, p.K.size() * sizeof(double));
  } else {
    std::fill(p.K.begin(), p.K.end(), 0.0);
  }
  // Flip: odd marks the transition, next even value selects the new buffer.
  bus->seq.store(s + 1, std::memory_order_release);
  bus->seq.store(s + 2, std::memory_order_release);
  bus->version.fetch_add(1, std::memory_order_release);
}

int64_t cmpc_bus_sample(const cmpc_bus* bus, double t, double* x_ref,
                        double* u_ff, double* k_fb) {
  const int64_t version = bus->version.load(std::memory_order_acquire);
  if (version < 0) return -1;
  const int nx = bus->nx, nu = bus->nu, N = bus->horizon;
  for (;;) {
    const uint64_t s0 = bus->seq.load(std::memory_order_acquire);
    if (s0 & 1) continue;  // writer mid-flight
    const Plan& p = bus->buf[(s0 >> 1) & 1];

    double tau = (t - p.t0) / bus->dt;
    if (tau < 0) tau = 0;
    if (tau > N) tau = N;
    int k = static_cast<int>(tau);
    if (k >= N) k = N - 1;
    const double frac = tau - k;

    const double* x0 = &p.X[static_cast<size_t>(k) * nx];
    const double* x1 = &p.X[static_cast<size_t>(k + 1) * nx];
    for (int i = 0; i < nx; ++i) x_ref[i] = x0[i] + frac * (x1[i] - x0[i]);
    std::memcpy(u_ff, &p.U[static_cast<size_t>(k) * nu],
                nu * sizeof(double));
    std::memcpy(k_fb, &p.K[static_cast<size_t>(k) * nu * nx],
                static_cast<size_t>(nu) * nx * sizeof(double));

    if (bus->seq.load(std::memory_order_acquire) == s0) return version;
    // torn read (writer flipped while we copied) -- retry
  }
}
