// Contact-plan expansion: gait spec -> dense per-knot schedule.
//
// Native mirror of centroidal_mpc_tpu/contact/plan.py (reference
// src/contact_plan.py:112-264): phase templates per gait type, per-phase
// swing sets, forward stepping of swung feet by step_length, identity
// contact frames, zeros for inactive knots.  The Python and C++ expanders
// are cross-checked in tests.

#include "cmpc_runtime.h"

#include <cstring>
#include <string>
#include <vector>

namespace {

enum Gait { TROT = 0, PACE = 1, BOUND = 2 };

// Swing-foot index sets per phase, quadruped order FR,FL,HR,HL
// (Debris.idx mapping, reference src/contact_plan.py:29-37).
struct PhaseSpec {
  bool is_step;
  std::vector<int> swing;
};

std::vector<PhaseSpec> phases_for(int gait_type, int nb_steps,
                                  int n_contacts) {
  std::vector<int> a, b;
  if (n_contacts == 2) {           // biped pace: RF then LF
    a = {0};
    b = {1};
  } else if (gait_type == TROT) {  // rflh / lfrh
    a = {0, 3};
    b = {1, 2};
  } else if (gait_type == PACE) {  // rfrh / lflh
    a = {0, 2};
    b = {1, 3};
  } else {                         // BOUND: rflf / rhlh
    a = {0, 1};
    b = {2, 3};
  }
  std::vector<PhaseSpec> out;
  for (int s = 0; s < nb_steps; ++s) {
    out.push_back({false, {}});
    out.push_back({true, a});
    out.push_back({false, {}});
    out.push_back({true, b});
    if (s == nb_steps - 1) out.push_back({false, {}});
  }
  return out;
}

}  // namespace

int cmpc_plan_horizon(int gait_type, int step_knots, int support_knots,
                      int nb_steps) {
  if (gait_type < 0 || gait_type > 2) return -1;
  if (nb_steps <= 0 || step_knots <= 0 || support_knots <= 0) return -1;
  // per cycle: DS + step + DS + step; closing DS after the last cycle
  return nb_steps * (2 * support_knots + 2 * step_knots) + support_knots;
}

int cmpc_expand_contact_plan(int gait_type, double step_length,
                             int step_knots, int support_knots, int nb_steps,
                             int n_contacts, const double* feet0,
                             double* logic, double* pos, double* rot) {
  if (gait_type < 0 || gait_type > 2) return -1;
  if (n_contacts != 2 && n_contacts != 4) return -1;
  const int total =
      cmpc_plan_horizon(gait_type, step_knots, support_knots, nb_steps);
  if (total <= 0) return -1;

  std::vector<double> feet(feet0, feet0 + 3 * n_contacts);
  const int C = n_contacts;
  std::memset(logic, 0, sizeof(double) * total * C);
  std::memset(pos, 0, sizeof(double) * total * C * 3);
  std::memset(rot, 0, sizeof(double) * total * C * 9);

  int knot = 0;
  for (const PhaseSpec& ph : phases_for(gait_type, nb_steps, C)) {
    const int knots = ph.is_step ? step_knots : support_knots;
    std::vector<bool> active(C, true);
    for (int c : ph.swing) active[c] = false;
    for (int k = knot; k < knot + knots; ++k) {
      for (int c = 0; c < C; ++c) {
        if (!active[c]) continue;
        logic[k * C + c] = 1.0;
        for (int d = 0; d < 3; ++d)
          pos[(k * C + c) * 3 + d] = feet[c * 3 + d];
        for (int d = 0; d < 3; ++d)
          rot[(k * C + c) * 9 + d * 3 + d] = 1.0;  // identity frame
      }
    }
    // swung feet land step_length ahead (affects following phases,
    // reference src/contact_plan.py:188-189)
    for (int c : ph.swing) feet[c * 3 + 0] += step_length;
    knot += knots;
  }
  return knot;
}
