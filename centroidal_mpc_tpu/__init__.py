"""centroidal_mpc_tpu: a TPU-native stochastic centroidal MPC framework.

A from-scratch JAX/XLA re-design of the capability surface of
ahmadgazar/centroidal-MPC: stochastic sequential-convex-programming (SCP)
trajectory optimization for the centroidal dynamics of legged robots
(solo12 quadruped, bolt biped, talos humanoid), with contact planning,
chance-constrained friction cones, LQR feedback synthesis, Monte-Carlo
evaluation, and scenario-batch / mesh-sharded solving.

Quick start::

    import jax.numpy as jnp
    from centroidal_mpc_tpu import presets, solve_scp

    prob = presets.build_problem(presets.SOLO12_TROT, dtype=jnp.float32)
    sol = solve_scp(prob.model, prob.plan.schedule, prob.ocp,
                    prob.X0, prob.U0, prob.scp)
"""

from centroidal_mpc_tpu.config import gaits, presets, robots
from centroidal_mpc_tpu.contact.plan import (ContactPlan, ContactSchedule,
                                             build_contact_plan)
from centroidal_mpc_tpu.models.centroidal import (CentroidalModel,
                                                  TrajectoryData,
                                                  compute_trajectory_data,
                                                  dynamics_step, rollout)
from centroidal_mpc_tpu.ops.admm import QPSettings, QPSolution, solve_qp
from centroidal_mpc_tpu.solver.ocp import OcpConfig, QPData, build_qp
from centroidal_mpc_tpu.solver.scp import ScpSettings, ScpSolution, solve_scp

__version__ = "0.1.0"

__all__ = [
    "CentroidalModel", "ContactPlan", "ContactSchedule", "OcpConfig",
    "QPData", "QPSettings", "QPSolution", "ScpSettings", "ScpSolution",
    "TrajectoryData", "build_contact_plan", "build_qp",
    "compute_trajectory_data", "dynamics_step", "gaits", "presets",
    "robots", "rollout", "solve_qp", "solve_scp",
]
