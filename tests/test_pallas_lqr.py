"""Parity tests for the pallas DARE/LQR-gain kernel (ops/pallas_lqr.py)
against the XLA lqr_gain chain (models/centroidal.py), interpret mode on
CPU (compiled-Mosaic parity is certified by the TPU bench kernel_parity
field, which exercises this kernel inside the full solve)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.models import centroidal as cm
from centroidal_mpc_tpu.ops.pallas_lqr import lqr_gain_batched


def _real_AB(preset_name, dtype):
    prob = presets.build_problem(presets.PRESETS[preset_name], dtype=dtype)
    sched = prob.plan.schedule
    pos = sched.positions_flat().reshape(sched.horizon,
                                         sched.n_contacts, 3)
    _, A, B, _ = jax.vmap(cm.linearize_step,
                          in_axes=(None, 0, 0, 0, 0, 0))(
        prob.model, prob.X0[:-1], prob.U0, pos, sched.logic,
        sched.orientation)
    return prob.model, A, B


@pytest.mark.parametrize("preset_name", ["solo12_trot_n50", "talos_pace"])
def test_kernel_matches_xla_chain(preset_name):
    model, A, B = _real_AB(preset_name, jnp.float32)
    K_ref = jax.vmap(cm.lqr_gain, in_axes=(None, 0, 0, None))(
        model, A, B, 2)
    K_ker = lqr_gain_batched(model.Q, model.R, A, B, n_iter=2,
                             interpret=True)
    assert K_ker.shape == K_ref.shape
    scale = float(jnp.abs(K_ref).max())
    assert float(jnp.abs(K_ker - K_ref).max()) < 2e-5 * scale


def test_kernel_under_scenario_vmap():
    """The custom_vmap path: scenario batch collapses onto lanes, and
    unbatched (broadcast) A/B leaves lift correctly."""
    model, A, B = _real_AB("solo12_trot_n50", jnp.float32)
    Bv = 4
    Ab = jnp.stack([A * (1.0 + 0.01 * i) for i in range(Bv)])
    Bb = jnp.stack([B * (1.0 - 0.01 * i) for i in range(Bv)])
    op = cm._lqr_gains_op(2)
    K_b = jax.jit(jax.vmap(lambda a, b: op(model.Q, model.R, a, b)))(
        Ab, Bb)
    for i in range(Bv):
        K_i = lqr_gain_batched(model.Q, model.R, Ab[i], Bb[i], n_iter=2,
                               interpret=True)
        scale = float(jnp.abs(K_i).max())
        assert float(jnp.abs(K_b[i] - K_i).max()) < 1e-6 * scale


def test_trajectory_data_f32_uses_kernel_and_matches_f64():
    """compute_trajectory_data routes f32 through the kernel; its K must
    track the f64 XLA chain to f32 accuracy."""
    p32 = presets.build_problem(presets.PRESETS["solo12_trot_n50"],
                                dtype=jnp.float32)
    p64 = presets.build_problem(presets.PRESETS["solo12_trot_n50"],
                                dtype=jnp.float64)
    d32 = cm.compute_trajectory_data(p32.model, p32.plan.schedule,
                                     p32.X0, p32.U0)
    d64 = cm.compute_trajectory_data(p64.model, p64.plan.schedule,
                                     p64.X0, p64.U0)
    scale = float(jnp.abs(d64.K).max())
    assert float(jnp.abs(d32.K.astype(jnp.float64) - d64.K).max()) \
        < 1e-4 * scale
