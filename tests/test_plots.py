"""Figure-generation coverage (headless Agg backend).

The reference's analysis figures (SURVEY.md section 5 observability):
cumulative foot slippage (src/utils.py:304-385) and the whole-body
solution panels (src/whole_body_control.py:490-657) gained counterparts in
round 2 -- these tests render every figure from synthetic data and check
files are produced.
"""
import numpy as np

from centroidal_mpc_tpu.sim import plots


def test_plot_foot_slippage(tmp_path):
    rng = np.random.default_rng(0)
    series = {
        "nominal": np.cumsum(rng.uniform(0, 1e-4, (5, 300)), axis=1),
        "stochastic": np.cumsum(rng.uniform(0, 5e-5, (5, 300)), axis=1),
    }
    fig = plots.plot_foot_slippage(series, 0.001, save_dir=tmp_path)
    assert fig is not None
    assert (tmp_path / "foot_slippage.png").exists()


def test_plot_whole_body_solution(tmp_path):
    t, nj = 200, 12
    rng = np.random.default_rng(1)
    q = rng.normal(size=(t, nj)).cumsum(axis=0) * 1e-3
    qd = np.gradient(q, axis=0)
    tau = rng.normal(size=(t, nj))
    base = np.stack([np.linspace(0, 0.5, t), np.zeros(t),
                     0.25 + 0.01 * np.sin(np.linspace(0, 6, t))], axis=1)
    fig = plots.plot_whole_body_solution(q, qd, tau, 0.001,
                                         base_pos=base, save_dir=tmp_path)
    assert fig is not None
    assert (tmp_path / "whole_body_solution.png").exists()
    assert (tmp_path / "whole_body_base_path.png").exists()


def test_existing_figures_still_render(tmp_path):
    U = np.abs(np.random.default_rng(2).normal(size=(40, 12)))
    plots.plot_contact_forces(["FR", "FL", "HR", "HL"], U, None, 0.01, 0.5,
                              save_dir=tmp_path)
    plots.plot_tracking_cost(
        {"nominal_cum_cost": np.linspace(0, 1, 50),
         "nominal_cum_cost_std": np.full(50, 0.1)}, 0.01,
        save_dir=tmp_path)
    assert (tmp_path / "force_ratios.png").exists()
    assert (tmp_path / "tracking_cost.png").exists()
