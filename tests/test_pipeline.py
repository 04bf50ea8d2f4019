"""End-to-end pipeline + artifact-store tests."""
import jax.numpy as jnp
import numpy as np

from centroidal_mpc_tpu.config import presets
from centroidal_mpc_tpu.pipeline import run_pipeline
from centroidal_mpc_tpu.utils import artifacts as art


def test_pipeline_nominal(tmp_path):
    store = art.ArtifactStore(tmp_path)
    result = run_pipeline(presets.SOLO12_TROT_N50, store, stochastic=False,
                          n_sims=4, dtype=jnp.float64)
    assert bool(result.nominal.success)
    # artifact protocol: stage handoffs re-loadable under reference names
    warm = store.load(art.WHOLEBODY_TO_CENTROIDAL)
    np.testing.assert_allclose(warm["X"], result.warm_X)
    handoff = store.load(art.CENTROIDAL_TO_WHOLEBODY)
    assert handoff["X"].shape == (51, 9)
    assert handoff["U"].shape == (50, 12)
    interp = store.load(art.SCP_INTERPOLATED_NOMINAL)
    assert interp["X"].shape == (500, 9)   # 10x upsampling, last knot open
    assert store.exists("monte_carlo_stats")
    stats = store.load("monte_carlo_stats")
    assert stats["nominal_cum_cost"].shape == (51,)
    assert (stats["nominal_violations"] == 0).all()
    # warm start is a dynamics rollout, so SCP tracking target is feasible
    assert abs(result.warm_X[-1, 0] - 0.12) < 0.08


def test_artifact_store_roundtrip(tmp_path):
    store = art.ArtifactStore(tmp_path / "sub")
    store.save("thing", a=np.arange(3), b=np.eye(2))
    assert store.exists("thing")
    loaded = store.load("thing")
    np.testing.assert_array_equal(loaded["a"], np.arange(3))
    assert store.maybe_load("missing") is None


def test_pipeline_f32_defaults_converge(tmp_path):
    """f32 pipelines get f32-reachable QP defaults (eps 1e-4, adaptive
    rho, polish) instead of the f64 reference eps=1e-7 -- which floors
    out in f32 and spun the CPU demo to max_iter (round-3 regression:
    demos/run_motion.py without --f64 reported success=False at N=165)."""
    store = art.ArtifactStore(tmp_path)
    result = run_pipeline(presets.SOLO12_TROT_N50, store, stochastic=False,
                          n_sims=0, dtype=jnp.float32)
    assert bool(result.nominal.success)
    assert bool(result.nominal.qp_converged)
    assert int(result.nominal.qp_iterations) < 2000
