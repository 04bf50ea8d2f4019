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
