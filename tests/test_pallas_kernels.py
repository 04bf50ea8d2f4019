"""Pallas sweep kernel: interpret-mode parity (see the module docstring
for measured compiled-mode status on TPU v5e)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centroidal_mpc_tpu.ops import pallas_kernels as pk


@pytest.mark.parametrize("reverse", [False, True])
def test_sweep_matches_reference_interpret(reverse):
    B, N, V = 128, 12, 22
    key = jax.random.PRNGKey(0)
    P = 0.3 * jax.random.normal(key, (B, N, V, V), jnp.float32)
    c = jax.random.normal(jax.random.fold_in(key, 1), (B, N + 1, V),
                          jnp.float32)
    ref = pk.sweep_reference(P, c, reverse=reverse)
    out = pk.sweep_batched(P, c, reverse=reverse, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_sweep_rejects_unaligned_batch():
    P = jnp.zeros((100, 4, 22, 22))
    c = jnp.zeros((100, 5, 22))
    with pytest.raises(ValueError):
        pk.sweep_batched(P, c)
