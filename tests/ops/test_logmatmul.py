"""log-matmul kernel tests: jnp max-shift form vs naive logsumexp, and the
Pallas kernel (interpret mode on CPU) vs the jnp form."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

from genjax_tpu.ops import log_matmul_jnp, log_matmul_pallas

KEY = jax.random.key(314159)


def naive(X, Y):
    return logsumexp(X[..., :, :, None] + Y[..., None, :, :], axis=-2)


class TestJnp:
    def test_matches_naive(self):
        X = jax.random.normal(KEY, (64, 64)) * 3.0
        Y = jax.random.normal(jax.random.key(1), (64, 64)) * 3.0
        np.testing.assert_allclose(
            np.asarray(log_matmul_jnp(X, Y)), np.asarray(naive(X, Y)),
            rtol=1e-5, atol=1e-5,
        )

    def test_batched(self):
        X = jax.random.normal(KEY, (4, 32, 32))
        Y = jax.random.normal(jax.random.key(1), (4, 32, 32))
        np.testing.assert_allclose(
            np.asarray(log_matmul_jnp(X, Y)), np.asarray(naive(X, Y)),
            rtol=1e-5, atol=1e-5,
        )

    def test_extreme_values_stable(self):
        X = jnp.full((8, 8), -1e30)
        Y = jnp.zeros((8, 8))
        out = log_matmul_jnp(X, Y)
        assert bool(jnp.all(jnp.isfinite(out) | (out < -1e29)))


class TestPallas:
    def test_kernel_matches_jnp_interpret(self):
        X = jax.random.normal(KEY, (2, 128, 128)) * 2.0
        Y = jax.random.normal(jax.random.key(1), (2, 128, 128)) * 2.0
        got = log_matmul_pallas(X, Y, interpret=True)
        want = log_matmul_jnp(X, Y)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_unbatched(self):
        X = jax.random.normal(KEY, (128, 128))
        Y = jax.random.normal(jax.random.key(1), (128, 128))
        got = log_matmul_pallas(X, Y, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(log_matmul_jnp(X, Y)),
            rtol=1e-5, atol=1e-5,
        )
