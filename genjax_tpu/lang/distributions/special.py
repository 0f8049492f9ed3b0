"""Special functions the distribution tail needs and jax.scipy lacks:
principal-branch Lambert W (Halley iteration) and log of the modified
Bessel function of the first kind for general order (series + uniform
asymptotic expansion)."""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.special as jsp
from jax import lax

__all__ = ["lambertw", "log_bessel_iv"]


def lambertw(x, iters: int = 20):
    """Principal branch W0 for x >= -1/e, by Halley's method (fixed
    iteration count — jit/vmap friendly)."""
    x = jnp.asarray(x, jnp.result_type(float))
    # Initial guess: log-based for large x, series for small.
    w = jnp.where(
        x > jnp.e,
        jnp.log(jnp.maximum(x, 1e-30))
        - jnp.log(jnp.maximum(jnp.log(jnp.maximum(x, 1e-30)), 1e-30)),
        x / (1.0 + x * (1.0 + x)),
    )
    w = jnp.where(x == 0.0, 0.0, w)

    def body(i, w):
        ew = jnp.exp(w)
        f = w * ew - x
        w1 = w + 1.0
        # Halley update.
        return w - f / (ew * w1 - (w + 2.0) * f / (2.0 * w1))

    return lax.fori_loop(0, iters, body, w)


def _log_iv_series(v, x, terms: int = 40):
    """log I_v(x) via the ascending series (accurate for small/moderate
    x)."""
    k = jnp.arange(terms, dtype=jnp.result_type(float))
    log_terms = (
        (2.0 * k + v) * jnp.log(x / 2.0)
        - jsp.gammaln(k + 1.0)
        - jsp.gammaln(k + v + 1.0)
    )
    return jsp.logsumexp(log_terms, axis=-1)


def _log_iv_uniform_asymptotic(v, x):
    """Uniform asymptotic expansion for large order/argument
    (Abramowitz & Stegun 9.7.7, leading terms)."""
    z = x / jnp.maximum(v, 1e-10)
    t = 1.0 / jnp.sqrt(1.0 + z * z)
    eta = jnp.sqrt(1.0 + z * z) + jnp.log(
        z / (1.0 + jnp.sqrt(1.0 + z * z))
    )
    # First two correction terms of the expansion.
    u1 = (3.0 * t - 5.0 * t**3) / 24.0
    series = 1.0 + u1 / jnp.maximum(v, 1e-10)
    return (
        v * eta
        - 0.5 * jnp.log(2.0 * jnp.pi * v)
        + 0.5 * jnp.log(t)
        + jnp.log(jnp.maximum(series, 1e-30))
    )


def log_bessel_iv(v, x):
    """log I_v(x) for v >= 0, x > 0: series for small x, uniform asymptotic
    for large (v, x)."""
    v = jnp.asarray(v, jnp.result_type(float))
    x = jnp.asarray(x, jnp.result_type(float))
    small = _log_iv_series(v, x[..., None])
    # For v == 0 the uniform expansion degenerates; use scaled i0.
    large = jnp.where(
        v > 0.5,
        _log_iv_uniform_asymptotic(jnp.maximum(v, 0.51), x),
        jnp.log(jsp.i0e(x)) + x,
    )
    use_series = (x < 20.0) & (x < 2.0 * (v + 10.0))
    return jnp.where(use_series, small, large)
