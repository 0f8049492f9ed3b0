"""MCMC/SMC diagnostics: split R-hat, autocorrelation effective sample
size, and summary helpers. New scope relative to the reference (SURVEY §5:
"Metrics ... None"; ESS is not even computed there).

All functions are pure jnp and vectorize over parameter leaves, so
diagnostics of sharded multi-chain runs are mesh-wide reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["split_rhat", "ess_autocorr", "summarize"]


def split_rhat(samples: jax.Array) -> jax.Array:
    """Split-chain potential scale reduction (Gelman et al.), computed on
    ``samples`` of shape (chains, draws, ...). Values near 1 indicate
    convergence."""
    c, n = samples.shape[0], samples.shape[1]
    half = n // 2
    split = jnp.concatenate(
        [samples[:, :half], samples[:, half:2 * half]], axis=0
    )
    m, n2 = split.shape[0], split.shape[1]
    chain_means = jnp.mean(split, axis=1)
    chain_vars = jnp.var(split, axis=1, ddof=1)
    between = n2 * jnp.var(chain_means, axis=0, ddof=1)
    within = jnp.mean(chain_vars, axis=0)
    var_plus = (n2 - 1) / n2 * within + between / n2
    return jnp.sqrt(var_plus / within)


def ess_autocorr(samples: jax.Array, max_lag: int | None = None) -> jax.Array:
    """Effective sample size from the initial-positive-sequence
    autocorrelation estimator, over (chains, draws, ...)."""
    c, n = samples.shape[0], samples.shape[1]
    if max_lag is None:
        max_lag = min(n - 1, 1000)
    centered = samples - jnp.mean(samples, axis=1, keepdims=True)
    var = jnp.mean(jnp.var(samples, axis=1, ddof=1), axis=0)

    def rho_at(lag):
        # Dynamic-lag autocovariance via roll + validity mask (static
        # shapes — vmap/jit safe).
        shifted = jnp.roll(centered, -lag, axis=1)
        valid = (jnp.arange(n) < n - lag).astype(centered.dtype)
        valid = valid.reshape((1, n) + (1,) * (centered.ndim - 2))
        prod = centered * shifted * valid
        denom = c * jnp.maximum(n - lag, 1)
        return jnp.sum(prod, axis=(0, 1)) / denom / jnp.maximum(var, 1e-12)

    lags = jnp.arange(1, max_lag + 1)
    rhos = jax.vmap(rho_at)(lags)
    # Truncate at first negative autocorrelation (Geyer initial positive).
    neg = rhos < 0.0
    first_neg = jnp.argmax(neg, axis=0)
    has_neg = jnp.any(neg, axis=0)
    cutoff = jnp.where(has_neg, first_neg, max_lag)
    mask = lags[:, None] if rhos.ndim > 1 else lags
    keep = (jnp.arange(max_lag) < cutoff)
    if rhos.ndim > 1:
        keep = keep[..., None] if keep.ndim < rhos.ndim else keep
    tau = 1.0 + 2.0 * jnp.sum(jnp.where(keep, rhos, 0.0), axis=0)
    return c * n / jnp.maximum(tau, 1e-6)


def summarize(samples: jax.Array) -> dict:
    """Mean/std/R-hat/ESS summary of (chains, draws, ...) samples."""
    return {
        "mean": jnp.mean(samples, axis=(0, 1)),
        "std": jnp.std(samples, axis=(0, 1)),
        "rhat": split_rhat(samples),
        "ess": ess_autocorr(samples),
    }
