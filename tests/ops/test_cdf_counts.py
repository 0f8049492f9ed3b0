"""Fused Pallas CDF→counts kernel vs the XLA systematic_offspring_
cumulative: exact invariants (nondecreasing, last == n, counts ≥ 0 and
sum to n) and per-entry agreement up to the f32 summation-order
boundary wiggle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genjax_tpu.inference.smc import systematic_offspring_cumulative
from genjax_tpu.ops.cdf_counts import (
    supports_pallas_cdf,
    systematic_cumulative_pallas,
)

N = 1 << 16           # 512 rows of 128; 4 chunks of 128 rows


def _run(key, lw, n):
    return systematic_cumulative_pallas(
        key, lw, n, chunk_rows=128, interpret=True
    )


@pytest.mark.parametrize("regime", ["uniform", "mild", "skewed",
                                    "one_hot", "head_tail"])
def test_invariants_and_agreement(regime):
    n = N
    k = jax.random.key(5)
    if regime == "uniform":
        lw = jnp.zeros(n)
    elif regime == "mild":
        lw = jax.random.normal(k, (n,))
    elif regime == "skewed":
        lw = 4.0 * jax.random.normal(k, (n,))
    elif regime == "one_hot":
        lw = jnp.where(jnp.arange(n) == 12345, 0.0, -1e9)
    else:
        lw = jnp.where(jnp.arange(n) < 9, 8.0, -2.0)
    cc = np.asarray(_run(k, lw, n))
    assert cc[-1] == n
    assert (np.diff(cc) >= 0).all()
    counts = np.diff(np.concatenate([[0], cc]))
    assert counts.sum() == n and (counts >= 0).all()
    ref = np.asarray(systematic_offspring_cumulative(k, lw, n))
    # Same uniform u0 (same key): entries differ only where the two f32
    # summation orders (pairwise vs Hillis–Steele+carry) round a dest
    # boundary differently — worst observed in the adversarial
    # head_tail regime (a steep jump followed by 65k tiny increments)
    # is a 3-dest shift out of 65536.
    assert np.abs(cc.astype(np.int64) - ref.astype(np.int64)).max() <= 4


def test_counts_proportional_to_weights():
    n = N
    k = jax.random.key(9)
    lw = jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32))
    cc = np.asarray(_run(k, lw, n))
    counts = np.diff(np.concatenate([[0], cc])).astype(np.float64)
    w = np.arange(1, n + 1, dtype=np.float64)
    expect = n * w / w.sum()
    # systematic resampling: counts are floor/ceil of expectation
    assert np.abs(counts - expect).max() <= 1.0 + 1e-6


def test_supports_gate():
    assert supports_pallas_cdf(1 << 20)
    assert supports_pallas_cdf(1 << 16, chunk_rows=128)
    assert not supports_pallas_cdf(1000)
    assert not supports_pallas_cdf((1 << 16) + 128)


def test_multi_chunk_carry_exactness():
    """A weight spike in a late chunk: cross-chunk carry and the pinned
    tail must still produce a valid partition."""
    n = N
    lw = jnp.where(jnp.arange(n) == n - 7, 20.0, 0.0)
    cc = np.asarray(_run(jax.random.key(2), lw, n))
    counts = np.diff(np.concatenate([[0], cc]))
    assert counts.sum() == n
    assert counts[n - 7] > 0.9 * n  # spike dominates
