"""Adaptive-window Pallas expansion (ops/expand_adaptive.py) vs the
jnp.repeat oracle — bitwise equality across weight regimes, including
degenerate runs that force many in-kernel while iterations. Runs the
kernel in interpret mode (CPU CI); the compiled path is exercised by
the TPU benchmarks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genjax_tpu.ops.expand_adaptive import (
    expand_adaptive,
    supports_adaptive_expand,
)

KEY = jax.random.key(23)
N = 1024
TB = 2  # 8 rows of 128 -> 4 grid steps in tests


def _cc_from_logw(key, logw, n):
    from genjax_tpu.inference.smc import (
        systematic_offspring_cumulative,
    )

    return systematic_offspring_cumulative(key, logw, n)


def _oracle(v, cc, n):
    counts = jnp.diff(jnp.concatenate([jnp.zeros(1, jnp.int32), cc]))
    return jnp.repeat(v, counts, total_repeat_length=n)


def _check(logw_or_counts, xs, n=N, is_counts=False):
    if is_counts:
        cc = jnp.cumsum(logw_or_counts).astype(jnp.int32)
    else:
        cc = _cc_from_logw(KEY, logw_or_counts, n)
    got = expand_adaptive(xs, cc, n, interpret=True, tb=TB)
    want = _oracle(xs, cc, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert got.dtype == xs.dtype


@pytest.mark.parametrize("regime", [
    "uniform", "mild", "skewed", "one_hot", "two_far", "head_tail",
])
def test_matches_repeat(regime):
    n = N
    if regime == "uniform":
        logw = jnp.zeros(n)
    elif regime == "mild":
        logw = jax.random.normal(KEY, (n,))
    elif regime == "skewed":
        logw = 3.0 * jax.random.normal(KEY, (n,))
    elif regime == "one_hot":
        logw = jnp.where(jnp.arange(n) == 389, 0.0, -1e9)
    elif regime == "two_far":
        logw = jnp.where(
            (jnp.arange(n) == 3) | (jnp.arange(n) == n - 2), 0.0, -1e9
        )
    else:  # head_tail
        logw = jnp.where(jnp.arange(n) < 8, 10.0, -2.0)
    xs = jax.random.normal(jax.random.key(1), (n,))
    _check(logw, xs)


def test_int32_bit_patterns_exact():
    n = N
    logw = 2.0 * jax.random.normal(KEY, (n,))
    xs = jax.random.randint(
        jax.random.key(2), (n,), -(2**31), 2**31 - 1, dtype=jnp.int32
    )
    _check(logw, xs)


def test_block_boundary_runs():
    n = N
    counts = jnp.zeros((n,), jnp.int32)
    counts = counts.at[0].set(300)
    counts = counts.at[511].set(212)
    counts = counts.at[512].set(n - 512)
    _check(counts, jnp.arange(n, dtype=jnp.float32), is_counts=True)


def test_degenerate_tail_many_iterations():
    """One heavy source + one thin source per remaining row: the last
    block's dests span every row — the in-kernel while must iterate
    ~G/W0 times for that block while others exit after one."""
    n = N
    g = n // 128
    counts = jnp.zeros((n,), jnp.int32)
    counts = counts.at[0].set(n - (g - 1))
    for r in range(1, g):
        counts = counts.at[128 * r].set(1)
    _check(counts, jnp.arange(n, dtype=jnp.float32), is_counts=True)


@pytest.mark.parametrize("seed", range(4))
def test_randomized_regimes(seed):
    n = N
    k = jax.random.key(seed)
    logw = 3.0 * jax.random.normal(k, (n,))
    xs = jax.random.normal(jax.random.key(seed + 100), (n,))
    cc = _cc_from_logw(k, logw, n)
    got = expand_adaptive(xs, cc, n, interpret=True, tb=TB)
    want = _oracle(xs, cc, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_supports_gate():
    x = jnp.zeros((1 << 20,), jnp.float32)
    assert supports_adaptive_expand(1 << 20, 1 << 20, [x])
    assert not supports_adaptive_expand(1 << 20, 1 << 19, [x])
    assert not supports_adaptive_expand(1 << 20, 1 << 20, [x, x])
    assert not supports_adaptive_expand(
        1 << 21, 1 << 21, [jnp.zeros((1 << 21,), jnp.float32)]
    )
    assert not supports_adaptive_expand(
        1 << 20, 1 << 20, [jnp.zeros((1 << 20,), jnp.bfloat16)]
    )
    assert not supports_adaptive_expand(
        1 << 20, 1 << 20, [jnp.zeros((1 << 20, 2), jnp.float32)]
    )
