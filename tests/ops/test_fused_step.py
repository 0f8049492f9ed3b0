"""Fused filter-step kernel (``ops/fused_step.py``): in-kernel
threefry2x32 RNG correctness, kernel-vs-oracle bitwise equality
(interpret mode), and fused-filter logZ against the exact Kalman
answer."""

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu.inference.pf import fused_particle_filter, particle_filter
from genjax_tpu.ops.fused_step import (
    fused_step_reference,
    make_fused_step,
    normal_from_counter,
    supports_fused_step,
    threefry2x32,
)

KEY = jax.random.key(314159)


def _tracking(x, e):
    return 0.5 * x + 25.0 * x / (1.0 + x * x) + jnp.sqrt(10.0) * e


def _tracking_ll(x, y):
    return -0.5 * (y - x * x / 20.0) ** 2 - 0.5 * jnp.log(2 * jnp.pi)


class TestThreefry:
    def test_matches_known_vectors(self):
        # Random123 threefry2x32 (20 rounds) published test vectors.
        z0, z1 = threefry2x32(
            jnp.uint32(0), jnp.uint32(0), jnp.uint32(0), jnp.uint32(0)
        )
        assert (int(z0), int(z1)) == (0x6B200159, 0x99BA4EFE)
        ones = jnp.uint32(0xFFFFFFFF)
        z0, z1 = threefry2x32(ones, ones, ones, ones)
        assert (int(z0), int(z1)) == (0x1CB996FC, 0xBB002BE7)
        z0, z1 = threefry2x32(
            jnp.uint32(0x13198A2E), jnp.uint32(0x03707344),
            jnp.uint32(0x243F6A88), jnp.uint32(0x85A308D3),
        )
        assert (int(z0), int(z1)) == (0xC4923A9C, 0x483DF7A0)

    def test_normal_moments(self):
        n = 1 << 18
        z = normal_from_counter(
            jnp.uint32(7), jnp.uint32(9),
            jnp.arange(n, dtype=jnp.uint32),
        )
        z = np.asarray(z, np.float64)
        se = 1.0 / np.sqrt(n)
        assert abs(z.mean()) < 5 * se
        assert abs(z.var() - 1.0) < 5 * np.sqrt(2) * se
        assert abs((z**3).mean()) < 5 * np.sqrt(15) * se
        assert abs((z**4).mean() - 3.0) < 5 * np.sqrt(96) * se


class TestKernelVsOracle:
    def test_bitwise_equal_and_stats(self):
        n = 8 * 128 * 4
        step_k = make_fused_step(
            _tracking, _tracking_ll, n, chunk_rows=8, interpret=True
        )
        step_r = fused_step_reference(_tracking, _tracking_ll, n)
        seeds = jax.random.key_data(KEY).astype(jnp.uint32)
        xs = jax.random.normal(jax.random.key(1), (n,))
        lw = jax.random.normal(jax.random.key(2), (n,)) * 0.3
        xk, lwk, lsek, essk = jax.jit(step_k)(seeds, xs, lw, 2.5)
        xr, lwr, lser, essr = jax.jit(step_r)(seeds, xs, lw, 2.5)
        assert bool(jnp.all(xk == xr))
        assert bool(jnp.all(lwk == lwr))
        assert abs(float(lsek - lser)) < 1e-4
        assert abs(float(essk - essr)) / float(essr) < 1e-4

    def test_bf16_state(self):
        n = 8 * 128 * 2
        step_k = make_fused_step(
            _tracking, _tracking_ll, n, chunk_rows=8,
            state_dtype=jnp.bfloat16, interpret=True,
        )
        seeds = jax.random.key_data(KEY).astype(jnp.uint32)
        xs = jax.random.normal(jax.random.key(1), (n,)).astype(
            jnp.bfloat16
        )
        xk, lwk, _, _ = jax.jit(step_k)(seeds, xs, jnp.zeros((n,)), 0.5)
        assert xk.dtype == jnp.bfloat16
        assert lwk.dtype == jnp.float32

    def test_supports_predicate(self):
        assert supports_fused_step(1 << 20)
        assert not supports_fused_step(1000)
        assert supports_fused_step(8 * 128 * 3, chunk_rows=8)


def _kalman_loglik(ys, a, q, r, mu0, p0):
    ll = 0.0
    mu, p = mu0, p0
    for y in ys:
        s = p + r
        ll += -0.5 * (np.log(2 * np.pi * s) + (y - mu) ** 2 / s)
        k_gain = p / s
        mu = mu + k_gain * (y - mu)
        p = (1 - k_gain) * p
        mu, p = a * mu, a * a * p + q
    return ll


class TestFusedFilter:
    def _linear_model(self):
        # x_t = a x_{t-1} + eps (q = 1 so init-at-zero gives x0~N(0,1),
        # matching the Kalman prior mu0=0, p0=1), y_t = x_t + N(0, r).
        a, q, r = 0.9, 1.0, 0.3
        rng = np.random.default_rng(0)
        T = 15
        x = rng.normal(0, 1)
        ys = []
        for _ in range(T):
            ys.append(x + rng.normal(0, np.sqrt(r)))
            x = a * x + rng.normal(0, np.sqrt(q))
        ys = jnp.asarray(ys)
        want = _kalman_loglik(np.asarray(ys), a, q, r, 0.0, 1.0)
        prop = lambda x, e: a * x + jnp.sqrt(q) * e
        ll = lambda x, y: (
            -0.5 * (y - x) ** 2 / r - 0.5 * jnp.log(2 * jnp.pi * r)
        )
        return ys, want, prop, ll

    def test_logz_matches_kalman_kernel_path(self):
        ys, want, prop, ll = self._linear_model()
        n = 8 * 128 * 24  # 24576 particles through the real kernel
        pf = fused_particle_filter(
            lambda k: jnp.zeros((n,)), prop, ll, n,
            chunk_rows=8, interpret=True,
        )
        final, log_zs = jax.jit(lambda k: pf(k, ys))(KEY)
        assert abs(float(final.log_z) - want) < 0.1
        assert log_zs.shape == (ys.shape[0],)
        # per-step estimates are a prefix-consistent stream
        assert abs(float(log_zs[-1]) - float(final.log_z)) < 1e-4

    def test_logz_matches_kalman_fallback_path(self):
        ys, want, prop, ll = self._linear_model()
        n = 10_000  # non-tiling: jnp oracle path
        pf = fused_particle_filter(
            lambda k: jnp.zeros((n,)), prop, ll, n
        )
        final, _ = jax.jit(lambda k: pf(k, ys))(KEY)
        assert abs(float(final.log_z) - want) < 0.1

    def test_agrees_with_general_filter(self):
        # Same nonlinear tracking model through both drivers: logZ
        # agrees statistically (different normal streams).
        n = 8 * 128 * 8
        ys = jax.random.normal(jax.random.key(9), (12,)) * 5.0

        fused = fused_particle_filter(
            lambda k: jax.random.normal(k, (n,)), _tracking,
            _tracking_ll, n, chunk_rows=8, interpret=True,
        )

        def init(key):
            return jax.random.normal(key, (n,)), jnp.zeros((n,))

        def step(key, xs, y):
            e = jax.random.normal(key, (n,))
            x_new = _tracking(xs, e)
            return x_new, _tracking_ll(x_new, y)

        general = particle_filter(init, step, n, batched=True)
        f1, _ = jax.jit(lambda k: fused(k, ys))(KEY)
        f2, _ = jax.jit(lambda k: general(k, ys))(KEY)
        assert abs(float(f1.log_z) - float(f2.log_z)) < 0.25
