"""Tempered-SMC tests: logZ vs exact conjugate marginals, posterior moment
recovery, and HMC-rejuvenated variant."""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as g
from genjax_tpu.inference import HMC, Target
from genjax_tpu.inference.smc_sampler import tempered_smc

KEY = jax.random.key(314159)


@g.gen
def conjugate(obs_std):
    mu = g.normal(0.0, 1.0) @ "mu"
    _ = g.normal(mu, obs_std) @ "y"


def make_target(y=1.0, obs_std=0.5):
    return Target(conjugate, (obs_std,), g.C["y"].set(y))


def exact_logz(y=1.0, obs_std=0.5):
    # marginal of y: N(0, 1 + obs_std^2)
    from scipy.stats import norm

    return norm(0.0, np.sqrt(1 + obs_std**2)).logpdf(y)


class TestTemperedSMC:
    def test_logz_matches_exact(self):
        run = tempered_smc(make_target(), 2048, n_temps=20, n_moves=2)
        result = jax.jit(run)(KEY)
        np.testing.assert_allclose(
            float(result.log_z), exact_logz(), atol=0.05
        )

    def test_posterior_moments(self):
        run = tempered_smc(make_target(), 4096, n_temps=20, n_moves=3)
        result = jax.jit(run)(KEY)
        mus = np.asarray(result.traces.get_choices()["mu"])
        w = np.asarray(jax.nn.softmax(result.log_weights))
        post_mean = 1.0 / (1 + 0.25)
        post_std = np.sqrt(0.25 / 1.25)
        assert abs((w * mus).sum() - post_mean) < 0.05
        assert abs(np.sqrt((w * (mus - (w * mus).sum()) ** 2).sum())
                   - post_std) < 0.05

    def test_acceptance_rates_reasonable(self):
        run = tempered_smc(make_target(), 1024, n_temps=10, n_moves=1)
        result = jax.jit(run)(KEY)
        # Prior-proposal regenerate at low beta accepts nearly always.
        assert float(result.accept_rate[0]) > 0.5
        assert float(result.accept_rate.mean()) > 0.2

    def test_hmc_rejuvenation(self):
        run = tempered_smc(
            make_target(), 512, n_temps=10,
            make_request=lambda: HMC(g.S.at["mu"], 0.2, 5),
            n_moves=1,
        )
        result = jax.jit(run)(KEY)
        np.testing.assert_allclose(
            float(result.log_z), exact_logz(), atol=0.1
        )
        # HMC at these scales should accept most moves.
        assert float(result.accept_rate.mean()) > 0.6


class TestWasteFree:
    def test_waste_free_logz_and_posterior(self):
        from genjax_tpu.inference.smc_sampler import waste_free_tempered_smc

        run = waste_free_tempered_smc(
            make_target(), n_resampled=128, n_moves_per_particle=8,
            n_temps=15,
        )
        result = jax.jit(run)(KEY)
        np.testing.assert_allclose(
            float(result.log_z), exact_logz(), atol=0.08
        )
        mus = np.asarray(result.traces.get_choices()["mu"])
        assert mus.shape == (1024,)
        post_mean = 1.0 / 1.25
        w = np.asarray(jax.nn.softmax(result.log_weights))
        assert abs((w * mus).sum() - post_mean) < 0.05

    def test_waste_free_hmc(self):
        from genjax_tpu.inference.smc_sampler import waste_free_tempered_smc

        run = waste_free_tempered_smc(
            make_target(), n_resampled=64, n_moves_per_particle=4,
            n_temps=10,
            make_request=lambda: HMC(g.S.at["mu"], 0.25, 5),
        )
        result = jax.jit(run)(KEY)
        np.testing.assert_allclose(
            float(result.log_z), exact_logz(), atol=0.15
        )
        assert float(result.accept_rate.mean()) > 0.5
