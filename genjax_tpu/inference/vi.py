"""Variational inference via ADEV: differentiable distribution wrappers for
guide programs, and loss-gradient estimators (ELBO / IWELBO / PWake /
QWake), each an ``@expectation`` program differentiated by the ADEV
interpreter.

Parity target: ``/root/reference/src/genjax/_src/inference/vi.py``
(``adev_distribution`` :61-81, guide-side primitives :90-116, ``ELBO`` :129,
``IWELBO`` :154, ``PWake`` :180, ``QWake`` :207).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from genjax_tpu.adev.core import ADEVPrimitive, expectation, sample_primitive
from genjax_tpu.adev import primitives as adev_prims
from genjax_tpu.gfi.choice_map import ChoiceMap
from genjax_tpu.lang.distributions import stdlib
from genjax_tpu.lang.distributions.distribution import (
    ExactDensity,
    exact_density,
)
from genjax_tpu.inference.sp import SampleDistribution, Target
from genjax_tpu.inference.smc import Importance, ImportanceK

__all__ = [
    "adev_distribution",
    "ELBO",
    "IWELBO",
    "PWake",
    "QWake",
    "flip_enum",
    "flip_mvd",
    "flip_reinforce",
    "categorical_enum",
    "normal_reinforce",
    "normal_reparam",
    "mv_normal_diag_reparam",
    "mv_normal_reparam",
    "geometric_reinforce",
    "beta_implicit",
    "gamma_implicit",
    "dirichlet_implicit",
]


def adev_distribution(adev_primitive: ADEVPrimitive,
                      differentiable_logpdf: Callable,
                      name: str) -> ExactDensity:
    """An ``ExactDensity`` whose sampler binds an ADEV primitive — usable
    inside ``@gen`` guide programs so that guide randomness carries a
    gradient strategy. Parity: reference ``vi.py:61-81``."""

    def sampler(key, *args):
        return sample_primitive(adev_primitive, *args, key=key)

    def logpdf(v, *args):
        lp = differentiable_logpdf(v, *args)
        if jnp.shape(lp):
            return jnp.sum(lp)
        return lp

    return exact_density(sampler, logpdf, name)


def _logpdf_of(dist) -> Callable:
    return lambda v, *args: dist.logpdf(v, *args)


#: Guide-side differentiable distributions (parity: reference vi.py:90-116).
flip_enum = adev_distribution(
    adev_prims.flip_enum, _logpdf_of(stdlib.flip), "flip_enum"
)
flip_mvd = adev_distribution(
    adev_prims.flip_mvd, _logpdf_of(stdlib.flip), "flip_mvd"
)
#: Score-function flip. Both this and the enumeration variants batch
#: under ``.vmap()`` guides (``_lift_reinforce`` / BatchedEnumPrimitive
#: in adev/core.py); only REINFORCE additionally composes under NESTED
#: vmaps (it re-lifts).
flip_reinforce = adev_distribution(
    adev_prims.flip_reinforce, _logpdf_of(stdlib.flip), "flip_reinforce"
)
categorical_enum = adev_distribution(
    adev_prims.categorical_enum_parallel,
    _logpdf_of(stdlib.categorical),
    "categorical_enum",
)
normal_reinforce = adev_distribution(
    adev_prims.normal_reinforce, _logpdf_of(stdlib.normal),
    "normal_reinforce",
)
normal_reparam = adev_distribution(
    adev_prims.normal_reparam, _logpdf_of(stdlib.normal), "normal_reparam"
)
mv_normal_diag_reparam = adev_distribution(
    adev_prims.mv_normal_diag_reparam,
    lambda v, loc, diag: jnp.sum(
        jax.scipy.stats.norm.logpdf(v, loc, diag)
    ),
    "mv_normal_diag_reparam",
)
mv_normal_reparam = adev_distribution(
    adev_prims.mv_normal_reparam,
    lambda v, loc, cov: jax.scipy.stats.multivariate_normal.logpdf(
        v, loc, cov
    ),
    "mv_normal_reparam",
)
geometric_reinforce = adev_distribution(
    adev_prims.geometric_reinforce, _logpdf_of(stdlib.geometric),
    "geometric_reinforce",
)
beta_implicit = adev_distribution(
    adev_prims.beta_implicit, _logpdf_of(stdlib.beta), "beta_implicit"
)
gamma_implicit = adev_distribution(
    adev_prims.gamma_implicit, _logpdf_of(stdlib.gamma), "gamma_implicit"
)
dirichlet_implicit = adev_distribution(
    adev_prims.dirichlet_implicit,
    _logpdf_of(stdlib.dirichlet),
    "dirichlet_implicit",
)


# ---------------------------------------------------------------------------
# Loss-gradient estimators
# ---------------------------------------------------------------------------


def ELBO(guide: SampleDistribution,
         make_target: Callable[..., Target]) -> Callable:
    """∇ of −E_q[log p̃/q] (the negative evidence lower bound).

    Parity: reference ``vi.py:129-151``."""

    def grad_estimate(key: jax.Array, args: tuple):
        @expectation
        def _loss(*args):
            target = make_target(*args)
            alg = Importance(target, guide)
            w = alg.estimate_normalizing_constant(key, target)
            return -w

        return _loss.grad_estimate(key, args)

    return grad_estimate


def IWELBO(proposal: SampleDistribution,
           make_target: Callable[..., Target], N: int) -> Callable:
    """K-particle importance-weighted ELBO gradient.

    Parity: reference ``vi.py:154-177``."""

    def grad_estimate(key: jax.Array, args: tuple):
        @expectation
        def _loss(*args):
            target = make_target(*args)
            alg = ImportanceK(target, proposal, N)
            w = alg.estimate_normalizing_constant(key, target)
            return -w

        return _loss.grad_estimate(key, args)

    return grad_estimate


def PWake(posterior_approx: SampleDistribution,
          make_target: Callable[..., Target]) -> Callable:
    """Wake-phase model update: ∇_θ −E_{z~q*}[log p_θ(z, x)].

    Parity: reference ``vi.py:180-204``."""

    def grad_estimate(key: jax.Array, args: tuple):
        key, k1, k2 = jax.random.split(key, 3)

        @expectation
        def _loss(*target_args):
            target = make_target(*target_args)
            _, sample = posterior_approx.random_weighted(k1, target)
            tr, _ = target.importance(k2, sample)
            return -tr.get_score()

        return _loss.grad_estimate(key, args)

    return grad_estimate


def QWake(proposal: SampleDistribution,
          posterior_approx: SampleDistribution,
          make_target: Callable[..., Target]) -> Callable:
    """Sleep-phase guide update: ∇_φ −E_{z~q*}[log q_φ(z | x)].

    Parity: reference ``vi.py:207-232``."""

    def grad_estimate(key: jax.Array, args: tuple):
        key, k1, k2 = jax.random.split(key, 3)

        @expectation
        def _loss(*target_args):
            target = make_target(*target_args)
            _, sample = posterior_approx.random_weighted(k1, target)
            w = proposal.estimate_logpdf(k2, sample, target)
            return -w

        return _loss.grad_estimate(key, args)

    return grad_estimate
