"""No-U-Turn sampler, TPU-native: iterative multinomial NUTS with bounded
tree depth — no recursion, no dynamic shapes; the doubling loop is a
``lax.while_loop``, subtree u-turn checks use the power-of-two checkpoint
trick (Phan, Pradhan & Jankowiak 2019), and everything jits/vmaps so many
chains run in one XLA program and shard over a mesh.

This is new scope relative to the reference (SURVEY §7: "reference has no
NUTS; build iterative-doubling NUTS with fixed-depth unrolling for XLA").
The selected choices are flattened to one position vector with
``ravel_pytree``; the log-density closes over the complement choices.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

from genjax_tpu.core.pytree import Pytree
from genjax_tpu.core.compiler.interpreters.incremental import Diff
from genjax_tpu.gfi.choice_map import partition_values
from genjax_tpu.gfi.concepts import Argdiffs, EditRequest
from genjax_tpu.gfi.gfn import Trace
from genjax_tpu.gfi.requests import Update
from genjax_tpu.gfi.selection import Selection

__all__ = ["NUTS", "nuts_kernel", "NUTSInfo"]


class _IntegratorState(NamedTuple):
    z: jax.Array
    r: jax.Array
    logp: jax.Array
    grad: jax.Array


class NUTSInfo(NamedTuple):
    accept_prob: jax.Array
    num_steps: jax.Array
    diverging: jax.Array
    energy: jax.Array


def _leapfrog(logp_and_grad: Callable, eps, inv_mass):
    def step(state: _IntegratorState) -> _IntegratorState:
        r_half = state.r + 0.5 * eps * state.grad
        z_new = state.z + eps * inv_mass * r_half
        logp_new, grad_new = logp_and_grad(z_new)
        r_new = r_half + 0.5 * eps * grad_new
        return _IntegratorState(z_new, r_new, logp_new, grad_new)

    return step


def _kinetic(r, inv_mass):
    return 0.5 * jnp.sum(inv_mass * r * r)


def _is_turning(inv_mass, r_left, r_right, r_sum):
    """Generalized u-turn criterion (Betancourt): check momentum sum
    against both rho ends."""
    v_left = inv_mass * r_left
    v_right = inv_mass * r_right
    rho = r_sum
    turning_left = jnp.dot(v_left, rho - r_left) <= 0.0
    turning_right = jnp.dot(v_right, rho - r_right) <= 0.0
    return turning_left | turning_right


def nuts_kernel(
    logdensity_fn: Callable[[jax.Array], jax.Array],
    z0: jax.Array,
    key: jax.Array,
    eps,
    inv_mass: jax.Array | None = None,
    max_depth: int = 10,
    max_delta_energy: float = 1000.0,
) -> tuple[jax.Array, NUTSInfo]:
    """One NUTS transition from ``z0``. Returns ``(z_next, info)``.

    Iterative multinomial NUTS: trajectory doubling via ``lax.while_loop``;
    within each doubling, 2^j leapfrog steps run in a ``lax.while_loop``
    with u-turn checkpoints at power-of-two boundaries."""
    D = z0.shape[0]
    if inv_mass is None:
        inv_mass = jnp.ones(D)

    logp_and_grad = jax.value_and_grad(logdensity_fn)
    leapfrog = _leapfrog(logp_and_grad, eps, inv_mass)

    key, r_key = jax.random.split(key)
    r0 = jax.random.normal(r_key, (D,)) / jnp.sqrt(inv_mass)
    logp0, grad0 = logp_and_grad(z0)
    # Non-finite initial energy (e.g. a zero-density start) would make
    # delta = -inf read as perfect acceptance while the chain never
    # moves. Mark it diverging with accept 0 instead (Stan/numpyro
    # error on this; inside jit we flag it) — the flags are folded in
    # at the end of the transition.
    finite0 = jnp.isfinite(logp0)
    energy0 = -logp0 + _kinetic(r0, inv_mass)
    init = _IntegratorState(z0, r0, logp0, grad0)

    # Trajectory state: left/right frontier, multinomial proposal, log-sum
    # of subtree weights, momentum sum, u-turn/divergence flags.
    class TrajState(NamedTuple):
        key: jax.Array
        left: _IntegratorState
        right: _IntegratorState
        proposal_z: jax.Array
        log_sum_w: jax.Array
        r_sum: jax.Array
        depth: jax.Array
        turning: jax.Array
        diverging: jax.Array
        num_steps: jax.Array
        sum_accept: jax.Array

    traj = TrajState(
        key, init, init, z0, jnp.zeros(()), r0,
        jnp.zeros((), jnp.int32), jnp.asarray(False), jnp.asarray(False),
        jnp.zeros((), jnp.int32), jnp.zeros(()),
    )

    def build_subtree(key, frontier: _IntegratorState, direction,
                      num_steps):
        """Run ``num_steps`` leapfrog steps from ``frontier`` in
        ``direction``; returns (new_frontier, subtree proposal,
        log_sum_w, r_sum, turning, diverging, sum_accept)."""
        step_fn = _leapfrog(
            logp_and_grad, direction * eps, inv_mass
        )

        class SubState(NamedTuple):
            i: jax.Array
            state: _IntegratorState
            proposal_z: jax.Array
            log_sum_w: jax.Array
            r_sum: jax.Array
            r_ckpts: jax.Array
            r_sum_ckpts: jax.Array
            turning: jax.Array
            diverging: jax.Array
            key: jax.Array
            sum_accept: jax.Array

        def cond(s: SubState):
            return (s.i < num_steps) & ~s.turning & ~s.diverging

        def body(s: SubState):
            state = step_fn(s.state)
            energy = -state.logp + _kinetic(state.r, inv_mass)
            delta = energy - energy0
            diverging = (delta > max_delta_energy) | jnp.isnan(delta)
            delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
            log_w = -delta
            accept = jnp.minimum(1.0, jnp.exp(-delta))
            # Multinomial progressive sampling within the subtree.
            key, sub_key = jax.random.split(s.key)
            new_log_sum = jnp.logaddexp(s.log_sum_w, log_w)
            take = (
                jnp.log(jax.random.uniform(sub_key, ()))
                < log_w - new_log_sum
            )
            proposal_z = jnp.where(take, state.z, s.proposal_z)
            r_sum = s.r_sum + state.r

            # U-turn checkpointing (Phan et al.): at even i store
            # (r, r_sum) at stack height popcount(i); at odd i check the
            # trailing_ones(i) completed power-of-two subtrees ending here.
            is_even = (s.i % 2) == 0
            store_idx = _popcount_ones(s.i)  # stack height
            r_ckpts = jnp.where(
                is_even,
                s.r_ckpts.at[store_idx].set(state.r),
                s.r_ckpts,
            )
            r_sum_ckpts = jnp.where(
                is_even,
                s.r_sum_ckpts.at[store_idx].set(r_sum),
                s.r_sum_ckpts,
            )

            def check_turning(_):
                # Check subtrees: for odd i, the number of completed
                # subtrees equals the number of trailing ones of i.
                n_checks = _trailing_ones(s.i)

                def scan_check(carry, k):
                    turning = carry
                    valid = k < n_checks
                    ck_idx = store_idx - k - 1
                    ck_idx = jnp.clip(ck_idx, 0, max_depth - 1)
                    r_l = r_ckpts[ck_idx]
                    rs = r_sum - r_sum_ckpts[ck_idx] + r_l
                    t = _is_turning(inv_mass, r_l, state.r, rs)
                    return turning | (valid & t), None

                turning, _ = lax.scan(
                    scan_check, jnp.asarray(False),
                    jnp.arange(max_depth),
                )
                return turning

            turning = lax.cond(
                is_even, lambda _: jnp.asarray(False), check_turning,
                operand=None,
            )
            return SubState(
                s.i + 1, state, proposal_z,
                new_log_sum, r_sum, r_ckpts, r_sum_ckpts,
                s.turning | turning, s.diverging | diverging, key,
                s.sum_accept + accept,
            )

        neg_inf = jnp.asarray(-jnp.inf)
        init_sub = SubState(
            jnp.zeros((), jnp.int32), frontier, frontier.z, neg_inf,
            jnp.zeros_like(frontier.r),
            jnp.zeros((max_depth, D)), jnp.zeros((max_depth, D)),
            jnp.asarray(False), jnp.asarray(False), key, jnp.zeros(()),
        )
        out = lax.while_loop(cond, body, init_sub)
        return out

    def cond(t: TrajState):
        return (t.depth < max_depth) & ~t.turning & ~t.diverging

    def body(t: TrajState):
        key, dir_key, merge_key, sub_key = jax.random.split(t.key, 4)
        direction = jnp.where(
            jax.random.bernoulli(dir_key), 1.0, -1.0
        )
        frontier = jtu_select(direction > 0, t.right, t.left)
        num_steps = jnp.asarray(2, jnp.int32) ** t.depth
        sub = build_subtree(sub_key, frontier, direction, num_steps)

        new_frontier = sub.state
        left = jtu_select(direction > 0, t.left, new_frontier)
        right = jtu_select(direction > 0, new_frontier, t.right)

        # Biased progressive sampling between old trajectory and subtree.
        log_sum_w = jnp.logaddexp(t.log_sum_w, sub.log_sum_w)
        accept_new = (
            jnp.log(jax.random.uniform(merge_key, ()))
            < sub.log_sum_w - t.log_sum_w
        )
        subtree_ok = ~sub.turning & ~sub.diverging
        proposal_z = jnp.where(
            accept_new & subtree_ok, sub.proposal_z, t.proposal_z
        )
        r_sum = t.r_sum + sub.r_sum
        whole_turning = _is_turning(inv_mass, left.r, right.r, r_sum)
        return TrajState(
            key, left, right, proposal_z,
            jnp.where(subtree_ok, log_sum_w, t.log_sum_w),
            r_sum, t.depth + 1,
            sub.turning | whole_turning,
            sub.diverging,
            t.num_steps + sub.i,
            t.sum_accept + sub.sum_accept,
        )

    out = lax.while_loop(cond, body, traj)
    accept_prob = out.sum_accept / jnp.maximum(out.num_steps, 1)
    # Fold the non-finite-start flag in: the chain did not move (all
    # deltas were NaN-gated), report accept 0 + diverging so adaptation
    # and diagnostics see the stuck chain instead of accept = 1.
    accept_prob = jnp.where(finite0, accept_prob, 0.0)
    info = NUTSInfo(
        accept_prob, out.num_steps, out.diverging | ~finite0, energy0
    )
    return jnp.where(finite0, out.proposal_z, z0), info


def check_float_latents(vals):
    """Gradient-based kernels require continuous latents: an int leaf
    raveled into the position vector would drift ballistically (its
    gradient through the int-cast is zero) and truncate back to int
    with no MH correction — a silently wrong kernel. Parity with
    HMC's ``static_check_supports_grad`` guard (``hmc.py:36-53``)."""
    import jax.tree_util as _jtu

    for leaf in _jtu.tree_leaves(vals):
        if not jnp.issubdtype(jnp.result_type(leaf), jnp.floating):
            raise TypeError(
                "NUTS position includes a non-float latent (dtype "
                f"{jnp.result_type(leaf)}). Exclude discrete sites "
                "from the selection and move them with a separate "
                "Regenerate/enumeration kernel."
            )


def jtu_select(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b
    )


def _trailing_ones(i):
    """Number of trailing one-bits of i (= number of completed subtrees
    ending at odd position i). Single-op form: ``i ^ (i+1)`` sets the
    trailing-ones run plus the next bit, so popcount − 1 counts the run
    (replaces a per-leapfrog-step scalar while_loop)."""
    i = jnp.asarray(i, jnp.int32)
    return lax.population_count(i ^ (i + 1)) - 1


def _popcount_ones(i):
    """Stack height for checkpoint storage: number of set bits of i
    (one hardware op; replaces a 32-iteration fori_loop per step)."""
    return lax.population_count(jnp.asarray(i, jnp.int32))


@Pytree.dataclass
class NUTS(EditRequest):
    """NUTS over the selected choices of a trace. The returned edit weight
    is 0 (NUTS transitions preserve the posterior; use directly or under
    ``mh`` which then always accepts)."""

    selection: Selection
    eps: Any
    max_depth: int = Pytree.static(default=8)
    inv_mass: Any = None

    def edit(self, key: jax.Array, tr: Trace[Any], argdiffs: Argdiffs):
        assert Diff.static_check_no_change(argdiffs)
        args = Diff.tree_primal(argdiffs)
        chm = tr.get_choices()
        selected = chm.filter(self.selection)
        complement = chm.filter(~self.selection)
        # Ravel only the Choice payloads — structural leaves (Switch
        # idx, Mask flags) stay out of the position vector.
        vals, rebuild = partition_values(selected)
        check_float_latents(vals)
        flat, unravel_vals = ravel_pytree(vals)

        def unravel(z_vec):
            return rebuild(unravel_vals(z_vec))

        gen_fn = tr.get_gen_fn()

        def logdensity(z_vec):
            score, _ = gen_fn.assess(unravel(z_vec) | complement, args)
            return score

        key, up_key = jax.random.split(key)
        z_next, info = nuts_kernel(
            logdensity, flat, key, self.eps,
            inv_mass=self.inv_mass, max_depth=self.max_depth,
        )
        new_tr, _w, retdiff, _bwd = Update(unravel(z_next)).edit(
            up_key, tr, argdiffs
        )
        return new_tr, jnp.zeros(()), retdiff, NUTS(
            self.selection, self.eps, self.max_depth, self.inv_mass
        )
