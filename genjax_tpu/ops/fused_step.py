"""Fused particle-filter step Pallas kernel: counter-based RNG +
propagate + log-likelihood + weight accumulate + online logsumexp/ESS
statistics in ONE pass over the ensemble.

Why: the headline tracking filter's non-resampling step cost is
dominated by separate full-size XLA passes — the threefry normal draw
(~0.6 ms at 1M, CLAUDE.md measurements), the dynamics/logpdf
elementwise chain, the weight add, and TWO logsumexp reductions for
ESS. Each is at most ~10 us of raw HBM traffic (8 MB round trip at
819 GB/s), so the step is pass-count-bound, not FLOP-bound
(BASELINE.md round-2 profile). This kernel does all of it in a single
sequential-grid sweep:

- **RNG in registers**: threefry2x32 (Random123; the same generator
  JAX's PRNG uses) evaluated on the element counter directly in the
  kernel — ~40 uint32 VPU ops/element, no HBM round trips for bits,
  bitwise-deterministic on every backend (unlike
  ``pltpu.prng_random_bits``, which interpret-mode stubs to zeros).
  Box–Muller turns the two output words into one N(0,1) draw.
- **User model inlined**: ``propagate(x, eps)`` and
  ``loglik(x_new, obs)`` are plain elementwise jnp callables traced
  into the kernel body (the VPU fuses them with the RNG math).
- **Reductions ride the sweep**: a 4-scalar SMEM carry maintains the
  online (max, sumexp) pairs of ``lw_new`` and ``2*lw_new`` across
  chunks, so logsumexp (for log Z) and ESS come out of the same pass —
  no separate reduction kernels.

No reference counterpart: the reference has no particle filter and no
kernels (SURVEY §2.1); this exists because of the TPU pass-cost model
above (cf. ``ops/resample.py``, ``ops/cdf_counts.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "threefry2x32",
    "normal_from_counter",
    "make_fused_step",
    "fused_step_reference",
    "supports_fused_step",
]

LANES = 128


def threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32, 20 rounds (Random123 spec): encrypt counter words
    ``(x0, x1)`` under key ``(k0, k1)``. All uint32; pure jnp, so the
    SAME code runs inside the kernel and as the host-side oracle."""
    rot_a = (13, 15, 26, 6)
    rot_b = (17, 29, 16, 24)
    ks = (k0, k1, k0 ^ k1 ^ jnp.uint32(0x1BD11BDA))

    def rotl(v, r):
        return (v << jnp.uint32(r)) | (v >> jnp.uint32(32 - r))

    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for g in range(5):
        rots = rot_a if g % 2 == 0 else rot_b
        for r in rots:
            x0 = x0 + x1
            x1 = rotl(x1, r)
            x1 = x1 ^ x0
        x0 = x0 + ks[(g + 1) % 3]
        x1 = x1 + ks[(g + 2) % 3] + jnp.uint32(g + 1)
    return x0, x1


def _u24_to_unit(bits):
    """Top 24 bits -> f32 uniform in [0, 1) (exact conversion)."""
    return (bits >> jnp.uint32(8)).astype(jnp.int32).astype(
        jnp.float32
    ) * jnp.float32(1.0 / (1 << 24))


def normal_from_counter(k0, k1, ctr):
    """One standard normal per counter element via threefry2x32 +
    Box–Muller (cosine branch). ``ctr`` uint32 array; deterministic
    given ``(k0, k1, ctr)`` on every backend."""
    b0, b1 = threefry2x32(k0, k1, ctr, jnp.zeros_like(ctr))
    u1 = _u24_to_unit(b0)                      # [0, 1)
    u2 = _u24_to_unit(b1)
    # 1 - u1 in (0, 2^-24 .. 1]: log argument never 0.
    r = jnp.sqrt(-2.0 * jnp.log1p(-u1))
    return r * jnp.cos((2.0 * jnp.pi) * u2)


def supports_fused_step(n: int, chunk_rows: int = 512) -> bool:
    return n % (chunk_rows * LANES) == 0 and n >= chunk_rows * LANES


def _logsumexp_pair_update(m, s, c, t):
    """Combine online (max, sumexp) state ``(m, s)`` with a chunk's
    ``(c, t)``; exact streaming logsumexp."""
    new_m = jnp.maximum(m, c)
    return new_m, s * jnp.exp(m - new_m) + t * jnp.exp(c - new_m)


def _fused_kernel(iscal_ref, fscal_ref, xs_ref, lw_ref,
                  xs_out, lw_out, stats_out, carry_ref, *,
                  rows, propagate, loglik):
    i = pl.program_id(0)
    k0 = iscal_ref[0].astype(jnp.uint32)
    k1 = iscal_ref[1].astype(jnp.uint32)
    obs = fscal_ref[0]

    # Per-element global counter (row-major over the full ensemble).
    base = (i * rows * LANES).astype(jnp.uint32)
    ctr = (
        base
        + jax.lax.broadcasted_iota(jnp.uint32, (rows, LANES), 0)
        * jnp.uint32(LANES)
        + jax.lax.broadcasted_iota(jnp.uint32, (rows, LANES), 1)
    )
    eps = normal_from_counter(k0, k1, ctr)

    x_new = propagate(xs_ref[:].astype(jnp.float32), eps)
    dlw = loglik(x_new, obs)
    lw_new = lw_ref[:] + dlw
    xs_out[:] = x_new.astype(xs_out.dtype)
    lw_out[:] = lw_new

    # Online logsumexp of lw_new (slots 0,1) and 2*lw_new (slots 2,3).
    c1 = jnp.max(lw_new)
    t1 = jnp.sum(jnp.exp(lw_new - c1))
    c2 = 2.0 * c1
    t2 = jnp.sum(jnp.exp(2.0 * (lw_new - c1)))

    @pl.when(i == 0)
    def _():
        carry_ref[0] = c1
        carry_ref[1] = t1
        carry_ref[2] = c2
        carry_ref[3] = t2

    @pl.when(i != 0)
    def _():
        m1, s1 = _logsumexp_pair_update(
            carry_ref[0], carry_ref[1], c1, t1
        )
        m2, s2 = _logsumexp_pair_update(
            carry_ref[2], carry_ref[3], c2, t2
        )
        carry_ref[0] = m1
        carry_ref[1] = s1
        carry_ref[2] = m2
        carry_ref[3] = s2

    # Stats block (constant index: lives in VMEM until the grid ends).
    # 2-D select instead of a 1-D stack (Mosaic wants >=2-D vectors).
    col = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    val = jnp.where(
        col == 0, carry_ref[0],
        jnp.where(col == 1, carry_ref[1],
                  jnp.where(col == 2, carry_ref[2], carry_ref[3])),
    )
    stats_out[:] = val


def make_fused_step(propagate, loglik, n: int, *, chunk_rows: int = 512,
                    state_dtype=jnp.float32, interpret: bool = False):
    """Build the fused step ``step(seeds, xs, lw, obs) -> (xs_new,
    lw_new, lse, ess)``.

    - ``propagate(x_f32, eps) -> x_new``: elementwise dynamics with one
      N(0,1) draw per particle;
    - ``loglik(x_new, obs) -> dlw``: elementwise incremental
      log-likelihood (``obs`` is a scalar);
    - ``seeds``: uint32[2] (e.g. ``jax.random.key_data(step_key)``);
    - ``lse`` = logsumexp(lw_new), ``ess`` the effective sample size of
      ``lw_new`` — both from the same kernel pass.
    """
    assert supports_fused_step(n, chunk_rows), (n, chunk_rows)
    rows_total = n // LANES
    n_chunks = rows_total // chunk_rows

    kern = functools.partial(
        _fused_kernel, rows=chunk_rows,
        propagate=propagate, loglik=loglik,
    )
    grid_kwargs = dict(
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, LANES), state_dtype),
            jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
            jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
        interpret=interpret,
    )
    call = pl.pallas_call(kern, **grid_kwargs)

    def step(seeds, xs, lw, obs):
        iscal = jax.lax.bitcast_convert_type(
            jnp.asarray(seeds, jnp.uint32), jnp.int32
        )
        fscal = jnp.asarray(obs, jnp.float32).reshape(1)
        xs2 = xs.reshape(rows_total, LANES)
        lw2 = lw.reshape(rows_total, LANES)
        xs_new, lw_new, stats = call(iscal, fscal, xs2, lw2)
        m1, s1, m2, s2 = (stats[0, j] for j in range(4))
        lse = m1 + jnp.log(s1)
        lse2 = m2 + jnp.log(s2)
        ess = jnp.exp(2.0 * lse - lse2)
        return xs_new.reshape(n), lw_new.reshape(n), lse, ess

    return step


def fused_step_reference(propagate, loglik, n: int,
                         state_dtype=jnp.float32):
    """Pure-jnp oracle of :func:`make_fused_step` — identical threefry/
    Box–Muller pipeline evaluated with XLA ops. Bitwise-equal
    ``xs_new``/``lw_new`` (same f32 operations in the same order per
    element); ``lse``/``ess`` equal up to reduction-order rounding."""

    def step(seeds, xs, lw, obs):
        seeds = jnp.asarray(seeds, jnp.uint32)
        ctr = jnp.arange(n, dtype=jnp.uint32)
        eps = normal_from_counter(seeds[0], seeds[1], ctr)
        x_new = propagate(xs.astype(jnp.float32), eps)
        dlw = loglik(x_new, jnp.asarray(obs, jnp.float32))
        lw_new = lw + dlw
        m = jnp.max(lw_new)
        lse = m + jnp.log(jnp.sum(jnp.exp(lw_new - m)))
        lse2 = 2.0 * m + jnp.log(jnp.sum(jnp.exp(2.0 * (lw_new - m))))
        ess = jnp.exp(2.0 * lse - lse2)
        return x_new.astype(state_dtype), lw_new, lse, ess

    return step
