"""Fused systematic-resampling CDF→counts Pallas kernel.

The XLA lowering of ``systematic_offspring_cumulative``
(``inference/smc.py``) spends two full-size ``reduce-window`` sweeps per
resample — ``cumsum`` over the 1M-element weight ensemble plus the
``cummax`` monotonicity repair — ~0.36 ms/resample on a v5e, the second-
largest item in the headline filter's per-step profile after the
expansion contraction. This kernel fuses the whole post-reduction
pipeline (``exp`` → prefix-sum → monotone repair → scale/ceil/clip →
int cast) into ONE pass over the ensemble:

- the array is processed in ``(rows, 128)`` chunks by a sequential TPU
  grid; a running-total scalar in SMEM carries the prefix across chunks
  (grid steps execute in order on the core, scratch persists);
- within a chunk the prefix is Hillis–Steele: 7 shifted adds across
  lanes, then an exclusive sublane prefix of the row totals —
  register-resident VPU work instead of XLA's windowed scans;
- monotone repair stays REQUIRED (shifted-add association differs per
  prefix, so a 1-ulp dip would double-assign a dest — see
  ``systematic_offspring_cumulative``) but prefix-MAX is exact in
  floating point, so the in-kernel Hillis–Steele cummax (+ carried
  scalar max) reproduces the global ``cummax`` semantics exactly;
- the final entry is pinned to exactly ``n`` (f32 rounding at 2^20
  otherwise drops the last dest for ~25 % of seeds).

Global quantities that must precede the emit (the stability max and the
normalizer ``total``) are one fused XLA reduction — cheap — so the
kernel needs a single pallas_call.

No reference counterpart (the reference resamples via ``torch.gather``
with no CDF kernel); exists because of the TPU cost model in
``ops/resample.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["systematic_cumulative_pallas", "supports_pallas_cdf",
           "pick_chunk_rows"]

LANES = 128


def supports_pallas_cdf(n: int, chunk_rows: int = 512) -> bool:
    """Kernel path requires the ensemble to tile exactly into
    ``(chunk_rows, 128)`` chunks."""
    return n % (chunk_rows * LANES) == 0 and n >= chunk_rows * LANES


def pick_chunk_rows(n: int) -> int | None:
    """Largest supported chunk height for ``n``, or None if the kernel
    cannot tile it (fall back to the XLA path)."""
    for rows in (512, 256, 128, 64, 32, 16, 8):
        if supports_pallas_cdf(n, rows):
            return rows
    return None


def _lane_prefix(x, op):
    """Inclusive Hillis–Steele prefix along the lane axis (width 128)."""
    for s in (1, 2, 4, 8, 16, 32, 64):
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[:, :s]) if op is jnp.add
             else jnp.full_like(x[:, :s], -jnp.inf),
             x[:, :-s]], axis=1,
        )
        x = op(x, shifted)
    return x


def _sublane_prefix(x, rows, op):
    """Inclusive Hillis–Steele prefix along the sublane axis.

    ``x`` must be FULL LANE WIDTH (rows, 128): Mosaic rejects sublane
    concatenation of narrow (rows, 1) columns ("result/input offset
    mismatch on non-concat dimension"), so callers lane-broadcast their
    column first — the redundant lanes are free VPU work."""
    s = 1
    while s < rows:
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[:s]) if op is jnp.add
             else jnp.full_like(x[:s], -jnp.inf),
             x[:-s]], axis=0,
        )
        x = op(x, shifted)
        s *= 2
    return x


def _cdf_counts_kernel(scal_ref, lw_ref, out_ref, carry_ref, *,
                       rows: int, n: int, n_chunks: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0.0          # running prefix total
        carry_ref[1] = 0.0          # running max (cum ≥ 0 always)

    m = scal_ref[0]
    scale = scal_ref[1]
    u0 = scal_ref[2]

    x = jnp.exp(lw_ref[:] - m)                        # (rows, 128)
    chunk_total = jnp.sum(x)
    # Within-chunk inclusive prefix in element (row-major) order.
    px = _lane_prefix(x, jnp.add)
    # Row totals lane-broadcast to full width (see _sublane_prefix).
    row_tot = px[:, LANES - 1:LANES] + jnp.zeros_like(px)
    row_incl = _sublane_prefix(row_tot, rows, jnp.add)
    row_off = row_incl - row_tot                      # exclusive
    cum = px + row_off + carry_ref[0]

    # Exact monotone repair (prefix-max is exact in fp): within-row
    # running max across lanes, then every row is lifted by the max of
    # all PRIOR rows (exclusive sublane prefix of the row maxima) and
    # by the carried cross-chunk max.
    cum = _lane_prefix(cum, jnp.maximum)
    rmax = jnp.maximum(
        cum[:, LANES - 1:LANES], jnp.full_like(cum, -jnp.inf)
    )                                                 # lane-broadcast
    rmax_incl = _sublane_prefix(rmax, rows, jnp.maximum)
    prior = jnp.concatenate(
        [jnp.full_like(rmax_incl[:1], -jnp.inf), rmax_incl[:-1]], axis=0
    )
    cum = jnp.maximum(cum, prior)
    cum = jnp.maximum(cum, carry_ref[1])

    counts = jnp.clip(
        jnp.ceil(cum * scale - u0), 0.0, float(n)
    ).astype(jnp.int32)

    @pl.when(i == n_chunks - 1)
    def _():
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        last = (row_ids == rows - 1) & (col_ids == LANES - 1)
        out_ref[:] = jnp.where(last, n, counts)

    @pl.when(i != n_chunks - 1)
    def _():
        out_ref[:] = counts

    carry_ref[0] = carry_ref[0] + chunk_total
    carry_ref[1] = jnp.max(cum)


def systematic_cumulative_pallas(key: jax.Array, log_weights: jax.Array,
                                 n: int, *, chunk_rows: int = 512,
                                 interpret: bool = False) -> jax.Array:
    """Drop-in for ``smc.systematic_offspring_cumulative`` on tiling
    sizes (``supports_pallas_cdf``): inclusive cumulative offspring
    counts of systematic resampling, one fused kernel pass. Bit-level
    summation order differs from the XLA path (both are valid CDFs of
    the same weights; invariants — nondecreasing, last == n — hold
    exactly)."""
    assert supports_pallas_cdf(n, chunk_rows)
    rows_total = n // LANES
    n_chunks = rows_total // chunk_rows

    lw2 = log_weights.reshape(rows_total, LANES)
    m = jnp.max(log_weights)
    total = jnp.sum(jnp.exp(log_weights - m))
    u0 = jax.random.uniform(key, ())
    scal = jnp.stack([m, n / total, u0])

    kern = functools.partial(
        _cdf_counts_kernel, rows=chunk_rows, n=n, n_chunks=n_chunks
    )
    out = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (chunk_rows, LANES), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (chunk_rows, LANES), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=interpret,
    )(scal, lw2)
    return out.reshape(n)
