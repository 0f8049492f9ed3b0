"""Cookbook 9 — TPU performance engineering: how the fast paths work.

No reference counterpart (the reference is CUDA/torch-free pure JAX with
no performance cookbook; SURVEY §6). This walkthrough documents the
measured v5e cost model behind this framework's hot paths and the three
design rules that fall out of it. Numbers quoted below were measured on
a TPU v5e (`benchmarks/tpu_micro.py`, BASELINE.md); the code here runs
anywhere (CI executes it on CPU).

## The cost model that drives everything

Measured at 1M elements on a v5e:

| op class                              | cost      |
|---------------------------------------|-----------|
| elementwise / fused chains            | ~0.4–0.6 ms per UNFUSED kernel; fused chains are ~free |
| reductions, logsumexp                 | ~0.01 ms (bandwidth-bound) |
| 1-D random gather / scatter           | ~8 ms each (serialized element addressing) |
| `searchsorted` (binary search)        | ~160 ms — never |
| whole (8,128)-aligned row moves       | ~12x cheaper than element gathers |
| per-dispatch latency (tunneled chip)  | ~30 ms — fold loops into ONE `jit` |

Three rules:

1. **Never address elements; address lane rows.** XLA's 1-D gather
   lowering serializes; moving aligned (8, 128) rows rides the DMA
   engines.
2. **Turn data movement into compute.** The VPU does ~10^12 ops/s;
   compare/select/reduce over registers is effectively free relative
   to any memory-irregular op, so replacing one gather with hundreds
   of compares per element WINS.
3. **Batch until the chip notices.** Small workloads are latency-bound:
   1024 NUTS chains cost the same wall time as 256; 1M vmapped VI fits
   cost the same as 1k (BASELINE.md round-2 sweeps). Scale the batch
   axis until wall time moves.
"""

import jax
import jax.numpy as jnp
import numpy as np

import genjax_tpu as g

# ----------------------------------------------------------------------
# Rule 2 worked example: resampling without gathers.
#
# Systematic resampling needs dest[j] = src[a_j] for a monotone ancestor
# sequence a — a 1M-element gather (~8 ms) plus its inverse scatter.
# `ops/resample.py` reformulates it: each source owns a contiguous dest
# interval (offspring-count cumsum); each 128-dest block compares its
# dest indices against a small slab of candidate interval ends and
# contracts the membership mask against value *bit patterns* whose
# differences telescope exactly in integer arithmetic. One compare per
# candidate, no element-level addressing anywhere. 18.7 ms -> ~0.7 ms.
# ----------------------------------------------------------------------
from genjax_tpu.inference.smc import systematic_offspring_counts
from genjax_tpu.ops.resample import expand_by_counts

n = 1024
key = jax.random.key(0)
logw = 2.0 * jax.random.normal(key, (n,))
counts = systematic_offspring_counts(key, logw, n)
xs = jax.random.normal(jax.random.key(1), (n,))

fast = expand_by_counts(xs, counts, n)
oracle = jnp.repeat(xs, counts, total_repeat_length=n)
np.testing.assert_array_equal(np.asarray(fast), np.asarray(oracle))
# Bitwise identical — the fast path is a drop-in, not an approximation.

# Degenerate weights spread a block's dests over many thinly-populated
# source rows. Pass 1 handles every typical block in one fixed-size
# window; the rare "stragglers" are compacted into small batches and
# redone with wider windows, so one bad block costs a 256-block-sized
# loop, not a rerun over all 8192 blocks (this was worth +18% on the
# 1M-particle filter: BASELINE.md).
heavy = jnp.where(jnp.arange(n) == 7, 0.0, -12.0)  # near-degenerate
counts_h = systematic_offspring_counts(key, heavy, n)
fast_h = expand_by_counts(xs, counts_h, n)
np.testing.assert_array_equal(
    np.asarray(fast_h),
    np.asarray(jnp.repeat(xs, counts_h, total_repeat_length=n)),
)

# ----------------------------------------------------------------------
# When XLA's lowering is the bottleneck: Pallas.
#
# The weight-CDF pipeline (exp -> cumsum -> monotone repair -> ceil)
# lowers to two full-size reduce-window sweeps (~0.38 ms at 1M). The
# fused kernel in `ops/cdf_counts.py` does it in one pass: sequential
# grid chunks, a running-total scalar carried in SMEM, Hillis-Steele
# lane+sublane prefixes in registers, and an exact prefix-max repair
# (~0.03 ms measured, ~12x). The same kernel runs here in interpret
# mode — behavior is identical off-TPU:
# ----------------------------------------------------------------------
from genjax_tpu.ops.cdf_counts import systematic_cumulative_pallas

n2 = 1 << 14
lw2 = jax.random.normal(jax.random.key(2), (n2,))
cc = systematic_cumulative_pallas(
    jax.random.key(3), lw2, n2, chunk_rows=8, interpret=True
)
assert int(cc[-1]) == n2                       # exact tail pin
assert bool((jnp.diff(cc) >= 0).all())         # monotone partition

# Why the monotone repair is not optional: XLA's (and any chunked)
# cumsum associates differently per prefix, so at f32 a 1-ulp dip can
# assign one dest to TWO sources. Prefix-max is exact in floating
# point, so repairing with cummax costs nothing in correctness.

# ----------------------------------------------------------------------
# Rule 3 worked example: the batch axis is free until it isn't.
#
# Everything in this framework treats particles/chains/fits as plain
# vmap axes, so scaling them is a one-argument change. On CPU this has
# linear cost; on a TPU the wall time is FLAT until the lane count
# reaches millions (measured sweeps in BASELINE.md: NUTS 256->1024
# chains free, VI 1k->1M fits free). Design models so the ensemble axis
# is the OUTER vmap and let the compiler fill the vector units.
# ----------------------------------------------------------------------
from genjax_tpu.inference import ImportanceK, Target


@g.gen
def bb(a, b):
    p = g.beta(a, b) @ "p"
    v = g.flip(p) @ "v"
    return v


target = Target(bb, (2.0, 2.0), g.C["v"].set(True))
alg = ImportanceK(target, k_particles=64)
keys = jax.random.split(jax.random.key(4), 256)  # 256 = a free axis on TPU
posterior_means = jax.jit(
    jax.vmap(lambda k: alg.random_weighted(k, target)[1]["p"])
)(keys)
assert abs(float(posterior_means.mean()) - 0.6) < 0.05

# ----------------------------------------------------------------------
# Measuring honestly on a TPU (see CLAUDE.md for the tunnel specifics):
# fold repetitions into ONE jitted lax.scan (dispatch ~30 ms dwarfs
# sub-ms kernels), run past the first 1-3 executions of a fresh
# executable, and sync by materializing a scalar (`float(x)`), never
# `block_until_ready` alone on asynchronous-completion backends. The
# bench harness (`bench.py`, `benchmarks/run_all.py`) also reports
# `achieved_bw_frac` / `achieved_flops_frac` — throughput as a fraction
# of v5e HBM bandwidth and VPU peak from a documented per-step cost
# model — so "fast" is a roofline claim, not a vibe.
# ----------------------------------------------------------------------
print("cookbook 9 ok:",
      float(posterior_means.mean()), int(cc[-1]), n2)
