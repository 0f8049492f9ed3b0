"""TPU micro-experiments for the resampling kernel design (ROADMAP perf
item 1). Times candidate primitives for the 1M-particle ancestor
expand, plus the per-op kernel floor inside one jit.

Run ONE AT A TIME against the tunnel: python benchmarks/tpu_micro.py
[--exp NAME]. Results inform genjax_tpu/ops/resample.py.
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

import jax
import jax.numpy as jnp

N = 1 << 20


def sync_time(fn, *args, reps=4):
    """Median wall time of single dispatches after 2 warmups."""
    out = fn(*args)
    jax.tree_util.tree_map(lambda v: v.block_until_ready(), out)
    for _ in range(2):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def scan_time(fn, key, reps=20):
    """Fold reps into one jit (tunnel-reliable), return time/rep."""

    @jax.jit
    def many(key):
        def body(c, i):
            out = fn(jax.random.fold_in(key, i))
            return c + jnp.sum(jax.tree_util.tree_leaves(out)[0]), None

        tot, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(reps))
        return tot

    float(many(key))
    float(many(jax.random.fold_in(key, 1)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(many(jax.random.fold_in(key, i + 2)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1] / reps


def make_weights(key):
    return jax.random.normal(key, (N,)) * 2.0  # log-weights, skewed


def exp_current(key):
    """Current TPU path: counts scatter + cumsum + sorted gather."""
    from genjax_tpu.inference.smc import resample_tree

    xs = jax.random.normal(key, (N,))

    def f(k):
        lw = make_weights(k)
        return resample_tree(k, lw, xs, N)

    return scan_time(f, key)


def exp_repeat(key):
    """counts + jnp.repeat(total_repeat_length) on TPU."""
    from genjax_tpu.inference.smc import systematic_offspring_counts

    xs = jax.random.normal(key, (N,))

    def f(k):
        lw = make_weights(k)
        counts = systematic_offspring_counts(k, lw, N)
        return jnp.repeat(xs, counts, total_repeat_length=N)

    return scan_time(f, key)


def exp_sorted_gather_flag(key):
    """lax.gather with indices_are_sorted=True on sorted ancestors."""
    from genjax_tpu.inference.smc import resample_indices

    xs = jax.random.normal(key, (N,))

    def f(k):
        lw = make_weights(k)
        idx = resample_indices(k, lw, N)
        return jnp.take(xs, idx, indices_are_sorted=True,
                        unique_indices=False)

    return scan_time(f, key)


def exp_take_along_rows(key):
    """Within-row gather: take_along_axis(axis=1) at (8192,128) and
    (1024,1024)."""
    out = {}
    for shape in [(8192, 128), (1024, 1024), (4096, 256)]:
        g, l = shape
        xs = jax.random.normal(key, shape)

        def f(k, xs=xs, g=g, l=l):
            idx = jax.random.randint(k, (g, l), 0, l)
            return jnp.take_along_axis(xs, idx, axis=1)

        out[str(shape)] = scan_time(f, key)
    return out


def exp_row_gather(key):
    """Row gather xs2[ids]: (G, L) rows by (G,) ids."""
    out = {}
    for shape in [(8192, 128), (1024, 1024)]:
        g, l = shape
        xs = jax.random.normal(key, shape)

        def f(k, xs=xs, g=g):
            ids = jax.random.randint(k, (g,), 0, g)
            return xs[ids]

        out[str(shape)] = scan_time(f, key)
    return out


def exp_counting_local(key):
    """Within-group ancestor computation by counting form:
    a[g,j] = sum_i (s[g,i] <= j) - 1, at (8192,128)."""
    g, l = 8192, 128

    def f(k):
        s = jnp.sort(jax.random.randint(k, (g, l), 0, l), axis=1)
        j = jnp.arange(l)
        a = jnp.sum(s[:, :, None] <= j[None, None, :], axis=1) - 1
        return jnp.clip(a, 0, l - 1).astype(jnp.float32)

    return scan_time(f, key)


def exp_fill_forward(key):
    """Monotone scatter of values + associative_scan fill-forward (the
    scatter-then-cummax expand), vs the two-scatter current path."""
    xs = jax.random.normal(key, (N,))

    def f(k):
        from genjax_tpu.inference.smc import systematic_offspring_counts

        lw = make_weights(k)
        counts = systematic_offspring_counts(k, lw, N)
        starts = jnp.cumsum(counts) - counts
        vals = jnp.zeros(N).at[starts].set(xs, mode="drop")
        flags = jnp.zeros(N, jnp.int32).at[starts].set(
            jnp.where(counts > 0, 1, 0), mode="drop"
        )

        def op(a, b):
            av, af = a
            bv, bf = b
            return jnp.where(bf > 0, bv, av), jnp.maximum(af, bf)

        out, _ = jax.lax.associative_scan(op, (vals, flags))
        return out

    return scan_time(f, key)


def exp_blocked_expand(key):
    """Blocked interval-expansion resampler (ops/resample.py) at 1M:
    counts + expand, parameter sweep over (rows_per_block, margin)."""
    from genjax_tpu.inference.smc import systematic_offspring_counts
    from genjax_tpu.ops.resample import expand_by_counts

    xs = jax.random.normal(key, (N,))
    out = {}
    for r, mg in [(1, 1), (1, 2), (1, 3), (1, 7)]:
        def f(k, r=r, mg=mg):
            lw = make_weights(k)
            counts = systematic_offspring_counts(k, lw, N)
            return expand_by_counts(
                xs, counts, N, rows_per_block=r, margin=mg
            )

        out[f"R{r}m{mg}"] = scan_time(f, key)
    return out


def exp_k0_recursive(key):
    """Quadratic vs recursive block-start (k0) computation inside the
    full counts+expand pipeline at 2^21..2^23 particles. The quadratic
    compare is O((n/128)^2); the recursive expansion is O(n)."""
    import genjax_tpu.ops.resample as rs
    from genjax_tpu.inference.smc import systematic_offspring_counts

    out = {}
    for logn in (21, 22, 23):
        n = 1 << logn
        xs = jax.random.normal(key, (n,))

        def f(k, n=n, xs=xs):
            lw = jax.random.normal(k, (n,)) * 2.0
            counts = systematic_offspring_counts(k, lw, n)
            return rs.expand_by_counts(xs, counts, n)

        for mode, thresh in (("quad", 1 << 30), ("rec", 16384)):
            rs._K0_RECURSE_MIN_ROWS = thresh
            out[f"n2^{logn}_{mode}"] = scan_time(f, key, reps=8)
    rs._K0_RECURSE_MIN_ROWS = 16384
    return out


def exp_hmm_step(key):
    """Discrete-HMM propagate+weight step formulations at 512k
    particles, S=64 (config 3's inner loop, resampling excluded):
    - gumbel:   one-hot matmul logits + categorical (current)
    - invcdf:   one-hot matmul row-CDF + compare-count (1 uniform per
                particle instead of P*S gumbels, no argmax)
    - invcdf_bf16: same with bf16 contraction
    """

    P, S = 1 << 19, 64
    kt, ko = jax.random.split(key)
    trans_logits = jax.random.normal(kt, (S, S))
    obs_logits = jax.nn.log_softmax(
        jax.random.normal(ko, (S, S)), axis=-1
    )
    trans_probs = jax.nn.softmax(trans_logits, axis=-1)
    trans_cdf = jnp.cumsum(trans_probs, axis=-1)
    from genjax_tpu.ops.onehot import one_hot_rows, take_elems, take_rows

    obs_col = obs_logits[:, 3]

    def gumbel(k):
        zs = jax.random.categorical(k, jnp.zeros(S), shape=(P,))
        def body(c, i):
            kk = jax.random.fold_in(k, i)
            logits = take_rows(trans_logits, c)
            z = jax.random.categorical(kk, logits, axis=-1)
            return z, jnp.sum(take_elems(obs_col, z))
        zT, s = jax.lax.scan(body, zs, jnp.arange(8))
        return s

    def invcdf(k, dtype=jnp.float32):
        zs = jax.random.categorical(k, jnp.zeros(S), shape=(P,))
        cdf = trans_cdf.astype(dtype)
        def body(c, i):
            kk = jax.random.fold_in(k, i)
            u = jax.random.uniform(kk, (P, 1), dtype=dtype)
            oh = one_hot_rows(c, S, dtype=dtype)
            rowcdf = jnp.dot(oh, cdf, preferred_element_type=dtype)
            z = jnp.sum(rowcdf < u, axis=-1).astype(jnp.int32)
            z = jnp.minimum(z, S - 1)
            return z, jnp.sum(take_elems(obs_col, z))
        zT, s = jax.lax.scan(body, zs, jnp.arange(8))
        return s

    out = {
        "gumbel": scan_time(gumbel, key, reps=4) / 8,
        "invcdf": scan_time(invcdf, key, reps=4) / 8,
        "invcdf_bf16": scan_time(
            lambda k: invcdf(k, jnp.bfloat16), key, reps=4
        ) / 8,
    }
    return out


def exp_bf16(key):
    """bf16 particle state vs f32 on the full tracking filter at 1M x 32
    (weights stay f32): throughput each + |dlogz| accuracy check."""
    import pathlib
    import sys as _sys

    _sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))
    import bench as headline

    out = {}
    logzs = {}
    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        run, _ = headline.build_pf(N, 32, state_dtype=dt)
        out[name] = scan_time(lambda k, run=run: run(k), key, reps=4)
        logzs[name] = float(run(jax.random.key(123)))
    print(f"# logz f32={logzs['f32']:.4f} bf16={logzs['bf16']:.4f} "
          f"|d|={abs(logzs['bf16'] - logzs['f32']):.4f}")
    return out


def exp_op_floor(key):
    """Per-kernel overhead: k dependent elementwise ops on 1M f32 inside
    one jit — slope = per-op cost, intercept = dispatch floor."""
    out = {}
    for k_ops in [1, 4, 16, 64]:
        def f(kk, k_ops=k_ops):
            x = jax.random.normal(kk, (N,))
            for i in range(k_ops):
                x = x * 1.000001 + 0.5
                x = x - 0.5
            return x

        out[k_ops] = scan_time(f, key)
    return out


def exp_cumsum(key):
    def f(k):
        x = jax.random.normal(k, (N,))
        return jnp.cumsum(x)

    return scan_time(f, key)


def exp_resample_split(key):
    """Stage-by-stage cost of one full 1M systematic resample on the
    production path (Pallas CDF + blocked expansion). Each stage adds
    one pipeline component on top of the previous inside the same scan,
    so pairwise differences isolate: weight gen | CDF kernel | expansion
    prep (compaction argsort, comb build, k0 rank compare, value-row
    gather) | pass-1 window | straggler redo."""
    from genjax_tpu.ops.cdf_counts import (
        pick_chunk_rows,
        systematic_cumulative_pallas,
    )
    from genjax_tpu.ops.resample import expand_by_cumulative

    xs = jax.random.normal(key, (N,))
    rows = pick_chunk_rows(N)
    out = {}

    def cdf(k):
        lw = make_weights(k)
        return systematic_cumulative_pallas(k, lw, N, chunk_rows=rows)

    out["lw_only"] = scan_time(lambda k: make_weights(k), key)
    out["lw_cdf"] = scan_time(lambda k: cdf(k).astype(jnp.float32), key)

    def prep_only(k):
        # expand_by_cumulative's pre-window stages, inlined (kept in
        # sync with ops/resample.py for measurement only).
        from jax import lax
        c_inc = cdf(k)
        L, G = 128, N // 128
        ends2 = c_inc.reshape(G, L)
        rowend = ends2[:, -1]
        rowstart = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), rowend[:-1]]
        )
        nonempty = rowend > rowstart
        order = jnp.argsort(jnp.logical_not(nonempty), stable=True)
        k_live = jnp.sum(nonempty)
        pad_k = jnp.arange(G) >= k_live
        rowend_c = jnp.where(pad_k, N, rowend[order])
        ends_c = jnp.where(pad_k[:, None], N, ends2[order])
        block_lo = jnp.arange(G, dtype=jnp.int32) * 128
        k0 = jnp.sum(
            rowend_c[None, :] <= block_lo[:, None], axis=1
        ).astype(jnp.int32)
        rc = lax.bitcast_convert_type(xs, jnp.int32).reshape(G, L)[order]
        return (jnp.sum(k0) + jnp.sum(ends_c[:, -1])
                + jnp.sum(rc[:, -1])).astype(jnp.float32)

    out["lw_cdf_prep"] = scan_time(prep_only, key)

    for mg in (1, 2, 3):
        def full(k, mg=mg):
            return expand_by_cumulative((xs,), cdf(k), N, margin=mg)[0]

        out[f"full_m{mg}"] = scan_time(full, key)
    return out


def exp_dispatch_ceiling(key):
    """VERDICT r4 item 8: separate fixed overhead (tunnel dispatch,
    warmup phase) from marginal device compute for the two
    latency-bound configs, and report each one's overhead-free on-chip
    ceiling — so "43x CPU" (config 1) and "~5x CPU" (config 2) are
    contextualized against the CHIP, not just the host.

    Config 1 (SIR): wall vs folded-rep count fits wall = b + a*reps;
    ceiling = particles-per-rep / a.  Config 2 (NUTS): wall and
    sampling-leapfrog count at 400 vs 800 samples give the marginal
    leapfrog rate; the fixed part is dispatch + the 200-iteration
    warmup."""
    import time as _time

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/genjax_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    import genjax_tpu as g
    from genjax_tpu.inference import ImportanceK, Target

    @g.gen
    def bb(a, b):
        p = g.beta(a, b) @ "p"
        v = g.flip(p) @ "v"
        return v

    target = Target(bb, (2.0, 2.0), g.C["v"].set(True))
    trials = 1024
    alg = ImportanceK(target, k_particles=1024)

    def sir_wall(reps):
        @jax.jit
        def many(kk):
            def body(c, i):
                ks = jax.random.split(jax.random.fold_in(kk, i), trials)
                col = jax.vmap(alg.run_smc)(ks)
                lml = col.get_log_marginal_likelihood_estimate()
                return c + lml.sum(), None

            tot, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(reps))
            return tot

        return sync_time(many, key, reps=5)

    w8, w32, w128 = sir_wall(8), sir_wall(32), sir_wall(128)
    a = (w128 - w32) / 96.0
    b = w32 - 32.0 * a
    n_per_rep = 1024.0 * trials
    print(f"  SIR: per-rep device {a*1e3:.3f} ms, fixed overhead "
          f"{b*1e3:.1f} ms (walls {w8*1e3:.1f}/{w32*1e3:.1f}/"
          f"{w128*1e3:.1f} ms at 8/32/128 reps)")
    print(f"  SIR overhead-free ceiling: {n_per_rep/a/1e6:.1f}M "
          f"particles/s (measured config value at 4 reps: "
          f"{4*n_per_rep/(b+4*a)/1e6:.1f}M)")

    from genjax_tpu.inference import run_nuts

    n_pts = 128
    xs = jnp.linspace(-1.0, 1.0, n_pts)
    ys = 2.0 * xs - 0.5

    @g.gen
    def reg(xs):
        slope = g.normal(0.0, 2.0) @ "slope"
        icept = g.normal(0.0, 2.0) @ "icept"
        _ = g.mv_normal_diag(
            slope * xs + icept, 0.2 * jnp.ones_like(xs)
        ) @ "ys"

    t2 = Target(reg, (xs,), g.C["ys"].set(ys))

    def nuts_run(samp):
        def run(k):
            chms, infos = run_nuts(
                t2, k, n_chains=1024, num_warmup=200,
                num_samples=samp, max_depth=6,
            )
            return jnp.sum(chms["slope"]), jnp.sum(infos.num_steps)

        fn = jax.jit(run)
        fn(key)[0].block_until_ready()
        float(fn(key)[0])
        ts, L = [], None
        for _ in range(3):
            t0 = _time.perf_counter()
            s, L = fn(key)
            float(s)
            ts.append(_time.perf_counter() - t0)
        return sorted(ts)[1], float(L)

    (wA, lA), (wB, lB) = nuts_run(400), nuts_run(800)
    rate = (lB - lA) / (wB - wA)
    fixed = wA - lA / rate
    print(f"  NUTS: walls {wA*1e3:.0f}/{wB*1e3:.0f} ms, sampling "
          f"leapfrogs {lA:.0f}/{lB:.0f}; marginal rate "
          f"{rate/1e6:.2f}M chain-leapfrogs/s")
    print(f"  NUTS fixed (dispatch + 200-iter warmup): {fixed*1e3:.0f}"
          f" ms = {fixed/wA*100:.0f}% of the 400-sample config wall")
    return {}


def exp_adaptive_expand(key):
    """Adaptive-window Pallas expansion vs the XLA blocked expansion
    at 1M: bitwise check first, then full-pipeline timings (lw gen +
    CDF kernel + expansion) for both, plus a degenerate-weights regime
    (many in-kernel while iterations)."""
    from genjax_tpu.ops.cdf_counts import (
        pick_chunk_rows,
        systematic_cumulative_pallas,
    )
    from genjax_tpu.ops.expand_adaptive import expand_adaptive
    from genjax_tpu.ops.resample import expand_by_cumulative

    xs = jax.random.normal(key, (N,))
    rows = pick_chunk_rows(N)

    def cdf(k, scale=1.0):
        lw = make_weights(k) * scale
        return systematic_cumulative_pallas(k, lw, N, chunk_rows=rows)

    # Bitwise check (compiled kernel on-chip).
    cc = jax.jit(cdf)(key)
    a = jax.jit(lambda c: expand_adaptive(xs, c, N))(cc)
    b = jax.jit(lambda c: expand_by_cumulative((xs,), c, N)[0])(cc)
    import numpy as _np
    _np.testing.assert_array_equal(_np.asarray(a), _np.asarray(b))
    print("# bitwise equal vs XLA expansion at 1M: OK")

    out = {}
    for name, scale in [("mild", 1.0), ("degen", 4.0)]:
        def f_pl(k, s=scale):
            return expand_adaptive(xs, cdf(k, s), N)

        def f_xla(k, s=scale):
            return expand_by_cumulative((xs,), cdf(k, s), N)[0]

        out[f"pallas_{name}"] = scan_time(f_pl, key)
        out[f"xla_{name}"] = scan_time(f_xla, key)
    return out


EXPS = {k[4:]: v for k, v in list(globals().items())
        if k.startswith("exp_")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default=None)
    args = ap.parse_args()
    key = jax.random.key(0)
    names = [args.exp] if args.exp else list(EXPS)
    print(f"# backend: {jax.default_backend()}, N={N}")
    for name in names:
        try:
            t = EXPS[name](key)
        except Exception as e:
            print(f"{name}: FAILED {e!r}")
            continue
        if isinstance(t, dict):
            for sub, tt in t.items():
                print(f"{name}[{sub}]: {tt * 1e3:.3f} ms")
        else:
            print(f"{name}: {t * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
