"""Blocked interval-expansion resampler vs the jnp.repeat oracle —
bitwise equality across weight regimes, dtypes, and pytrees."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genjax_tpu.ops.resample import expand_by_counts, supports_fast_expand

KEY = jax.random.key(11)


def _counts_from_logw(key, logw, n):
    from genjax_tpu.inference.smc import systematic_offspring_counts

    return systematic_offspring_counts(key, logw, n)


def _oracle(tree, counts, n):
    return jax.tree_util.tree_map(
        lambda v: jnp.repeat(v, counts, axis=0, total_repeat_length=n),
        tree,
    )


N = 1024  # = 8 lane rows of 128; blocks of 2 rows


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
        # Two surviving particles in far-apart lane rows: stresses the
        # empty-row compaction (long runs without it).
        logw = jnp.where(
            (jnp.arange(n) == 3) | (jnp.arange(n) == n - 2), 0.0, -1e9
        )
    else:  # head_tail
        logw = jnp.where(jnp.arange(n) < 8, 10.0, -2.0)
    counts = _counts_from_logw(KEY, logw, n)
    assert int(counts.sum()) == n
    xs = jax.random.normal(jax.random.key(1), (n,))
    got = expand_by_counts(xs, counts, n)
    want = _oracle(xs, counts, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pytree_multi_dtype():
    n = N
    logw = jax.random.normal(KEY, (n,)) * 2.0
    counts = _counts_from_logw(KEY, logw, n)
    tree = {
        "x": jax.random.normal(jax.random.key(2), (n, 3)),
        "z": jax.random.randint(jax.random.key(3), (n,), 0, 1000),
        "f": jax.random.bernoulli(jax.random.key(4), 0.5, (n,)),
    }
    got = expand_by_counts(tree, counts, n)
    want = _oracle(tree, counts, n)
    for k in tree:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]), err_msg=k
        )
        assert got[k].dtype == want[k].dtype


def test_jit_and_grad_safe_shapes():
    n = N
    logw = jax.random.normal(KEY, (n,))
    counts = _counts_from_logw(KEY, logw, n)
    xs = jax.random.normal(jax.random.key(5), (n,))
    got = jax.jit(lambda c, x: expand_by_counts(x, c, n))(counts, xs)
    want = _oracle(xs, counts, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_supports_fast_expand():
    assert supports_fast_expand(1 << 20, 1 << 20)
    assert not supports_fast_expand(1000, 1000)
    assert not supports_fast_expand(1 << 20, 1 << 19)


def test_block_boundary_runs():
    """Counts engineered so intervals straddle block boundaries."""
    n = N
    counts = jnp.zeros((n,), jnp.int32)
    # Source 0 covers 300 dests (crosses two block boundaries), source
    # 511 covers the rest of the first half, source 512 the second half.
    counts = counts.at[0].set(300)
    counts = counts.at[511].set(212)
    counts = counts.at[512].set(n - 512)
    xs = jnp.arange(n, dtype=jnp.float32)
    got = expand_by_counts(xs, counts, n)
    want = _oracle(xs, counts, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cumulative_tail_exact_at_1m():
    """f32 cumsum rounding at 2^20 used to drop the final dest for ~25%
    of seeds (sum(counts) == n-1): the cumulative's last entry is pinned
    to exactly n (= ceil(n·1 − u0) analytically)."""
    from genjax_tpu.inference.smc import systematic_offspring_cumulative

    n = 1 << 20
    for seed in range(4):
        k = jax.random.key(seed)
        lw = jax.random.normal(k, (n,)) * 2.0
        cc = systematic_offspring_cumulative(k, lw, n)
        assert int(cc[-1]) == n
        counts = jnp.diff(jnp.concatenate([jnp.zeros(1, jnp.int32), cc]))
        assert int(counts.sum()) == n
        assert int(counts.min()) >= 0


def test_expand_by_cumulative_matches_counts_path():
    n = N
    logw = jax.random.normal(KEY, (n,)) * 2.0
    counts = _counts_from_logw(KEY, logw, n)
    cc = jnp.cumsum(counts).astype(jnp.int32)
    xs = jax.random.normal(jax.random.key(7), (n,))
    from genjax_tpu.ops.resample import expand_by_cumulative

    got = expand_by_cumulative(xs, cc, n)
    want = _oracle(xs, counts, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_straggler_redo_pathological_tail():
    """One heavy source + one thin source per remaining row: the last
    block's dests span every row, far beyond pass-1's window, forcing
    the straggler redo loop (round-2 compaction rework)."""
    n = N
    g = n // 128
    counts = jnp.zeros((n,), jnp.int32)
    counts = counts.at[0].set(n - (g - 1))
    for r in range(1, g):
        counts = counts.at[128 * r].set(1)
    xs = jnp.arange(n, dtype=jnp.float32)
    got = expand_by_counts(xs, counts, n)
    want = _oracle(xs, counts, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("seed", range(6))
def test_straggler_batching_randomized(seed):
    """Tiny windows + tiny straggler batches: nearly every block
    straggles and the outer compaction loop must iterate multiple
    times. Bitwise vs the repeat oracle across weight regimes."""
    n = N
    k = jax.random.key(seed)
    logw = 3.0 * jax.random.normal(k, (n,))
    counts = _counts_from_logw(k, logw, n)
    tree = {
        "x": jax.random.normal(jax.random.key(seed + 100), (n,)),
        "i": jax.random.randint(jax.random.key(seed + 200), (n,), 0, 99),
    }
    got = expand_by_counts(
        tree, counts, n, margin=0, straggler_margin=1, straggler_batch=2
    )
    want = _oracle(tree, counts, n)
    for kk in tree:
        np.testing.assert_array_equal(
            np.asarray(got[kk]), np.asarray(want[kk]), err_msg=kk
        )


def test_no_straggler_short_circuit():
    """Uniform weights: every block covered in pass 1; the outer
    while must be a no-op (merely checking it still matches)."""
    n = N
    counts = jnp.ones((n,), jnp.int32)
    xs = jax.random.normal(jax.random.key(8), (n, 2))
    got = expand_by_counts(xs, counts, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(xs))


class TestRecursiveBlockStarts:
    """The O(n) recursive block-start path (``_first_rows`` recursion)
    must be bitwise-identical to the brute-force compare."""

    @pytest.mark.parametrize("regime", [
        "uniform", "mild", "skewed", "one_hot", "two_far", "head_tail",
    ])
    def test_forced_recursion_matches_repeat(self, regime, monkeypatch):
        import genjax_tpu.ops.resample as rs

        # Force the recursive path at test size (production threshold
        # is 16384 rows = 2^21 particles).
        monkeypatch.setattr(rs, "_K0_RECURSE_MIN_ROWS", 128)
        n = 128 * 128  # G = D = 128: smallest recursable size
        if regime == "uniform":
            logw = jnp.zeros(n)
        elif regime == "mild":
            logw = jax.random.normal(KEY, (n,))
        elif regime == "skewed":
            logw = 3.0 * jax.random.normal(KEY, (n,))
        elif regime == "one_hot":
            logw = jnp.where(jnp.arange(n) == 3891, 0.0, -1e9)
        elif regime == "two_far":
            logw = jnp.where(
                (jnp.arange(n) == 3) | (jnp.arange(n) == n - 2),
                0.0, -1e9,
            )
        else:  # head_tail
            logw = jnp.where(jnp.arange(n) < 8, 10.0, -2.0)
        counts = _counts_from_logw(KEY, logw, n)
        assert int(counts.sum()) == n
        xs = jax.random.normal(jax.random.key(1), (n,))
        got = rs.expand_by_counts(xs, counts, n)
        want = _oracle(xs, counts, n)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_first_rows_recursive_equals_quadratic(self, monkeypatch):
        import genjax_tpu.ops.resample as rs

        n = 128 * 256
        B = 128
        G = D = n // B
        block_lo = jnp.arange(D, dtype=jnp.int32) * B
        for seed in range(5):
            k = jax.random.key(seed)
            # Random nondecreasing rowend_c ending exactly at n (the
            # compacted-row invariant), including runs of equal ends
            # (ex-empty rows).
            bnds = jnp.sort(
                jax.random.randint(k, (G - 1,), 0, n + 1)
            ).astype(jnp.int32)
            rowend = jnp.concatenate(
                [bnds, jnp.array([n], jnp.int32)]
            )
            quad = jnp.sum(
                rowend[None, :] <= block_lo[:, None], axis=1
            ).astype(jnp.int32)
            monkeypatch.setattr(rs, "_K0_RECURSE_MIN_ROWS", 128)
            rec = rs._first_rows(rowend, block_lo, G, D, B)
            np.testing.assert_array_equal(
                np.asarray(rec), np.asarray(quad)
            )

    def test_production_threshold_not_hit_below_2_21(self):
        import genjax_tpu.ops.resample as rs

        assert rs._K0_RECURSE_MIN_ROWS == 16384  # 2^21 particles


def _random_counts(key, n):
    """Random nonnegative counts summing to n (multinomial draw)."""
    lw = jax.random.normal(key, (n,))
    from genjax_tpu.inference.smc import systematic_offspring_counts

    return systematic_offspring_counts(jax.random.fold_in(key, 1), lw, n)


class TestWideEventLeaves:
    """Wide-event leaves (>= _WIDE_EVENT_MIN trailing elements) expand
    via ancestor row-gather (round 3); bitwise vs the repeat oracle and
    vs the narrow contraction."""

    from genjax_tpu.ops.resample import expand_by_cumulative  # noqa

    def test_wide_leaf_bitwise_vs_repeat(self):
        import numpy as np

        n = 1024
        counts = _random_counts(jax.random.key(0), n)
        cc = jnp.cumsum(counts).astype(jnp.int32)
        tree = {
            "narrow": jax.random.normal(jax.random.key(1), (n,)),
            "wide": jax.random.normal(jax.random.key(2), (n, 64)),
            "wider": jax.random.normal(jax.random.key(3), (n, 2, 48)),
        }
        from genjax_tpu.ops.resample import expand_by_cumulative

        got = expand_by_cumulative(tree, cc, n)
        want = jax.tree_util.tree_map(
            lambda v: jnp.repeat(v, counts, axis=0,
                                 total_repeat_length=n),
            tree,
        )
        for k in tree:
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(want[k]), err_msg=k
            )

    def test_wide_matches_forced_narrow_path(self):
        import numpy as np

        import genjax_tpu.ops.resample as R

        n = 512
        counts = _random_counts(jax.random.key(4), n)
        cc = jnp.cumsum(counts).astype(jnp.int32)
        v = jax.random.normal(jax.random.key(5), (n, 64))
        from genjax_tpu.ops.resample import expand_by_cumulative

        got = expand_by_cumulative(v, cc, n)
        old = R._WIDE_EVENT_MIN
        try:
            R._WIDE_EVENT_MIN = 1 << 30
            want = expand_by_cumulative(v, cc, n)
        finally:
            R._WIDE_EVENT_MIN = old
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
