"""One-hot contraction row/element selection vs fancy indexing, and the
MXU-native HMM bootstrap filter vs the exact forward filter."""

import jax
import jax.numpy as jnp
import numpy as np

from genjax_tpu.ops.onehot import one_hot_rows, take_elems, take_rows


def test_take_rows_matches_gather():
    k = jax.random.key(0)
    table = jax.random.normal(k, (64, 32))
    idx = jax.random.randint(jax.random.key(1), (1000,), 0, 64)
    got = take_rows(table, idx)
    want = table[idx]
    # One-hot matmul reproduces rows to f32 roundoff (bf16x3 lowering
    # on TPU; exact on CPU) — docstring contract.
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_take_rows_multidim_table():
    table = jax.random.normal(jax.random.key(2), (16, 4, 5))
    idx = jnp.array([3, 3, 0, 15])
    got = take_rows(table, idx)
    assert got.shape == (4, 4, 5)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(table[idx]), rtol=1e-6, atol=1e-6
    )


def test_take_elems_matches_gather():
    v = jax.random.normal(jax.random.key(3), (128,))
    idx = jax.random.randint(jax.random.key(4), (777,), 0, 128)
    np.testing.assert_allclose(
        np.asarray(take_elems(v, idx)), np.asarray(v[idx]),
        rtol=1e-6, atol=1e-6,
    )


def test_one_hot_rows_exact():
    oh = one_hot_rows(jnp.array([0, 2, 2]), 4)
    np.testing.assert_array_equal(
        np.asarray(oh),
        np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 1, 0]], np.float32),
    )


def test_hmm_bootstrap_filter_logz():
    from genjax_tpu.lang.distributions.discrete_hmm import (
        DiscreteHMMConfiguration, forward_filter,
    )
    from genjax_tpu.inference.exact_testbed import sample_problem
    from genjax_tpu.models import hmm_bootstrap_filter

    S, T = 16, 24
    config = DiscreteHMMConfiguration.circulant(S, S)
    problem = sample_problem(jax.random.key(3), config, T)
    obs = problem.observations
    _, exact = forward_filter(config, obs)

    run = hmm_bootstrap_filter(config, 4096)
    fs, _ = jax.jit(run)(jax.random.key(5), obs)
    assert abs(float(fs.log_z) - float(exact)) < 0.25


def test_hmm_bootstrap_filter_sharded_bitwise():
    """The MXU one-hot HMM filter under a mesh sharding constraint:
    same bits as the unsharded run (batched path: one key per step, so
    ensemble values are layout-independent), particles spread over the
    virtual 8-device mesh."""
    import numpy as np

    from genjax_tpu.lang.distributions.discrete_hmm import (
        DiscreteHMMConfiguration,
    )
    from genjax_tpu.inference.exact_testbed import sample_problem
    from genjax_tpu.models import hmm_bootstrap_filter
    from genjax_tpu.parallel.mesh import particle_mesh, shard_leading_axis

    S, T, P = 16, 12, 1024
    config = DiscreteHMMConfiguration.circulant(S, S)
    obs = sample_problem(jax.random.key(3), config, T).observations

    run_plain = hmm_bootstrap_filter(config, P)
    fs0, lz0 = jax.jit(run_plain)(jax.random.key(5), obs)

    mesh = particle_mesh()
    run_sharded = hmm_bootstrap_filter(
        config, P,
        shard_constraint=lambda t: shard_leading_axis(
            t, mesh, "particles"
        ),
    )
    fs1, lz1 = jax.jit(run_sharded)(jax.random.key(5), obs)

    np.testing.assert_array_equal(
        np.asarray(fs0.log_z), np.asarray(fs1.log_z)
    )
    np.testing.assert_array_equal(
        np.asarray(fs0.particles), np.asarray(fs1.particles)
    )
    shards = {sh.device for sh in fs1.particles.addressable_shards}
    assert len(shards) == len(jax.devices())


def test_hmm_bootstrap_filter_gumbel_path_logz():
    """Both transition samplers target the same law: the gumbel
    (categorical) path also matches the exact forward filter."""
    from genjax_tpu.lang.distributions.discrete_hmm import (
        DiscreteHMMConfiguration, forward_filter,
    )
    from genjax_tpu.inference.exact_testbed import sample_problem
    from genjax_tpu.models import hmm_bootstrap_filter

    S, T = 16, 24
    config = DiscreteHMMConfiguration.circulant(S, S)
    obs = sample_problem(jax.random.key(3), config, T).observations
    _, exact = forward_filter(config, obs)
    run = hmm_bootstrap_filter(config, 4096, sampling="gumbel")
    fs, _ = jax.jit(run)(jax.random.key(5), obs)
    assert abs(float(fs.log_z) - float(exact)) < 0.25

    import pytest
    with pytest.raises(ValueError, match="sampling"):
        hmm_bootstrap_filter(config, 64, sampling="nope")
