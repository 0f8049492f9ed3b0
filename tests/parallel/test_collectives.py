"""Explicit-collective path (parallel/collectives.py): agreement with the
global/GSPMD path on the virtual 8-device CPU mesh, and HLO assertions
that collectives (psum/ppermute) — not a full gather of particle state —
implement the communication (VERDICT round-1 item 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from genjax_tpu.inference.smc import (
    effective_sample_size,
    resample_tree,
)
from genjax_tpu.parallel.collectives import (
    shardmap_ess,
    shardmap_logz,
    shardmap_systematic_resample,
)
from genjax_tpu.parallel.mesh import particle_mesh

N = 1 << 12


@pytest.fixture(scope="module")
def mesh():
    return particle_mesh()


def _weights(key):
    return jax.random.normal(key, (N,)) * 3.0


class TestReductions:
    def test_logz_matches_global(self, mesh):
        lw = _weights(jax.random.key(0))
        from jax.scipy.special import logsumexp

        want = logsumexp(lw) - jnp.log(N)
        got = jax.jit(lambda w: shardmap_logz(w, mesh))(lw)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    def test_ess_matches_global(self, mesh):
        lw = _weights(jax.random.key(1))
        want = effective_sample_size(lw)
        got = jax.jit(lambda w: shardmap_ess(w, mesh))(lw)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_psum_in_hlo(self, mesh):
        lw = _weights(jax.random.key(0))
        txt = (
            jax.jit(lambda w: shardmap_logz(w, mesh))
            .lower(lw)
            .compile()
            .as_text()
        )
        assert "all-reduce" in txt


class TestDistributedResample:
    def test_matches_global_systematic(self, mesh):
        key = jax.random.key(3)
        lw = _weights(jax.random.key(4))
        xs = jax.random.normal(jax.random.key(5), (N,))
        aux = jax.random.normal(jax.random.key(6), (N, 3))
        want = resample_tree(key, lw, (xs, aux), N, "systematic")
        got = jax.jit(
            lambda k, w, t: shardmap_systematic_resample(k, w, t, mesh)
        )(key, lw, (xs, aux))
        # Same grid, same CDF up to float summation order: ancestor
        # choices may differ only where a grid point lands within an ulp
        # of a CDF boundary — both sides are then valid systematic
        # resamples. Require agreement on all but a handful of slots.
        mism = int(np.sum(np.asarray(want[0]) != np.asarray(got[0])))
        assert mism <= 4, mism
        mism_aux = int(np.sum(np.any(
            np.asarray(want[1]) != np.asarray(got[1]), axis=-1
        )))
        assert mism_aux <= 4, mism_aux

    def test_skewed_weights_cross_shard(self, mesh):
        # All mass on a handful of particles in one shard: every other
        # shard's outputs must come over the ring.
        key = jax.random.key(7)
        lw = jnp.full((N,), -1e9).at[:4].set(jnp.array([0.0, 0.1, 0.2, 0.3]))
        xs = jnp.arange(N, dtype=jnp.float32)
        want = resample_tree(key, lw, xs, N, "systematic")
        got = jax.jit(
            lambda k, w, t: shardmap_systematic_resample(k, w, t, mesh)
        )(key, lw, xs)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    def test_layout_independence(self, mesh):
        # Pre-sharding the inputs across the mesh changes nothing.
        key = jax.random.key(8)
        lw = _weights(jax.random.key(9))
        xs = jax.random.normal(jax.random.key(10), (N,))
        sh = NamedSharding(mesh, P("particles"))
        lw_s = jax.device_put(lw, sh)
        xs_s = jax.device_put(xs, sh)
        a = shardmap_systematic_resample(key, lw, xs, mesh)
        b = jax.jit(
            lambda k, w, t: shardmap_systematic_resample(k, w, t, mesh)
        )(key, lw_s, xs_s)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_hlo_has_permute_but_no_full_gather(self, mesh):
        key = jax.random.key(3)
        lw = _weights(jax.random.key(4))
        xs = jax.random.normal(jax.random.key(5), (N,))
        txt = (
            jax.jit(
                lambda k, w, t: shardmap_systematic_resample(k, w, t, mesh)
            )
            .lower(key, lw, xs)
            .compile()
            .as_text()
        )
        assert "collective-permute" in txt
        # No collective may materialize the full N-particle state on one
        # device: every all-gather/all-reduce output stays O(N/D) or
        # scalar-sized (the D block sums).
        for line in txt.splitlines():
            if "all-gather" in line or "all-reduce" in line:
                assert f"f32[{N}]" not in line, line
                assert f"s32[{N}]" not in line, line
