"""Constructor-time argument validation (VERDICT r2 missing item 1:
the reference's beartype blanket; here targeted eager checks that fail
with typed messages instead of late raw JAX errors)."""

import jax.numpy as jnp
import pytest

import genjax_tpu as g


@g.gen
def unit():
    x = g.normal(0.0, 1.0) @ "x"
    return x


class TestCombinatorChecks:
    def test_bad_in_axes(self):
        with pytest.raises(TypeError, match="in_axes"):
            unit.vmap(in_axes="zero")
        with pytest.raises(TypeError, match="in_axes"):
            unit.vmap(in_axes=(0, 1.5))

    def test_valid_in_axes_pass(self):
        unit.vmap(in_axes=0)
        unit.vmap(in_axes=(None,))
        unit.vmap(in_axes=((0, None),))

    def test_switch_non_genfn(self):
        with pytest.raises(TypeError, match="GenerativeFunction"):
            unit.switch(lambda: 1.0)
        with pytest.raises(ValueError, match="at least one"):
            from genjax_tpu.lang.combinators.switch import switch

            switch()

    def test_mix_or_else_non_genfn(self):
        with pytest.raises(TypeError, match="GenerativeFunction"):
            unit.mix("not a model")
        with pytest.raises(TypeError, match="GenerativeFunction"):
            unit.or_else(42)

    def test_repeat_iterate_bad_n(self):
        with pytest.raises(ValueError, match="static int"):
            unit.repeat(n=0)
        with pytest.raises(ValueError, match="static int"):
            unit.iterate(n="many")

    def test_dimap_non_callable(self):
        with pytest.raises(TypeError, match="callable"):
            unit.dimap(pre=3)

    def test_marginal_bad_selection(self):
        with pytest.raises(TypeError, match="Selection"):
            unit.marginal(selection="x")


class TestFilterChecks:
    def test_filter_non_selection_non_flag(self):
        chm = g.C["x"].set(1.0)
        with pytest.raises(TypeError, match="Selection or a boolean"):
            chm.filter("x")
        with pytest.raises(TypeError, match="Selection or a boolean"):
            chm.filter(1.0)

    def test_filter_flag_ok(self):
        chm = g.C["x"].set(1.0)
        assert chm.filter(True)["x"] == 1.0
        out = chm.filter(jnp.asarray(False))
        assert out is not None

    def test_filter_selection_ok(self):
        chm = g.C["x"].set(1.0)
        assert "x" in chm.filter(g.S.at["x"])


class TestCompatShims:
    def test_implicit_logit_warning(self):
        import warnings

        import genjax_tpu as g
        from genjax_tpu.compat import implicit_logit_warning

        b = implicit_logit_warning(g.bernoulli)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            _ = b(0.3)  # bare positional -> deprecation warning
        assert any(
            issubclass(x.category, DeprecationWarning) for x in w
        )
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            _ = b(logits=0.3)
            _ = b(probs=0.6)
        assert not w
        with pytest.raises(TypeError, match="exactly one"):
            b(0.3, logits=0.1)

    def test_experimental_importable(self):
        import genjax_tpu.experimental  # noqa: F401
