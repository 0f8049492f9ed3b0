"""Smoke tests for the MXU benchmark configs (BASELINE.md configs 8/9):
the --small variants must run end-to-end on CPU, produce sane metrics,
and pass their built-in correctness gates. The full-size variants are
measured on the TPU by bench.py / benchmarks/run_all.py."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
)


def test_config8_mxu_logreg_small():
    from benchmarks.run_all import config8_mxu_logreg

    r = config8_mxu_logreg(True)
    assert r["metric"] == "nuts_mxu_logreg_chain_leapfrogs_per_s"
    assert r["value"] > 0
    # Posterior mean separates active from inactive coefficients.
    assert r["posterior_sep"] > 0.2
    assert "achieved_mxu_frac" in r


def test_config9_bnn_vi_small():
    from benchmarks.run_all import config9_bnn_vi

    r = config9_bnn_vi(True)
    assert r["metric"] == "bnn_vi_mxu_grad_steps_per_s"
    assert r["value"] > 0
    # The variational mean moved off the zero init toward the teacher.
    assert r["mu_moved"] > 0.01


def test_config10_svgd_small():
    from benchmarks.run_all import config10_svgd

    r = config10_svgd(True)
    assert r["metric"] == "svgd_blr_particle_grad_steps_per_s"
    assert r["value"] > 0
    # 10 small-ensemble steps only roughly approach the posterior; the
    # tight gate lives in the full-size run (post_mean_err ~ 1e-2).
    assert r["post_mean_err"] < 1.0
    assert "achieved_mxu_frac" in r
