"""Initial-value propagation contract (advanced.qmd:182-318): user-supplied
init_params / init_prior_params / hyperprior_params must be used verbatim."""

import numpy as np
import pytest

from bayesnmf_tpu import ConvergenceControl
from bayesnmf_tpu.models.sampler import GibbsSampler


def sim(seed=0, K=10, N=2, G=12):
    rng = np.random.default_rng(seed)
    P = rng.dirichlet(np.ones(K), N).T * 60.0
    E = rng.gamma(2.0, 2.0, (N, G))
    return rng.poisson(P @ E).astype(np.float32)


CC = ConvergenceControl(MAP_over=20, MAP_every=10, miniters=20, maxiters=40,
                        Ninarow_nochange=2, Ninarow_nobest=3)


def test_init_params_propagate():
    M = sim()
    rng = np.random.default_rng(1)
    P0 = rng.gamma(2.0, 1.0, (10, 2)).astype(np.float32)
    E0 = rng.gamma(2.0, 2.0, (2, 12)).astype(np.float32)
    s = GibbsSampler(M, 2, likelihood="poisson", prior="exponential", MH=False,
                     convergence_control=CC, init_params={"P": P0, "E": E0},
                     seed=0)
    # the recorded iteration-1 sample must be exactly the provided inits
    first = s._window[0]
    np.testing.assert_array_equal(np.asarray(first["P"])[0], P0)
    np.testing.assert_array_equal(np.asarray(first["E"])[0], E0)


def test_init_prior_params_propagate():
    M = sim()
    lam_p = np.full((10, 2), 0.7, np.float32)
    s = GibbsSampler(M, 2, likelihood="poisson", prior="exponential", MH=False,
                     convergence_control=CC,
                     init_prior_params={"Lambda_p": lam_p}, seed=0)
    np.testing.assert_array_equal(
        np.asarray(s.state["prior"]["Lambda_p"]), lam_p)


def test_hyperprior_scalar_override():
    M = sim()
    s = GibbsSampler(M, 2, likelihood="poisson", prior="exponential", MH=False,
                     convergence_control=CC,
                     hyperprior_params={"a_p": 3.0, "b_p": 2.0}, seed=0)
    assert s.hyperprior_params["a_p"] == 3.0
    assert s.hyperprior_params["b_p"] == 2.0
    # non-overridden entries keep defaults
    assert s.hyperprior_params["a_e"] == pytest.approx(10 * np.sqrt(2))


def test_sigmasq_prior_override_normal():
    M = sim().astype(np.float32)
    s = GibbsSampler(M, 2, likelihood="normal", prior="truncnormal", MH=False,
                     convergence_control=CC,
                     init_prior_params={"alpha": 5.0, "beta": 7.0}, seed=0)
    np.testing.assert_allclose(np.asarray(s.state["prior"]["Alpha_sig"]), 5.0)
    np.testing.assert_allclose(np.asarray(s.state["prior"]["Beta_sig"]), 7.0)


def test_output_dir_collision_suffixing(tmp_path):
    M = sim()
    base = str(tmp_path / "run")
    s1 = GibbsSampler(M, 2, prior="exponential", MH=False,
                      convergence_control=CC, output_dir=base, seed=0)
    s2 = GibbsSampler(M, 2, prior="exponential", MH=False,
                      convergence_control=CC, output_dir=base, seed=0)
    assert s1.output_dir == base
    assert s2.output_dir == base + "_1"
    # overwrite=True wipes and reuses
    (tmp_path / "run" / "marker.txt").write_text("x")
    s3 = GibbsSampler(M, 2, prior="exponential", MH=False,
                      convergence_control=CC, output_dir=base, overwrite=True,
                      seed=0)
    assert s3.output_dir == base
    import os

    assert not os.path.exists(str(tmp_path / "run" / "marker.txt"))
