"""End-to-end smoke tests: every model family runs, stays finite, and makes
chunk-granular progress."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesnmf_tpu.config import ConvergenceControl, ModelSpec
from bayesnmf_tpu.models import gibbs
from bayesnmf_tpu.config import default_hyperprior_params


def make_data(seed=0, K=8, N=3, G=12, scale=30.0):
    rng = np.random.default_rng(seed)
    P = rng.dirichlet(np.ones(K) * 2.0, N).T * scale
    E = rng.gamma(2.0, 2.0, (N, G))
    M = rng.poisson(P @ E).astype(np.float32)
    return M, P.astype(np.float32), E.astype(np.float32)


FAMILIES = [
    ("poisson", "truncnormal", True),
    ("poisson", "exponential", True),
    ("poisson", "exponential", False),
    ("poisson", "gamma", False),
    ("normal", "truncnormal", False),
    ("normal", "exponential", False),
]


@pytest.mark.parametrize("likelihood,prior,mh", FAMILIES)
def test_family_runs_finite(likelihood, prior, mh):
    M, _, _ = make_data()
    spec = ModelSpec(K=8, N=3, G=12, likelihood=likelihood, prior=prior, MH=mh)
    hp = default_hyperprior_params(spec, float(M.mean()))
    data = jnp.asarray(M)
    state = gibbs.init_state(spec, hp, data, jax.random.PRNGKey(0))
    temps = jnp.ones(10, jnp.float32)
    state, samples = gibbs.run_chunk(spec, data, hp, state, temps, mh)
    for name in ("P", "E", "A"):
        arr = np.asarray(samples[name])
        assert np.isfinite(arr).all(), name
        assert (arr >= 0).all(), name
    met = np.asarray(samples["metrics"])
    assert met.shape == (10, gibbs.N_METRICS)
    assert np.isfinite(met[:, :5]).all()
    # iter column increments
    np.testing.assert_allclose(met[:, 0], np.arange(2, 12))


@pytest.mark.parametrize("likelihood,prior,mh", FAMILIES)
def test_family_learning_rank_runs(likelihood, prior, mh):
    M, _, _ = make_data()
    spec = ModelSpec(K=8, N=4, G=12, likelihood=likelihood, prior=prior,
                     MH=mh, learning_rank=True, rank_method="SBFI")
    hp = default_hyperprior_params(spec, float(M.mean()))
    data = jnp.asarray(M)
    state = gibbs.init_state(spec, hp, data, jax.random.PRNGKey(1))
    temps = jnp.asarray(gibbs.temp_schedule(10, 5))
    state, samples = gibbs.run_chunk(spec, data, hp, state, temps, mh)
    A = np.asarray(samples["A"])
    assert set(np.unique(A)).issubset({0.0, 1.0})
    assert np.isfinite(np.asarray(samples["metrics"])[:, :5]).all()


def test_loglik_improves_over_random_init():
    # a short run should increase the data loglik substantially vs iteration 1
    M, _, _ = make_data(K=12, N=3, G=20, scale=60.0)
    spec = ModelSpec(K=12, N=3, G=20, likelihood="poisson",
                     prior="exponential", MH=False)
    hp = default_hyperprior_params(spec, float(M.mean()))
    data = jnp.asarray(M)
    state = gibbs.init_state(spec, hp, data, jax.random.PRNGKey(2))
    temps = jnp.ones(150, jnp.float32)
    state, samples = gibbs.run_chunk(spec, data, hp, state, temps, False)
    ll = np.asarray(samples["metrics"])[:, 3]
    assert ll[-1] > ll[0]
    # final loglik should be in the right ballpark of saturated model
    assert np.isfinite(ll[-1])


def test_rng_reproducible():
    M, _, _ = make_data()
    spec = ModelSpec(K=8, N=3, G=12, likelihood="poisson",
                     prior="exponential", MH=False)
    hp = default_hyperprior_params(spec, float(M.mean()))
    data = jnp.asarray(M)
    outs = []
    for _ in range(2):
        state = gibbs.init_state(spec, hp, data, jax.random.PRNGKey(7))
        temps = jnp.ones(5, jnp.float32)
        _, samples = gibbs.run_chunk(spec, data, hp, state, temps, False)
        outs.append(np.asarray(samples["P"]))
    np.testing.assert_array_equal(outs[0], outs[1])
