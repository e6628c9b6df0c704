"""Streaming-sweep equivalence: the Mhat-free Pallas reduction path must
reproduce the XLA sweep path draw-for-draw (same keys, same sampling math —
only the reduction provider differs, so results match to reduction-order
ULPs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesnmf_tpu.config import ModelSpec, default_hyperprior_params
from bayesnmf_tpu.models import gibbs, updates as U
from bayesnmf_tpu.ops import math as m


def _setup(K=16, N=3, G=150, prior="truncnormal", seed=0):
    rng = np.random.default_rng(seed)
    P = rng.dirichlet(np.ones(K) * 0.5, N).T * 40
    E = rng.gamma(2.0, 2.0, (N, G))
    data = jnp.asarray(rng.poisson(P @ E).astype(np.float32))
    spec = ModelSpec(K=K, N=N, G=G, likelihood="poisson", prior=prior,
                     MH=True)
    hp = default_hyperprior_params(spec, float(np.asarray(data).mean()))
    state = gibbs.init_state(spec, hp, data, jax.random.PRNGKey(seed))
    return spec, data, state


@pytest.mark.parametrize("prior", ["truncnormal", "exponential"])
@pytest.mark.parametrize("accept_all", [False, True])
def test_stream_sweep_P_matches_xla(prior, accept_all):
    spec, data, state = _setup(prior=prior)
    params, pr = state["params"], state["prior"]
    acc = jnp.zeros((spec.K, spec.N))
    key = jax.random.PRNGKey(7)
    Mh = m.mhat(params["P"], params["A"], params["E"])
    P1, _, a1, nn1 = U.sweep_P(spec, data, params, pr, Mh, acc, key,
                               accept_all)
    P2, a2, nn2 = U.stream_sweep_P(spec, data, params, pr, acc, key,
                                   accept_all)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P2),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               rtol=2e-4, atol=2e-5)
    assert float(nn1) == float(nn2) == 0.0


@pytest.mark.parametrize("prior", ["truncnormal", "exponential"])
def test_stream_sweep_E_matches_xla(prior):
    spec, data, state = _setup(prior=prior, seed=3)
    params, pr = state["params"], state["prior"]
    acc = jnp.zeros((spec.N, spec.G))
    key = jax.random.PRNGKey(9)
    Mh = m.mhat(params["P"], params["A"], params["E"])
    E1, _, a1, _ = U.sweep_E(spec, data, params, pr, Mh, acc, key, False)
    E2, a2, _ = U.stream_sweep_E(spec, data, params, pr, acc, key, False)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E2),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               rtol=2e-4, atol=2e-5)


def test_stream_sweeps_ragged_tile_and_excluded_column():
    """A G that cannot be a tile multiple exercises the in-kernel ragged
    mask; an excluded column (A_n = 0) must draw from the prior."""
    spec, data, state = _setup(G=131)
    params, pr = state["params"], state["prior"]
    params = dict(params)
    params["A"] = params["A"].at[1].set(0.0)
    acc = jnp.zeros((spec.K, spec.N))
    key = jax.random.PRNGKey(11)
    Mh = m.mhat(params["P"], params["A"], params["E"])
    P1, _, a1, _ = U.sweep_P(spec, data, params, pr, Mh, acc, key, False)
    P2, a2, _ = U.stream_sweep_P(spec, data, params, pr, acc, key, False)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P2),
                               rtol=2e-4, atol=2e-5)


def test_stream_sweeps_vmapped_over_chains():
    """vmap over a chain axis (the ensemble path) preserves equivalence —
    in particular the in-kernel grid/program_id semantics under batching."""
    spec, data, state = _setup(G=140)
    C = 3
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    from bayesnmf_tpu.parallel import chains as CH

    hp = default_hyperprior_params(spec, float(np.asarray(data).mean()))
    states = CH.init_chain_states(spec, hp, data, jax.random.PRNGKey(1), C)
    params, pr = states["params"], states["prior"]
    acc = jnp.zeros((C, spec.K, spec.N))

    def xla(p, prr, a, k):
        Mh = m.mhat(p["P"], p["A"], p["E"])
        P1, _, a1, _ = U.sweep_P(spec, data, p, prr, Mh, a, k, False)
        return P1, a1

    def stream(p, prr, a, k):
        P2, a2, _ = U.stream_sweep_P(spec, data, p, prr, a, k, False)
        return P2, a2

    P1, a1 = jax.vmap(xla, in_axes=(0, 0, 0, 0))(params, pr, acc, keys)
    P2, a2 = jax.vmap(stream, in_axes=(0, 0, 0, 0))(params, pr, acc, keys)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P2),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               rtol=2e-4, atol=2e-5)
