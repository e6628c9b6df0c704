"""Geweke 'getting it right' joint-distribution tests.

Validates every Gibbs transition jointly (SURVEY.md §4 implication): if the
sampler's transition kernel leaves p(params | data) invariant, then the
successive-conditional chain — params-transition followed by re-drawing the
data from the likelihood — started from an exact prior draw stays exactly in
the joint p(params, data) at every step. Its marginal statistics of (P, E)
must match plain prior draws.

Design: C independent chains vmapped on device, T steps each; per-chain means
are (nearly) iid units, giving a clean z-test against the marginal-draw mean.
A systematic error in any conditional (wrong rate, swapped shape, biased
truncated-normal, broken slice sampler...) shifts these statistics by many
standard errors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesnmf_tpu.config import ModelSpec
from bayesnmf_tpu.models import gibbs

K, N, G = 3, 2, 4
C = 64     # chains
T = 250    # transitions per chain


def fixed_hp(spec):
    """Constant hyperpriors (cannot depend on data in a Geweke test)."""
    if spec.prior == "truncnormal":
        hp = {"m_p": 1.0, "s_p": 0.5, "a_p": 4.0, "b_p": 3.0,
              "m_e": 1.0, "s_e": 0.5, "a_e": 4.0, "b_e": 3.0}
    elif spec.prior == "exponential":
        hp = {"a_p": 5.0, "b_p": 5.0, "a_e": 5.0, "b_e": 5.0}
    else:
        hp = {"a_p": 6.0, "b_p": 3.0, "c_p": 6.0, "d_p": 3.0,
              "a_e": 6.0, "b_e": 3.0, "c_e": 6.0, "d_e": 3.0}
    if spec.likelihood == "normal":
        hp |= {"alpha": 4.0, "beta": 3.0}
    return hp


def redraw_data(spec, key, params):
    """Exact draw of the data layer given params.

    For the Z-augmented Poisson-Gibbs path the latent counts are part of the
    joint: regenerate Z ~ Poisson(P_kn A_n E_ng) elementwise and set
    M = Σ_n Z (keeping the M = ΣZ constraint consistent); the marginal of M
    is the same Poisson(Mhat). Returns (data, params) with refreshed Z-sums.
    """
    from bayesnmf_tpu.ops import math as m

    if spec.likelihood == "poisson":
        if spec.needs_Z:
            lam = jnp.einsum("kn,n,ng->kng", params["P"], params["A"],
                             params["E"])
            Z = jax.random.poisson(key, jnp.maximum(lam, 1e-12)).astype(
                jnp.float32)
            params = dict(params)
            params["Zsum_g"] = jnp.sum(Z, axis=2)
            params["Zsum_k"] = jnp.sum(Z, axis=0)
            return jnp.sum(Z, axis=1), params
        Mh = m.mhat(params["P"], params["A"], params["E"])
        return (jax.random.poisson(key, jnp.maximum(Mh, 1e-6)).astype(
            jnp.float32), params)
    Mh = m.mhat(params["P"], params["A"], params["E"])
    noise = jax.random.normal(key, Mh.shape) * jnp.sqrt(
        params["sigmasq"][None, :])
    return Mh + noise, params


def stats_of(params):
    P, E = params["P"], params["E"]
    return jnp.stack([
        jnp.mean(P), jnp.mean(P * P), jnp.mean(E), jnp.mean(E * E),
        jnp.mean(P) * jnp.mean(E),
    ])


def run_successive(spec, hp, seed=0):
    """C chains x T successive-conditional transitions; returns per-chain mean
    statistics (C, n_stats)."""

    def one_chain(key):
        k0, k1, kloop = jax.random.split(key, 3)
        # initial exact joint draw: params from prior via init_state
        d0, p0 = redraw_data(
            spec, k0,
            gibbs.init_state(spec, hp, jnp.zeros((K, G)), k1)["params"])
        state = gibbs.init_state(spec, hp, d0, k1)
        state["params"] = {**state["params"],
                           **{k: v for k, v in p0.items()
                              if k in ("Zsum_g", "Zsum_k")}}

        def step(carry, kk):
            st, data = carry
            st, _ = gibbs.gibbs_step(spec, data, hp, st, jnp.float32(1.0),
                                     accept_all=False)
            data, new_params = redraw_data(spec, kk, st["params"])
            st = {**st, "params": new_params}
            return (st, data), stats_of(st["params"])

        keys = jax.random.split(kloop, T)
        (_, _), s = jax.lax.scan(step, (state, d0), keys)
        return jnp.mean(s[T // 5:], axis=0)  # drop a short initial stretch

    keys = jax.random.split(jax.random.PRNGKey(seed), C)
    return np.asarray(jax.jit(jax.vmap(one_chain))(keys))


def run_marginal(spec, hp, n=4096, seed=1):
    """Exact prior draws of (P, E) statistics (n, n_stats)."""

    def one(key):
        st = gibbs.init_state(spec, hp, jnp.zeros((K, G)), key)
        return stats_of(st["params"])

    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return np.asarray(jax.jit(jax.vmap(one))(keys))


FAMILIES = [
    ("poisson", "exponential", False),
    ("poisson", "gamma", False),
    ("poisson", "truncnormal", True),
    ("poisson", "exponential", True),
    ("normal", "truncnormal", False),
    ("normal", "exponential", False),
]


@pytest.mark.slow
@pytest.mark.parametrize("likelihood,prior,mh", FAMILIES)
def test_geweke_joint(likelihood, prior, mh):
    spec = ModelSpec(K=K, N=N, G=G, likelihood=likelihood, prior=prior, MH=mh)
    hp = fixed_hp(spec)
    succ = run_successive(spec, hp)
    marg = run_marginal(spec, hp)

    m_s = succ.mean(axis=0)
    se_s = succ.std(axis=0, ddof=1) / np.sqrt(succ.shape[0])
    m_m = marg.mean(axis=0)
    se_m = marg.std(axis=0, ddof=1) / np.sqrt(marg.shape[0])
    z = (m_s - m_m) / np.sqrt(se_s**2 + se_m**2)
    # within-chain correlation inflates the naive SE of chain means only
    # mildly (each chain mean is ~iid); 6 sigma leaves essentially zero
    # false-positive rate while catching any systematic conditional bug.
    assert np.all(np.abs(z) < 6.0), (
        f"Geweke mismatch for {likelihood}/{prior}/MH={mh}: z={z}, "
        f"succ={m_s}, marg={m_m}")
