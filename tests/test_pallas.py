"""Tests of the Pallas special functions and the fused sweep kernel
(interpret mode on CPU; the TPU-compiled path is exercised by bench/drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from bayesnmf_tpu.config import ModelSpec, default_hyperprior_params
from bayesnmf_tpu.models import gibbs
from bayesnmf_tpu.ops import pallas_special as ps


def test_ndtri_accuracy():
    p = np.linspace(1e-6, 1 - 1e-6, 20001).astype(np.float32)
    got = np.asarray(ps.ndtri(jnp.array(p)))
    want = st.norm.ppf(p.astype(np.float64))
    assert np.abs(got - want).max() < 5e-4


def test_ndtr_accuracy():
    x = np.linspace(-9, 9, 20001).astype(np.float32)
    got = np.asarray(ps.ndtr(jnp.array(x)))
    want = st.norm.cdf(x)
    assert np.abs(got - want).max() < 5e-7


def test_log_ndtr_accuracy():
    x = np.linspace(-30, 8, 20001).astype(np.float32)
    got = np.asarray(ps.log_ndtr(jnp.array(x)))
    want = st.norm.logcdf(x.astype(np.float64))
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1.0)
    assert rel.max() < 1e-2, rel.max()


def test_truncnorm_icdf_distribution():
    rng = np.random.default_rng(0)
    u = rng.uniform(1e-6, 1 - 1e-6, 100000).astype(np.float32)
    for mu, sd in [(1.5, 0.7), (-2.0, 1.0), (0.0, 2.0)]:
        draws = np.asarray(ps.truncnorm_icdf_nonneg(
            jnp.array(u), jnp.float32(mu), jnp.float32(sd)))
        ref = st.truncnorm(-mu / sd, np.inf, loc=mu, scale=sd)
        assert (draws >= 0).all()
        _, p = st.kstest(draws, ref.cdf)
        assert p > 1e-4, (mu, sd, p)


def _run(fused, prior, seed=0, iters=600):
    K, N, G = 16, 3, 24
    rng = np.random.default_rng(seed)
    Pt = rng.dirichlet(np.ones(K) * 0.5, N).T * 50.0
    Et = rng.gamma(2.0, 2.0, (N, G))
    data = jnp.asarray(rng.poisson(Pt @ Et).astype(np.float32))
    spec = ModelSpec(K=K, N=N, G=G, likelihood="poisson", prior=prior,
                     MH=True, fused_sweeps=fused)
    hp = default_hyperprior_params(spec, float(np.asarray(data).mean()))
    state = gibbs.init_state(spec, hp, data, jax.random.PRNGKey(seed))
    temps = jnp.ones((iters,), jnp.float32)
    state, samples = gibbs.run_chunk(spec, data, hp, state, temps, False)
    return np.asarray(samples["metrics"])


def test_fused_kernel_runs_finite():
    """Smoke: fused sweeps produce finite samples/metrics and sane
    acceptance rates for both supported priors (interpret mode here)."""
    for prior in ("truncnormal", "exponential"):
        mp = _run(True, prior, iters=100)
        assert np.isfinite(mp[:, :5]).all()
        acc = mp[-50:, 9].mean()
        assert 0.05 < acc <= 1.0, (prior, acc)


def test_fused_kernel_geweke_invariance():
    """Joint-distribution (Geweke) invariance of the fused-kernel transition:
    the strongest correctness check — two independent finite chains comparing
    logliks is NOT valid (NMF posteriors have sticky non-permutation modes),
    but a successive-conditional chain started from the prior must stay
    exactly in the joint at every step."""
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    import test_geweke as tg

    C_save, T_save = tg.C, tg.T
    tg.C, tg.T = 24, 120
    try:
        spec = ModelSpec(K=tg.K, N=tg.N, G=tg.G, likelihood="poisson",
                         prior="exponential", MH=True, fused_sweeps=True)
        hp = tg.fixed_hp(spec)
        succ = tg.run_successive(spec, hp)
        marg = tg.run_marginal(spec, hp, n=2048)
        m_s, m_m = succ.mean(0), marg.mean(0)
        se = np.sqrt(succ.std(0, ddof=1) ** 2 / len(succ)
                     + marg.std(0, ddof=1) ** 2 / len(marg))
        z = (m_s - m_m) / se
        assert np.all(np.abs(z) < 6.0), z
    finally:
        tg.C, tg.T = C_save, T_save
