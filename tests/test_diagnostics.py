"""Cross-chain convergence diagnostics (split-R̂ / ESS, Vehtari et al. 2021).

Ground truths used:
  * iid draws: R̂ ≈ 1, ESS ≈ n_chains·n_draws.
  * a mean-shifted chain: R̂ well above the 1.01 mixing threshold.
  * AR(1) with coefficient φ: ESS/N → (1−φ)/(1+φ).
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesnmf_tpu.parallel import diagnostics as D


def test_iid_chains_rhat_near_one():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 512))
    r = float(D.rhat(x))
    assert 0.99 < r < 1.02
    assert float(D.split_rhat(x)) < 1.02


def test_iid_chains_ess_near_total():
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 1024))
    total = 8 * 1024
    eb = float(D.ess_bulk(x))
    et = float(D.ess_tail(x))
    assert 0.5 * total < eb < 1.6 * total
    assert 0.3 * total < et < 1.6 * total


def test_shifted_chain_detected():
    x = np.array(jax.random.normal(jax.random.PRNGKey(2), (4, 400)))
    x[0] += 5.0  # one chain stuck in a different mode
    assert float(D.rhat(jnp.asarray(x))) > 1.2


def test_ar1_ess_matches_theory():
    phi = 0.9
    rng = np.random.default_rng(3)
    C, T = 8, 4096
    x = np.zeros((C, T), np.float64)
    innov = rng.normal(0.0, np.sqrt(1 - phi**2), (C, T))
    for t in range(1, T):
        x[:, t] = phi * x[:, t - 1] + innov[:, t]
    expected = C * T * (1 - phi) / (1 + phi)  # ≈ 1725
    got = float(D.ess(jnp.asarray(x, jnp.float32)))
    assert 0.5 * expected < got < 2.0 * expected


def test_rank_normalize_shape_and_monotone():
    x = jax.random.exponential(jax.random.PRNGKey(4), (4, 64, 3))
    z = D.rank_normalize(x)
    assert z.shape == x.shape
    # strictly monotone transform: orderings preserved per trailing element
    xf = np.asarray(x).reshape(-1, 3)
    zf = np.asarray(z).reshape(-1, 3)
    for j in range(3):
        assert (np.argsort(xf[:, j]) == np.argsort(zf[:, j])).all()
    # roughly standard normal
    assert abs(float(z.mean())) < 0.05
    assert 0.8 < float(z.std()) < 1.1


def test_batched_trailing_axes():
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 256, 2, 3))
    r = D.rhat(x)
    assert r.shape == (2, 3)
    assert np.all(np.asarray(r) < 1.1)
    e = D.ess_bulk(x)
    assert e.shape == (2, 3)


def test_ensemble_diagnostics_report():
    from bayesnmf_tpu.config import ConvergenceControl
    from bayesnmf_tpu.parallel.ensemble import ChainEnsemble

    rng = np.random.default_rng(0)
    P = rng.dirichlet(np.ones(12) * 0.5, 3).T * 80.0
    E = rng.gamma(2.0, 2.0, (3, 16))
    Mdat = rng.poisson(P @ E).astype(np.float32)
    cc = ConvergenceControl(MAP_over=20, MAP_every=10, miniters=20,
                            maxiters=60, Ninarow_nochange=2, Ninarow_nobest=3)
    ens = ChainEnsemble(Mdat, 3, n_chains=4, likelihood="poisson",
                        prior="exponential", MH=False,
                        convergence_control=cc, seed=0)
    ens.run()
    df = D.ensemble_diagnostics(ens, n_draws=40)
    assert set(df["metric"]) == {"logposterior", "loglikelihood", "RMSE", "rank"}
    assert np.isfinite(df["rhat"]).all()
    assert (df["ess_bulk"] > 0).all()
    # fixed rank → the rank trace is constant → flagged, R̂ defined as 1
    row = df[df["metric"] == "rank"].iloc[0]
    assert row["constant"] and row["rhat"] == 1.0
    # the convenience method defaults the window to MAP_over
    df2 = ens.diagnostics()
    assert set(df2["metric"]) == set(df["metric"])
    assert np.isfinite(df2["rhat"]).all()
