"""Distribution-level tests of the sampler primitives (moment checks + KS)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from bayesnmf_tpu.ops import distributions as d


def key(i=0):
    return jax.random.PRNGKey(i)


def test_truncnorm_nonneg_moments():
    mu, sq = 1.5, 0.49
    x = np.asarray(d.truncnorm_nonneg(key(1), jnp.float32(mu), jnp.float32(sq), (200_000,)))
    assert (x >= 0).all()
    sd = np.sqrt(sq)
    ref = st.truncnorm(-mu / sd, np.inf, loc=mu, scale=sd)
    np.testing.assert_allclose(x.mean(), ref.mean(), rtol=5e-3)
    np.testing.assert_allclose(x.std(), ref.std(), rtol=2e-2)


def test_truncnorm_nonneg_deep_tail():
    # mean far below 0: sampling from the positive tail must stay finite
    mu, sq = -8.0, 1.0
    x = np.asarray(d.truncnorm_nonneg(key(2), jnp.float32(mu), jnp.float32(sq), (50_000,)))
    assert np.isfinite(x).all() and (x >= 0).all()
    sd = 1.0
    ref = st.truncnorm(-mu / sd, np.inf, loc=mu, scale=sd)
    np.testing.assert_allclose(x.mean(), ref.mean(), rtol=5e-2, atol=5e-3)


def test_truncnorm_ks():
    mu, sq = 0.3, 2.0
    x = np.asarray(d.truncnorm_nonneg(key(3), jnp.float32(mu), jnp.float32(sq), (20_000,)))
    sd = np.sqrt(sq)
    stat, p = st.kstest(x, st.truncnorm(-mu / sd, np.inf, loc=mu, scale=sd).cdf)
    assert p > 1e-3, (stat, p)


def test_gamma_and_invgamma_moments():
    a, b = 3.0, 2.0
    g = np.asarray(d.gamma(key(4), jnp.float32(a), jnp.float32(b), (200_000,)))
    np.testing.assert_allclose(g.mean(), a / b, rtol=1e-2)
    ig = np.asarray(d.inv_gamma(key(5), jnp.float32(a), jnp.float32(b), (200_000,)))
    np.testing.assert_allclose(ig.mean(), b / (a - 1), rtol=2e-2)


def test_gamma_ks_all_regimes():
    """The Marsaglia-Tsang sampler (pre-drawn candidate rounds + while_loop
    fallback) is exact across the boost (a<1), small-a, and large-a regimes."""
    for i, a in enumerate((0.4, 1.0, 2.5, 40.0)):
        g = np.asarray(d.gamma(key(40 + i), jnp.float32(a), jnp.float32(1.5),
                               (30_000,)))
        assert np.isfinite(g).all() and (g > 0).all()
        stat, p = st.kstest(g, st.gamma(a, scale=1.0 / 1.5).cdf)
        assert p > 1e-3, (a, stat, p)
    # heterogeneous shapes in one call (the conjugate-update usage pattern)
    shapes = jnp.asarray([0.5, 1.0, 7.0, 120.0], jnp.float32)
    g = np.asarray(d.gamma(key(50), shapes[None, :], jnp.float32(1.0),
                           (50_000, 4)))
    np.testing.assert_allclose(g.mean(axis=0), np.asarray(shapes), rtol=3e-2)


def test_exponential_moments():
    x = np.asarray(d.exponential(key(6), jnp.float32(2.5), (100_000,)))
    np.testing.assert_allclose(x.mean(), 1 / 2.5, rtol=2e-2)


def test_slice_sampler_targets_gamma():
    # Target Gamma(shape=4, rate=2) via its log-pdf; run a chain of slice
    # transitions over many parallel lanes; pooled samples should match.
    shape_, rate_ = 4.0, 2.0

    def logpdf(x, a, b):
        return (a - 1.0) * jnp.log(x) - b * x

    n_lanes = 4096
    x = jnp.full((n_lanes,), 1.0, jnp.float32)
    k = key(7)
    for i in range(60):
        k, sub = jax.random.split(k)
        x = d.slice_sample_logconcave(
            sub, x, (jnp.float32(shape_), jnp.float32(rate_)), logpdf,
            lower=1e-4, upper=100.0,
        )
    xs = np.asarray(x)
    ref = st.gamma(shape_, scale=1 / rate_)
    np.testing.assert_allclose(xs.mean(), ref.mean(), rtol=5e-2)
    np.testing.assert_allclose(xs.std(), ref.std(), rtol=1e-1)
    stat, p = st.kstest(xs, ref.cdf)
    assert p > 1e-4, (stat, p)


def test_gamma_shape_cond_logpdf_finite():
    x = jnp.linspace(1e-3, 100.0, 50)
    lp = d.gamma_shape_cond_logpdf(
        x, jnp.float32(5.0), jnp.float32(1.0), jnp.log(2.0), jnp.log(0.5)
    )
    assert np.isfinite(np.asarray(lp)).all()


def test_binomial_moments_and_gof():
    """ops.distributions.binomial (BTRS + bounded inversion): moments and
    chi-square goodness of fit across both regimes and the p>1/2 flip."""
    from scipy import stats

    from bayesnmf_tpu.ops import distributions as D

    S = 60000
    for i, (n0, p0) in enumerate([(5, 0.3), (40, 0.15), (120, 0.4),
                                  (120, 0.97)]):
        x = np.asarray(jax.jit(D.binomial)(
            jax.random.PRNGKey(100 + i),
            jnp.full((S,), float(n0)), jnp.full((S,), p0)))
        assert x.min() >= 0 and x.max() <= n0
        sd_mean = np.sqrt(n0 * p0 * (1 - p0) / S)
        assert abs(x.mean() - n0 * p0) < 5 * sd_mean, (n0, p0, x.mean())
        xi = x.astype(int)
        lo = max(0, int(n0 * p0 - 6 * np.sqrt(n0 * p0 * (1 - p0))))
        hi = min(n0, int(n0 * p0 + 6 * np.sqrt(n0 * p0 * (1 - p0))))
        ks = np.arange(lo, hi + 1)
        obs = np.array([(xi == k).sum() for k in ks], float)
        exp = stats.binom.pmf(ks, n0, p0) * S
        mask = exp > 5
        chi2 = ((obs[mask] - exp[mask]) ** 2 / exp[mask]).sum()
        pval = 1 - stats.chi2.cdf(chi2, mask.sum() - 1)
        assert pval > 1e-4, (n0, p0, pval)


def test_binomial_degenerate_edges():
    from bayesnmf_tpu.ops import distributions as D

    key = jax.random.PRNGKey(0)
    n = jnp.asarray([0.0, 7.0, 7.0, 3.0])
    p = jnp.asarray([0.3, 0.0, 1.0, 0.5])
    x = np.asarray(jax.jit(D.binomial)(key, n, p))
    assert x[0] == 0.0 and x[1] == 0.0 and x[2] == 7.0
    assert 0.0 <= x[3] <= 3.0


def test_gamma_nonfinite_shape_returns_nan_not_deadlock():
    """A non-finite (or <= 0) shape parameter must yield NaN, not spin the
    exact-fallback while_loop forever: gamma shapes include sampled
    quantities (a + Alpha_p), so a transient overflow has to surface as an
    observable NaN (NA_events) rather than hang the device program."""
    from bayesnmf_tpu.ops import distributions as D

    key = jax.random.PRNGKey(3)
    a = jnp.asarray([2.0, np.nan, np.inf, 0.0, -1.0, 5.0])
    out = np.asarray(jax.jit(D.gamma)(key, a, 1.0))
    assert np.isfinite(out[0]) and out[0] > 0
    assert np.isfinite(out[5]) and out[5] > 0
    assert np.isnan(out[1]) and np.isnan(out[2])
    # a = 0 degenerates to the point mass at 0 via the boost multiplier
    assert np.isnan(out[3]) or out[3] == 0.0
    assert np.isnan(out[4]) or out[4] == 0.0


def test_binomial_nonfinite_inputs_do_not_deadlock():
    from bayesnmf_tpu.ops import distributions as D

    key = jax.random.PRNGKey(4)
    n = jnp.asarray([np.nan, 50.0, 1e4])
    p = jnp.asarray([0.4, np.nan, 0.4])
    x = np.asarray(jax.jit(D.binomial)(key, n, p))  # must return, not hang
    assert np.isfinite(x[2])
