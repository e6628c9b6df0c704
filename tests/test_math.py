"""Golden tests of the math core against hand computations / scipy."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from bayesnmf_tpu.ops import math as m


@pytest.fixture
def toy():
    rng = np.random.default_rng(0)
    K, N, G = 5, 3, 7
    P = rng.gamma(2.0, 1.0, (K, N)).astype(np.float32)
    E = rng.gamma(2.0, 2.0, (N, G)).astype(np.float32)
    A = np.array([1.0, 0.0, 1.0], np.float32)
    M = rng.poisson(P @ np.diag(A) @ E + 1.0).astype(np.float32)
    return M, P, A, E


def test_mhat_matches_dense(toy):
    M, P, A, E = toy
    got = np.asarray(m.mhat(jnp.array(P), jnp.array(A), jnp.array(E)))
    want = P @ np.diag(A) @ E
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mhat_single_signature():
    # N == 1 special case (utils.R:36-40)
    P = jnp.ones((4, 1))
    E = jnp.full((1, 3), 2.0)
    A = jnp.ones((1,))
    np.testing.assert_allclose(np.asarray(m.mhat(P, A, E)), 2.0 * np.ones((4, 3)))


def test_poisson_loglik_matches_scipy(toy):
    M, P, A, E = toy
    Mh = P @ np.diag(A) @ E
    got = np.asarray(m.poisson_loglik_mat(jnp.array(M), jnp.array(Mh)))
    want = st.poisson.logpmf(M, np.maximum(Mh, 1e-6))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_poisson_loglik_clips_zero_mhat():
    # Mhat=0 must be clipped to 1e-6 (utils.R:100) so the result is finite
    got = np.asarray(m.poisson_loglik_mat(jnp.array([[3.0]]), jnp.array([[0.0]])))
    want = st.poisson.logpmf(3, 1e-6)
    np.testing.assert_allclose(got[0, 0], want, rtol=1e-4)
    got0 = np.asarray(m.poisson_loglik_mat(jnp.array([[0.0]]), jnp.array([[0.0]])))
    assert np.isfinite(got0).all() and abs(got0[0, 0]) < 1e-5


def test_normal_loglik_matches_scipy(toy):
    M, P, A, E = toy
    Mh = P @ np.diag(A) @ E
    sigmasq = np.linspace(0.5, 2.0, M.shape[1]).astype(np.float32)
    got = np.asarray(
        m.normal_loglik_mat(jnp.array(M), jnp.array(Mh), jnp.array(sigmasq))
    )
    want = st.norm.logpdf(M, Mh, np.sqrt(sigmasq)[None, :])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_truncnorm_logpdf_matches_scipy():
    x = np.array([0.1, 1.0, 3.0], np.float32)
    mu = np.array([0.5, -1.0, 2.0], np.float32)
    sq = np.array([1.0, 0.25, 4.0], np.float32)
    got = np.asarray(m.truncnorm_logpdf(jnp.array(x), jnp.array(mu), jnp.array(sq)))
    sd = np.sqrt(sq)
    want = st.truncnorm.logpdf(x, -mu / sd, np.inf, loc=mu, scale=sd)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_truncnorm_logpdf_negative_x_is_neg_inf():
    got = m.truncnorm_logpdf(jnp.array(-0.5), jnp.array(0.0), jnp.array(1.0))
    assert np.isneginf(np.asarray(got))


def test_gamma_exponential_logpdfs():
    x = np.array([0.5, 2.0], np.float32)
    np.testing.assert_allclose(
        np.asarray(m.exponential_logpdf(jnp.array(x), jnp.array(1.5))),
        st.expon.logpdf(x, scale=1 / 1.5),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(m.gamma_logpdf(jnp.array(x), jnp.array(2.0), jnp.array(3.0))),
        st.gamma.logpdf(x, 2.0, scale=1 / 3.0),
        rtol=1e-4,
    )


def test_metrics(toy):
    M, P, A, E = toy
    Mh = P @ np.diag(A) @ E
    np.testing.assert_allclose(
        np.asarray(m.rmse(jnp.array(M), jnp.array(Mh))),
        np.sqrt(np.mean((Mh - M) ** 2)),
        rtol=1e-5,
    )
    want_kl = np.sum(
        np.maximum(M, 1e-6) * np.log(np.maximum(M, 1e-6) / np.maximum(Mh, 1e-6))
    )
    np.testing.assert_allclose(
        np.asarray(m.padded_kl(jnp.array(Mh), jnp.array(M))), want_kl, rtol=1e-4
    )
    K, G = M.shape
    npar = np.asarray(m.n_params_of(jnp.array(A), K, G))
    assert npar == 2 * (G + K)
    np.testing.assert_allclose(
        np.asarray(m.bic(jnp.float32(-100.0), npar, G)),
        200.0 + npar * np.log(G),
        rtol=1e-6,
    )


def test_renormalize_preserves_product(toy):
    M, P, A, E = toy
    P2, E2 = m.renormalize(jnp.array(P), jnp.array(E))
    np.testing.assert_allclose(np.asarray(jnp.sum(P2, axis=0)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(P2 @ E2), P @ E, rtol=1e-4
    )


def test_logsumexp2():
    a, b = jnp.float32(-1000.0), jnp.float32(-1001.0)
    got = np.asarray(m.logsumexp2(a, b))
    want = np.logaddexp(-1000.0, -1001.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
