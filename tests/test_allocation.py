"""Tests of the fused multinomial latent-count allocation."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesnmf_tpu.ops.allocation import allocate_counts


def setup(seed=0, K=6, N=4, G=8):
    rng = np.random.default_rng(seed)
    P = rng.gamma(2.0, 1.0, (K, N)).astype(np.float32)
    E = rng.gamma(2.0, 2.0, (N, G)).astype(np.float32)
    A = np.ones(N, np.float32)
    M = rng.poisson(P @ E).astype(np.float32)
    return M, P, A, E


def test_sums_conserve_counts():
    M, P, A, E = setup()
    Zg, Zk = allocate_counts(jax.random.PRNGKey(0), jnp.array(M), jnp.array(P),
                             jnp.array(A), jnp.array(E))
    Zg, Zk = np.asarray(Zg), np.asarray(Zk)
    total = M.sum()
    np.testing.assert_allclose(Zg.sum(), total, rtol=1e-6)
    np.testing.assert_allclose(Zk.sum(), total, rtol=1e-6)
    assert (Zg >= 0).all() and (Zk >= 0).all()


def test_excluded_component_gets_zero():
    M, P, A, E = setup()
    A[1] = 0.0
    Zg, Zk = allocate_counts(jax.random.PRNGKey(1), jnp.array(M), jnp.array(P),
                             jnp.array(A), jnp.array(E))
    assert np.asarray(Zg)[:, 1].sum() == 0
    assert np.asarray(Zk)[1, :].sum() == 0


def test_all_excluded_returns_zeros():
    M, P, A, E = setup()
    A[:] = 0.0
    Zg, Zk = allocate_counts(jax.random.PRNGKey(2), jnp.array(M), jnp.array(P),
                             jnp.array(A), jnp.array(E))
    assert np.asarray(Zg).sum() == 0 and np.asarray(Zk).sum() == 0


def test_marginal_means_match_multinomial():
    # E[Z_n sums] = sum over cells of M * p_n
    M, P, A, E = setup(3, K=4, N=3, G=5)
    M = M * 0 + 50.0  # fixed counts for tighter means
    W = np.einsum("kn,ng->kng", P, E)
    probs = W / W.sum(1, keepdims=True)
    want_Zg = np.einsum("kg,kng->kn", M, probs)

    reps = 300
    keys = jax.random.split(jax.random.PRNGKey(3), reps)
    f = jax.jit(lambda k: allocate_counts(k, jnp.array(M), jnp.array(P),
                                          jnp.array(A), jnp.array(E)))
    acc = np.zeros_like(want_Zg)
    for k in keys:
        Zg, _ = f(k)
        acc += np.asarray(Zg)
    got = acc / reps
    np.testing.assert_allclose(got, want_Zg, rtol=5e-2, atol=1.5)


def test_binomial_chain_variance_sane():
    # per-component variance should match multinomial variance n p (1-p)
    rng = np.random.default_rng(5)
    K, N, G = 1, 3, 1
    P = np.array([[0.2, 0.5, 0.3]], np.float32)
    E = np.ones((N, 1), np.float32)
    A = np.ones(N, np.float32)
    M = np.full((1, 1), 100.0, np.float32)
    reps = 2000
    keys = jax.random.split(jax.random.PRNGKey(6), reps)
    f = jax.jit(lambda k: allocate_counts(k, jnp.array(M), jnp.array(P),
                                          jnp.array(A), jnp.array(E)))
    samples = np.stack([np.asarray(f(k)[0])[0] for k in keys])  # (reps, N)
    p = np.array([0.2, 0.5, 0.3])
    np.testing.assert_allclose(samples.mean(0), 100 * p, rtol=3e-2)
    np.testing.assert_allclose(samples.var(0), 100 * p * (1 - p), rtol=1.5e-1)


def test_fused_allocation_kernel_matches_multinomial():
    """The Pallas allocation kernel (interpret mode, uniform-operand path)
    conserves counts, zeroes excluded components, and matches the exact
    multinomial mean within Monte-Carlo error."""
    from bayesnmf_tpu.ops.pallas_allocation import allocate_counts_fused

    rng = np.random.default_rng(0)
    K, N, G = 16, 5, 40
    P = rng.gamma(2.0, 1.0, (K, N)).astype(np.float32)
    E = rng.gamma(2.0, 1.0, (N, G)).astype(np.float32)
    A = np.ones(N, np.float32)
    A[3] = 0.0
    M = rng.poisson(30.0, (K, G)).astype(np.float32)
    M[0, 0] = 0.0

    zg, zk = allocate_counts_fused(
        jax.random.PRNGKey(1), jnp.asarray(M), jnp.asarray(P),
        jnp.asarray(A), jnp.asarray(E))
    zg, zk = np.asarray(zg), np.asarray(zk)
    assert np.allclose(zk.sum(0), M.sum(0))
    assert np.allclose(zg.sum(1), M.sum(1))
    assert zg[:, 3].sum() == 0 and zk[3].sum() == 0
    assert np.allclose(zk, np.round(zk))

    S = 120
    zks = np.stack([
        np.asarray(allocate_counts_fused(
            jax.random.PRNGKey(s + 10), jnp.asarray(M), jnp.asarray(P),
            jnp.asarray(A), jnp.asarray(E))[1])
        for s in range(S)])
    W = P[:, :, None] * A[None, :, None] * E[None, :, :]
    probs = W / np.maximum(W.sum(1, keepdims=True), 1e-30)
    expect = (M[:, None, :] * probs).sum(0)
    sd = np.sqrt(np.maximum(
        (M[:, None, :] * probs * (1 - probs)).sum(0), 1e-9) / S)
    assert np.abs(zks.mean(0) - expect).max() < 6 * sd.max()


def test_fused_allocation_in_conjugate_sampler():
    """spec.fused_allocation routes the conjugate Gibbs Z-draw through the
    Pallas kernel; the chain must stay on the same equilibrium as the XLA
    tree path."""
    from bayesnmf_tpu.config import ModelSpec, default_hyperprior_params
    from bayesnmf_tpu.models import gibbs

    rng = np.random.default_rng(1)
    K, N, G = 16, 4, 24
    P = rng.dirichlet(np.ones(K) * 0.5, N).T * 30
    E = rng.gamma(2.0, 2.0, (N, G))
    data = jnp.asarray(rng.poisson(P @ E).astype(np.float32))

    lls = {}
    for fused in (False, True):
        spec = ModelSpec(K=K, N=N, G=G, likelihood="poisson",
                         prior="exponential", MH=False,
                         fused_allocation=fused)
        hp = default_hyperprior_params(spec, float(data.mean()))
        st = gibbs.init_state(spec, hp, data, jax.random.PRNGKey(0))
        temps = jnp.ones((150,), jnp.float32)
        st, samples = gibbs.run_chunk(spec, data, hp, st, temps, False)
        lls[fused] = np.asarray(samples["metrics"][50:, 3])
    # same stationary loglik level (not bitwise: different RNG streams)
    m0, m1 = lls[False].mean(), lls[True].mean()
    s_pool = np.sqrt(lls[False].var() + lls[True].var()) + 1e-9
    assert abs(m0 - m1) < 6 * s_pool, (m0, m1, s_pool)
