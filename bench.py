"""Benchmark: Gibbs iterations/sec on config 2 of BASELINE.json
(96x500 Poisson-TruncNormal+MH, fixed rank K=8, single chain).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against a single-core NumPy re-implementation of the
reference's per-iteration algorithm (same O(N^2*K*G) full-matmul column sweep
and 4 full loglik evaluations per MH update that bayesNMF does in R —
sample_Pn.R:132-248). The R package itself is not installable in this image
(no R runtime; BASELINE.md notes no published numbers exist either), so this
stands in as a faithful, favorable-to-the-reference CPU baseline: NumPy's
BLAS-backed ops are at least as fast as the R equivalents.
"""

import json
import time

import numpy as np

K, N, G = 96, 8, 500
WARM_CHUNK = 50
# Long chunks amortize the per-dispatch host round-trip (which on the axon
# relay is ~30 ms per call — a real-TPU-VM dispatch is ~100x cheaper); one
# host sync per chunk matches how the production scan runner behaves.
BENCH_ITERS = 3000
BASELINE_ITERS = 20


def _sim_data(seed=0):
    rng = np.random.default_rng(seed)
    P = rng.dirichlet(np.ones(K) * 0.5, N).T * 100.0
    E = rng.gamma(2.0, 2.0, (N, G))
    return rng.poisson(P @ E).astype(np.float32)


def bench_tpu(data):
    import jax
    import jax.numpy as jnp

    from bayesnmf_tpu.config import ModelSpec, default_hyperprior_params
    from bayesnmf_tpu.models import gibbs

    # the fused Pallas sweep kernel is the flagship single-chain path
    # (Geweke-validated; ~2.1x over the XLA sweeps at this size)
    spec = ModelSpec(K=K, N=N, G=G, likelihood="poisson", prior="truncnormal",
                     MH=True, fused_sweeps=True)
    hp = default_hyperprior_params(spec, float(data.mean()))
    d = jnp.asarray(data)
    state = gibbs.init_state(spec, hp, d, jax.random.PRNGKey(0))
    bench_temps = jnp.ones((BENCH_ITERS,), jnp.float32)

    def barrier(st):
        # device→host transfer as the completion barrier:
        # block_until_ready on the axon relay backend returns early.
        return float(np.asarray(st["params"]["P"][0, 0]))

    # compile + warmup with the SAME chunk length as the timed run (a
    # different scan length is a different XLA program)
    state, _ = gibbs.run_chunk(spec, d, hp, state, bench_temps, False)
    barrier(state)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        state, samples = gibbs.run_chunk(spec, d, hp, state, bench_temps, False)
        barrier(state)
    dt = (time.perf_counter() - t0) / reps
    return BENCH_ITERS / dt


def bench_reference_numpy(data, iters=20, seed=1):
    """Single-core NumPy mirror of the reference's per-iteration work:
    sequential column sweep with TWO full K×G Mhat recomputations per column
    (sample_Pn.R:136,152) and 4 full loglik matrices per MH acceptance
    (sample_Pn.R:209-239), for both the P and E sweeps."""
    rng = np.random.default_rng(seed)
    M = data.astype(np.float64)
    P = rng.gamma(1.0, 1.0, (K, N))
    E = rng.gamma(1.0, 1.0, (N, G))
    Mu_p, Sq_p = np.zeros((K, N)), np.ones((K, N))
    Mu_e, Sq_e = np.zeros((N, G)), np.ones((N, G))

    def mhat(P, E):
        return P @ E

    def pois_ll(M, lam):
        lam = np.maximum(lam, 1e-6)
        from scipy.special import gammaln

        return M * np.log(lam) - lam - gammaln(M + 1)

    def norm_ll(M, mean, var):
        return -0.5 * (M - mean) ** 2 / var - 0.5 * np.log(2 * np.pi * var)

    t0 = time.perf_counter()
    for _ in range(iters):
        for n in range(N):
            Mh = mhat(P, E)                      # full matmul (as reference)
            sig = Mh.copy()
            Pc = P.copy(); Pc[:, n] = 0
            Mh_no_n = mhat(Pc, E)                # second full matmul
            resid = (M - Mh_no_n) / np.maximum(sig, 1e-6)
            mu1 = resid @ E[n]
            den = (1 / np.maximum(sig, 1e-6)) @ (E[n] ** 2) + 1 / Sq_p[:, n]
            mu = (mu1 + Mu_p[:, n] / Sq_p[:, n]) / den
            prop = np.maximum(mu + rng.normal(size=K) / np.sqrt(den), 0)
            Pp = P.copy(); Pp[:, n] = prop
            Mh_prop = mhat(Pp, E)
            lp_old = pois_ll(M, Mh).sum(1)
            lp_new = pois_ll(M, Mh_prop).sum(1)
            ln_old = norm_ll(M, Mh, np.maximum(Mh_prop, 1)).sum(1)
            ln_new = norm_ll(M, Mh_prop, np.maximum(Mh, 1)).sum(1)
            ratio = np.minimum(np.exp(lp_new + ln_old - lp_old - ln_new), 1)
            acc = rng.random(K) < ratio
            P[acc, n] = prop[acc]
        for n in range(N):
            Mh = mhat(P, E)
            sig = Mh.copy()
            Ec = E.copy(); Ec[n] = 0
            Mh_no_n = mhat(P, Ec)
            resid = (M - Mh_no_n) / np.maximum(sig, 1e-6)
            mu1 = P[:, n] @ resid
            den = (P[:, n] ** 2) @ (1 / np.maximum(sig, 1e-6)) + 1 / Sq_e[n]
            mu = (mu1 + Mu_e[n] / Sq_e[n]) / den
            prop = np.maximum(mu + rng.normal(size=G) / np.sqrt(den), 0)
            Ep = E.copy(); Ep[n] = prop
            Mh_prop = mhat(P, Ep)
            lp_old = pois_ll(M, Mh).sum(0)
            lp_new = pois_ll(M, Mh_prop).sum(0)
            ln_old = norm_ll(M, Mh, np.maximum(Mh_prop, 1)).sum(0)
            ln_new = norm_ll(M, Mh_prop, np.maximum(Mh, 1)).sum(0)
            ratio = np.minimum(np.exp(lp_new + ln_old - lp_old - ln_new), 1)
            acc = rng.random(G) < ratio
            E[n, acc] = prop[acc]
    dt = time.perf_counter() - t0
    return iters / dt


def bench_chains(n_chains: int, iters: int = 100):
    """Multi-chain throughput (chain-iterations/sec) on the local device(s)."""
    import jax
    import jax.numpy as jnp

    from bayesnmf_tpu.config import ModelSpec, default_hyperprior_params
    from bayesnmf_tpu.parallel import chains as C

    data = _sim_data()
    spec = ModelSpec(K=K, N=N, G=G, likelihood="poisson", prior="truncnormal",
                     MH=True)
    hp = default_hyperprior_params(spec, float(data.mean()))
    d = jnp.asarray(data)
    states = C.init_chain_states(spec, hp, d, jax.random.PRNGKey(0), n_chains)
    temps = jnp.ones((iters,), jnp.float32)
    acc = jnp.zeros((n_chains,), bool)
    states, _ = C.run_chunk_chains(spec, d, hp, states, temps, acc)
    float(np.asarray(states["params"]["P"][0, 0, 0]))
    t0 = time.perf_counter()
    states, _ = C.run_chunk_chains(spec, d, hp, states, temps, acc)
    float(np.asarray(states["params"]["P"][0, 0, 0]))
    dt = time.perf_counter() - t0
    return n_chains * iters / dt


def main():
    import sys

    if "--chains" in sys.argv:
        n = int(sys.argv[sys.argv.index("--chains") + 1])
        cips = bench_chains(n)
        print(json.dumps({
            "metric": f"chain_iters_per_sec_{n}chains_96x500_K8_MH",
            "value": round(cips, 2), "unit": "chain-iterations/sec/chip",
            "vs_baseline": None}))
        return
    data = _sim_data()
    tpu_ips = bench_tpu(data)
    base_ips = bench_reference_numpy(data, iters=BASELINE_ITERS)
    print(json.dumps({
        "metric": "gibbs_iters_per_sec_96x500_K8_poisson_truncnormal_MH",
        "value": round(tpu_ips, 2),
        "unit": "iterations/sec/chip",
        "vs_baseline": round(tpu_ips / base_ips, 2),
    }))


if __name__ == "__main__":
    main()
