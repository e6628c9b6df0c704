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


def test_stream_sweeps_auto_selection_policy():
    """Pin the measured-best ensemble default: streaming sweeps turn on for
    large-G poisson+MH ensembles on TPU and nowhere else."""
    from bayesnmf_tpu.parallel.ensemble import _auto_stream_sweeps

    on = dict(likelihood="poisson", prior="truncnormal", MH=True, mesh=None,
              fused_sweeps=False, G=25000, platform="tpu")
    assert _auto_stream_sweeps(**on)
    assert _auto_stream_sweeps(**{**on, "prior": "exponential"})
    assert not _auto_stream_sweeps(**{**on, "G": 500})
    assert not _auto_stream_sweeps(**{**on, "platform": "cpu"})
    assert not _auto_stream_sweeps(**{**on, "mesh": object()})
    assert not _auto_stream_sweeps(**{**on, "MH": False})
    assert not _auto_stream_sweeps(**{**on, "fused_sweeps": True})

    # spec-level guards
    import pytest as _pytest

    from bayesnmf_tpu.config import ModelError, ModelSpec

    with _pytest.raises(ModelError):
        ModelSpec(K=8, N=2, G=16, likelihood="poisson", prior="gamma",
                  MH=False, stream_sweeps=True)
    with _pytest.raises(ModelError):
        ModelSpec(K=8, N=2, G=16, likelihood="poisson", prior="truncnormal",
                  MH=True, stream_sweeps=True, fused_sweeps=True)


def test_chain_ensemble_runs_on_stream_path():
    """End-to-end ensemble on the streaming path (explicit opt-in at small G
    — CPU interpret mode)."""
    from bayesnmf_tpu.config import ConvergenceControl
    from bayesnmf_tpu.parallel.ensemble import ChainEnsemble

    rng = np.random.default_rng(5)
    P = rng.dirichlet(np.ones(16) * 0.5, 3).T * 40
    E = rng.gamma(2.0, 2.0, (3, 20))
    M = rng.poisson(P @ E).astype(np.float32)
    cc = ConvergenceControl(MAP_over=20, MAP_every=10, miniters=20,
                            maxiters=40, Ninarow_nochange=2, Ninarow_nobest=3)
    ens = ChainEnsemble(M, 3, n_chains=3, likelihood="poisson",
                        prior="truncnormal", MH=True, convergence_control=cc,
                        post_warmup=10, seed=0, stream_sweeps=True)
    ens.run()
    assert all(m_ is not None for m_ in ens.MAP_per_chain)
    met = ens._metrics_all()
    assert np.isfinite(met[np.isfinite(met[..., 0])][:, 3]).all()


def test_stream_metrics_rows_match_xla_chunk():
    """Full-chunk equivalence incl. the streaming metrics kernel: the same
    keys drive both paths, so every metrics column must agree to
    reduction-order tolerance (the stream path never materializes Mhat;
    its loglik/KL/RMSE come from ops/pallas_stream_sweeps.chain_metrics)."""
    from bayesnmf_tpu.parallel import chains as CH

    rng = np.random.default_rng(2)
    K, N, G, C = 16, 3, 150, 3
    P = rng.dirichlet(np.ones(K) * 0.5, N).T * 40
    E = rng.gamma(2.0, 2.0, (N, G))
    data = jnp.asarray(rng.poisson(P @ E).astype(np.float32))
    rows = {}
    for stream in (False, True):
        spec = ModelSpec(K=K, N=N, G=G, likelihood="poisson",
                         prior="truncnormal", MH=True, stream_sweeps=stream)
        hp = default_hyperprior_params(spec, float(np.asarray(data).mean()))
        states = CH.init_chain_states(spec, hp, data, jax.random.PRNGKey(3),
                                      C)
        temps = jnp.ones((5,), jnp.float32)
        acc = jnp.zeros((C,), bool)
        _, samples = CH.run_chunk_chains(spec, data, hp, states, temps, acc)
        rows[stream] = np.asarray(samples["metrics"])
    np.testing.assert_allclose(rows[True], rows[False], rtol=5e-4, atol=5e-4)


def test_stream_sweep_A_matches_xla():
    """Inclusion-sweep equivalence at matched keys: the streamed per-column
    loglik delta must reproduce sweep_A's decisions (same key structure,
    same penalty/tempering/fallback math)."""
    for rm in ("SBFI", "BFI"):
        spec, data, state = _setup(G=150)
        spec = ModelSpec(K=spec.K, N=spec.N, G=spec.G, likelihood="poisson",
                         prior="truncnormal", MH=True, learning_rank=True,
                         rank_method=rm)
        hp = default_hyperprior_params(spec, float(np.asarray(data).mean()))
        st = gibbs.init_state(spec, hp, data, jax.random.PRNGKey(1))
        params = st["params"]
        key = jax.random.PRNGKey(21)
        R = jnp.int32(2)
        Mh = m.mhat(params["P"], params["A"], params["E"])
        A1, _, nn1 = U.sweep_A(spec, data, params, R, Mh, jnp.float32(0.7),
                               key)
        A2, nn2 = U.stream_sweep_A(spec, data, params, R, jnp.float32(0.7),
                                   key)
        np.testing.assert_array_equal(np.asarray(A1), np.asarray(A2)), rm
        assert float(nn1) == float(nn2)


def test_stream_sbfi_chunk_runs_and_matches():
    """Full SBFI chunk on the stream path matches the XLA path draw-for-draw
    (rank trace, metrics) — the BASELINE config-5 family (SBFI at large G)
    is stream-capable end to end."""
    from bayesnmf_tpu.parallel import chains as CH

    rng = np.random.default_rng(4)
    K, N, G, C = 16, 4, 140, 2
    P = rng.dirichlet(np.ones(K) * 0.5, 2).T * 40
    E = rng.gamma(2.0, 2.0, (2, G))
    data = jnp.asarray(rng.poisson(P @ E).astype(np.float32))
    rows = {}
    for stream in (False, True):
        spec = ModelSpec(K=K, N=N, G=G, likelihood="poisson",
                         prior="truncnormal", MH=True, learning_rank=True,
                         rank_method="SBFI", stream_sweeps=stream)
        hp = default_hyperprior_params(spec, float(np.asarray(data).mean()))
        states = CH.init_chain_states(spec, hp, data, jax.random.PRNGKey(6),
                                      C)
        temps = jnp.asarray(gibbs.temp_schedule(6, 3))
        acc = jnp.ones((C,), bool)
        _, samples = CH.run_chunk_chains(spec, data, hp, states, temps, acc)
        rows[stream] = np.asarray(samples["metrics"])
    # identical rank decisions; metric values match to reduction tolerance
    np.testing.assert_array_equal(rows[True][..., 7], rows[False][..., 7])
    np.testing.assert_allclose(rows[True][..., 1:5], rows[False][..., 1:5],
                               rtol=5e-4, atol=5e-4)


def test_stream_path_full_history_resume_compaction(tmp_path):
    """Seam coverage: the streaming path composed with record_history='full',
    mid-run checkpoint/resume (bit-exact), and live-chain compaction — the
    kind of untested combination that produced round 4's mesh+full crash."""
    from bayesnmf_tpu.config import ConvergenceControl
    from bayesnmf_tpu.parallel.ensemble import ChainEnsemble

    rng = np.random.default_rng(8)
    P = rng.dirichlet(np.ones(16) * 0.5, 3).T * 40
    E = rng.gamma(2.0, 2.0, (3, 24))
    M = rng.poisson(P @ E).astype(np.float32)
    cc = ConvergenceControl(MAP_over=20, MAP_every=10, miniters=40,
                            maxiters=40, Ninarow_nochange=99,
                            Ninarow_nobest=99)
    kw = dict(likelihood="poisson", prior="truncnormal", MH=True,
              convergence_control=cc, post_warmup=10, seed=2,
              output_dir=None, stream_sweeps=True, record_history="full",
              save_all_samples=True)
    e1 = ChainEnsemble(M, 3, n_chains=3, **kw)
    e1.run()
    s = e1.chain(0).samples
    for k in ("P", "E", "A", "Mu_p", "acc_P", "acc_E"):
        assert k in s, k

    e2 = ChainEnsemble(M, 3, n_chains=3, **kw)
    e2._run_chunk(19)
    path = str(tmp_path / "stream_ens.ckpt")
    e2.save_object(path)
    e3 = ChainEnsemble.load(path)
    assert e3.spec.stream_sweeps
    e3.run()
    # bit-exact resume: device states carry the RNG keys
    np.testing.assert_array_equal(
        np.asarray(e1.states["params"]["P"]),
        np.asarray(e3.states["params"]["P"]))
    # the resumed run kept archiving: full history covers the whole run
    assert e3.chain(1)._archive is not None
