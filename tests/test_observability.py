"""Tests of the NA-overflow observability + full posterior-history recording
(the analogs of the reference's logged NA ladder, sample_params.R:136-162, and
record_sample's full deep-copy history, bayesNMF_sampler.R:651-672)."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesnmf_tpu.config import ConvergenceControl, ModelSpec, \
    default_hyperprior_params
from bayesnmf_tpu.models import gibbs
from bayesnmf_tpu.models.sampler import GibbsSampler

NA_COL = gibbs.METRIC_NAMES.index("NA_events")


def _small_data(seed=0, K=8, G=12, lam=20.0):
    rng = np.random.default_rng(seed)
    return rng.poisson(lam, (K, G)).astype(np.float32)


def test_na_events_column_zero_on_healthy_run():
    data = jnp.asarray(_small_data())
    spec = ModelSpec(K=8, N=2, G=12, likelihood="poisson", prior="exponential",
                     MH=True)
    hp = default_hyperprior_params(spec, float(np.asarray(data).mean()))
    state = gibbs.init_state(spec, hp, data, jax.random.PRNGKey(0))
    _, samples = gibbs.run_chunk(spec, data, hp, state,
                                 jnp.ones((20,), jnp.float32), False)
    assert np.all(np.asarray(samples["metrics"])[:, NA_COL] == 0.0)


def test_na_events_counts_mh_ratio_overflow():
    """Overflowed Mhat (inf - inf = NaN in the acceptance ratio) must be
    counted in the NA_events metric, not silently clamped."""
    data = jnp.asarray(_small_data())
    spec = ModelSpec(K=8, N=2, G=12, likelihood="poisson", prior="exponential",
                     MH=True)
    hp = default_hyperprior_params(spec, float(np.asarray(data).mean()))
    state = gibbs.init_state(spec, hp, data, jax.random.PRNGKey(0))
    # poison the state: P*E overflows f32 -> Mhat = inf -> d_lam = inf - inf
    state["params"]["P"] = jnp.full((8, 2), 1e30, jnp.float32)
    state["params"]["E"] = jnp.full((2, 12), 1e30, jnp.float32)
    _, sample = gibbs.gibbs_step(spec, data, hp, state, jnp.float32(1.0),
                                 accept_all=False)
    assert float(np.asarray(sample["metrics"])[NA_COL]) > 0


def test_na_events_counts_inclusion_odds_nan():
    """temperature * delta = inf * 0 = NaN in the A-sweep log-odds is counted
    and resolved to p = 1/2 (the reference's overflow fallback ladder)."""
    from bayesnmf_tpu.models import updates as U

    spec = ModelSpec(K=8, N=2, G=12, likelihood="poisson", prior="exponential",
                     MH=True, learning_rank=True, rank_method="BFI")
    data = jnp.asarray(_small_data())
    params = {
        # zero contribution -> delta == 0 exactly -> inf * 0 = NaN
        "P": jnp.zeros((8, 2), jnp.float32),
        "E": jnp.zeros((2, 12), jnp.float32),
        "A": jnp.ones((2,), jnp.float32),
    }
    Mh = jnp.zeros((8, 12), jnp.float32)
    _, _, n_nan = U.sweep_A(spec, data, params, jnp.asarray(1, jnp.int32),
                            Mh, jnp.float32(np.inf), jax.random.PRNGKey(0))
    assert float(n_nan) == 2.0


def test_record_history_full_exposes_reference_names():
    data = _small_data()
    cc = ConvergenceControl(MAP_over=30, MAP_every=7, miniters=10, maxiters=40)
    s = GibbsSampler(data, 2, likelihood="normal", prior="exponential",
                     convergence_control=cc, record_history="full",
                     post_warmup=0, seed=1)
    s.run_gibbs_sampler()
    h = s.samples
    # reference-name parity: samples$Lambda_p / samples$sigmasq
    # (bayesNMF_sampler.R:651-672)
    assert h["sigmasq"].shape == (40, 12)
    assert h["Lambda_p"].shape == (40, 8, 2)
    assert np.isfinite(h["sigmasq"]).all()
    summ = s.posterior_summary("sigmasq")
    assert summ["mean"].shape == (12,)
    assert summ["n_samples"] == 40
    # MAP checks ran every MAP_every from the start (reference behavior,
    # bayesNMF_sampler.R:288-296), with a non-divisible MAP_over/MAP_every
    assert [m["iter"] for m in s.MAP_metrics][:3] == [7, 14, 21]


def test_record_history_full_acceptance_matrices():
    data = _small_data()
    cc = ConvergenceControl(MAP_over=10, MAP_every=5, miniters=5, maxiters=15)
    s = GibbsSampler(data, 2, likelihood="poisson", prior="exponential",
                     MH=True, convergence_control=cc, record_history="full",
                     post_warmup=5, seed=2)
    s.run_gibbs_sampler()
    h = s.samples
    assert h["acc_P"].shape[1:] == (8, 2)
    assert h["acc_E"].shape[1:] == (2, 12)
    assert np.all((h["acc_P"] >= 0) & (h["acc_P"] <= 1))
