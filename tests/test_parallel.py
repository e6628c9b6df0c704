"""Multi-chain ensembles + mesh sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from bayesnmf_tpu.config import ConvergenceControl, ModelSpec, default_hyperprior_params
from bayesnmf_tpu.parallel import chains as C
from bayesnmf_tpu.parallel import mesh as M
from bayesnmf_tpu.parallel.ensemble import ChainEnsemble


def sim(seed=0, K=12, N=3, G=16, scale=80.0):
    rng = np.random.default_rng(seed)
    P = rng.dirichlet(np.ones(K) * 0.5, N).T * scale
    E = rng.gamma(2.0, 2.0, (N, G))
    return rng.poisson(P @ E).astype(np.float32), P


def test_vmapped_chains_differ_and_are_finite():
    Mdat, _ = sim()
    spec = ModelSpec(K=12, N=3, G=16, likelihood="poisson",
                     prior="exponential", MH=False)
    hp = default_hyperprior_params(spec, float(Mdat.mean()))
    data = jnp.asarray(Mdat)
    states = C.init_chain_states(spec, hp, data, jax.random.PRNGKey(0), 4)
    temps = jnp.ones(5, jnp.float32)
    acc = jnp.zeros(4, bool)
    states, samples = C.run_chunk_chains(spec, data, hp, states, temps, acc)
    P = np.asarray(samples["P"])
    assert P.shape == (4, 5, 12, 3)
    assert np.isfinite(P).all()
    # chains evolve independently (different RNG streams)
    assert not np.allclose(P[0], P[1])


def test_sharded_chain_runner_on_mesh():
    Mdat, _ = sim(G=16)
    spec = ModelSpec(K=12, N=3, G=16, likelihood="poisson",
                     prior="truncnormal", MH=True)
    hp = default_hyperprior_params(spec, float(Mdat.mean()))
    mesh = M.make_mesh(n_chain=4, n_g=2)
    init_fn, run_fn = C.make_sharded_chain_runner(spec, mesh, 8)
    data = jnp.asarray(Mdat)
    states = init_fn(hp, data, jax.random.PRNGKey(1))
    # E is sharded over the g axis of the mesh
    e_shard = states["params"]["E"].sharding
    assert e_shard.spec == jax.sharding.PartitionSpec("chain", None, "g")
    temps = jnp.ones(4, jnp.float32)
    acc = jnp.ones(8, bool)
    states, samples = run_fn(data, hp, states, temps, acc)
    met = np.asarray(samples["metrics"])
    assert met.shape[0] == 8 and np.isfinite(met[..., 1:5]).all()


def test_chain_ensemble_end_to_end():
    Mdat, P_true = sim(seed=3)
    cc = ConvergenceControl(MAP_over=20, MAP_every=10, miniters=20,
                            maxiters=80, Ninarow_nochange=2, Ninarow_nobest=3)
    ens = ChainEnsemble(Mdat, 3, n_chains=4, likelihood="poisson",
                        prior="exponential", MH=False,
                        convergence_control=cc, seed=0)
    ens.run()
    assert all(t.converged for t in ens.trackers)
    assert all(m_ is not None for m_ in ens.MAP_per_chain)
    assert ens.throughput() > 0
    # each chain recovers a 3-column MAP
    for m_ in ens.MAP_per_chain:
        assert np.asarray(m_["P"]).shape[0] == 12


def test_chain_ensemble_on_mesh():
    Mdat, _ = sim(seed=4, G=16)
    cc = ConvergenceControl(MAP_over=20, MAP_every=10, miniters=20,
                            maxiters=60, Ninarow_nochange=2, Ninarow_nobest=3)
    mesh = M.make_mesh(n_chain=4, n_g=2)
    ens = ChainEnsemble(Mdat, 3, n_chains=8, likelihood="poisson",
                        prior="truncnormal", MH=True, post_warmup=20,
                        convergence_control=cc, mesh=mesh, seed=1)
    ens.run()
    assert (ens.learned_ranks >= 0).all()


def test_multihost_single_process_paths():
    from bayesnmf_tpu.parallel import multihost as MH

    # off-cluster initialize is a no-op
    assert MH.initialize() is False
    assert MH.n_hosts() == 1

    # single-host global mesh == local mesh layout
    mesh = MH.global_mesh(4, 2)
    assert mesh.shape == {"chain": 4, "g": 2}

    import pytest
    with pytest.raises(ValueError):
        MH.global_mesh(3, 2)  # 6 != 8 devices

    # G-sharded data placement + a sharded ensemble chunk on that mesh
    Mdat, _ = sim(G=16)
    data = MH.shard_data(Mdat, mesh)
    assert data.shape == (12, 16)
    np.testing.assert_allclose(np.asarray(data), Mdat)
    spec = ModelSpec(K=12, N=3, G=16, likelihood="poisson",
                     prior="truncnormal", MH=True)
    hp = default_hyperprior_params(spec, float(Mdat.mean()))
    init, run = C.make_sharded_chain_runner(spec, mesh, n_chains=4)
    states = init(hp, data, jax.random.PRNGKey(0))
    temps = jnp.ones(3, jnp.float32)
    states, samples = run(data, hp, states, temps, jnp.zeros(4, bool))
    assert np.isfinite(np.asarray(samples["metrics"])).all()
