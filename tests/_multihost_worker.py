"""Worker for the true 2-process jax.distributed test (see
test_parallel_multiproc.py). Each process owns 2 virtual CPU devices; the
global (chain=2, g=2) mesh spans both processes with the g axis inside one
process (the ICI doctrine of parallel/multihost.py) and the chain axis
data-parallel across processes (the DCN axis)."""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    from bayesnmf_tpu.parallel import multihost as MH

    ok = MH.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
    assert ok, "distributed bootstrap failed"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    from bayesnmf_tpu.config import ModelSpec, default_hyperprior_params
    from bayesnmf_tpu.parallel import chains as C

    mesh = MH.global_mesh(n_chain=2, n_g=2)
    rng = np.random.default_rng(0)
    K, N, G = 8, 2, 8
    P = rng.gamma(2.0, 1.0, (K, N))
    E = rng.gamma(2.0, 1.0, (N, G))
    data_np = rng.poisson(P @ E).astype(np.float32)
    spec = ModelSpec(K=K, N=N, G=G, likelihood="poisson", prior="truncnormal",
                     MH=True)
    hp = default_hyperprior_params(spec, float(data_np.mean()))
    data = MH.shard_data(data_np, mesh)

    n_chains = 4
    init, run = C.make_sharded_chain_runner(spec, mesh, n_chains,
                                            record="metrics")
    states = init(hp, data, jax.random.PRNGKey(0))
    temps = jnp.ones((3,), jnp.float32)
    acc = jnp.zeros((n_chains,), bool)
    states, samples = run(data, hp, states, temps, acc)

    # cross-process gather of the chain-sharded metrics proves the DCN path
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        samples["metrics"], tiled=True)
    arr = np.asarray(gathered)
    ll = arr.reshape(-1, arr.shape[-2], arr.shape[-1])[:, -1, 3]
    assert np.isfinite(ll).all(), ll
    print(f"WORKER_OK pid={pid} ll0={ll[0]:.3f}", flush=True)


if __name__ == "__main__":
    main()
