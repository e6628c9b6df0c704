"""Checkpoint / true resume of a sampler run.

The reference only snapshots the whole R object via saveRDS
(bayesNMF_sampler.R:414-416) and cannot resume *sampling* (SURVEY.md C19).
Here a checkpoint captures the full device state (params, prior params, RNG
key), the host convergence tracker, the metric history and the retained
sample window — enough to continue the chain bit-exactly from where it
stopped.
"""

from __future__ import annotations

import pickle

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_sampler(sampler, path: str):
    payload = {
        "version": 1,
        "spec": sampler.spec,
        "cc": sampler.cc,
        "run_cfg": sampler.run_cfg,
        "rank": sampler.rank,
        "post_warmup": sampler.post_warmup,
        "temp_sched": sampler.temp_sched,
        "hyperprior_params": _to_host(sampler.hyperprior_params),
        "data": np.asarray(sampler.data),
        "state": _to_host(sampler.state),
        "iter": sampler.iter,
        "tracker": sampler.tracker.to_dict(),
        "time": sampler.time,
        "MAP_metrics": sampler.MAP_metrics,
        "metric_rows": sampler._metric_rows,
        "window": [_to_host(c) for c in sampler._window],
        # the newest archive chunk may still be a device array (async
        # transfer pattern, sampler._append_chunk) — force to host
        "archive": ([_to_host(c) for c in sampler._archive]
                    if sampler._archive is not None else None),
        "MAP": _to_host(sampler.MAP) if sampler.MAP is not None else None,
        "output_dir": sampler.output_dir,
        "row_names": getattr(sampler, "row_names", None),
        "col_names": getattr(sampler, "col_names", None),
        "record_full": getattr(sampler, "record_full", False),
    }
    with open(path, "wb") as fh:
        pickle.dump(payload, fh, protocol=4)


def save_ensemble(ens, path: str):
    """Checkpoint a ChainEnsemble: device chain states, per-chain trackers,
    the retained sample window and metric history — enough to resume all
    chains bit-exactly (the reference cannot resume sampling at all,
    SURVEY.md C19)."""
    payload = {
        "version": 2,
        "kind": "ensemble",
        "spec": ens.spec,
        "cc": ens.cc,
        "n_chains": ens.n_chains,
        "post_warmup": ens.post_warmup,
        "store_E": ens.store_E,
        "A_masks": ens.A_masks,
        "seed": ens.seed,
        "periodic_save": ens.periodic_save,
        "temp_sched": ens.temp_sched,
        "hp": _to_host(ens.hp),
        "data": np.asarray(ens._data_np),
        "states": _to_host(ens.states),
        "iter": ens.iter,
        "tracker_vec": ens.tracker.to_dict(),
        "end_iter": ens._end_iter,
        "window": [_to_host(c) for c in ens._window],
        "metric_rows": ens._metric_rows,
        "MAP_per_chain": [
            _to_host(m) if m is not None else None for m in ens.MAP_per_chain],
        "time": ens.time,
        "output_dir": ens.output_dir,
        "row_names": getattr(ens, "row_names", None),
        "col_names": getattr(ens, "col_names", None),
        "record": getattr(ens, "record", "basic"),
        "want_ci": getattr(ens, "want_ci", True),
        "compact": getattr(ens, "compact", True),
        "slots": getattr(ens, "_slots", None),
        "final_windows": getattr(ens, "_final_windows", {}),
        "final_metrics": getattr(ens, "_final_metrics", {}),
        "archive": getattr(ens, "_archive", None),
        "MAP_metrics_per_chain": getattr(
            ens, "_MAP_metrics_per_chain",
            [[] for _ in range(ens.n_chains)]),
        "init_params": _to_host(ens._init_params)
        if getattr(ens, "_init_params", None) else None,
        "init_prior_params": _to_host(ens._init_prior_params)
        if getattr(ens, "_init_prior_params", None) else None,
    }
    with open(path, "wb") as fh:
        pickle.dump(payload, fh, protocol=4)


def load_ensemble(cls, path: str, mesh=None):
    import jax.numpy as jnp

    from .logging import RunLogger

    with open(path, "rb") as fh:
        p = pickle.load(fh)
    obj = cls.__new__(cls)
    obj.spec = p["spec"]
    obj.cc = p["cc"]
    obj.n_chains = p["n_chains"]
    obj.post_warmup = p["post_warmup"]
    obj.store_E = p["store_E"]
    obj.A_masks = p.get("A_masks")
    obj.seed = p["seed"]
    obj.periodic_save = p["periodic_save"]
    obj.temp_sched = p["temp_sched"]
    obj.hp = p["hp"]
    obj._data_np = p["data"]
    obj.record = p.get("record", "basic")
    obj.want_ci = p.get("want_ci", True)
    obj.compact = p.get("compact", True)
    obj._init_params = p.get("init_params")
    obj._init_prior_params = p.get("init_prior_params")
    obj._slots = p.get("slots")
    if obj._slots is None:
        obj._slots = np.arange(obj.n_chains)
    obj._final_windows = p.get("final_windows", {})
    obj._final_metrics = p.get("final_metrics", {})
    obj._archive = p.get("archive")
    obj._MAP_metrics_per_chain = p.get(
        "MAP_metrics_per_chain", [[] for _ in range(p["n_chains"])])
    obj._attach_mesh(mesh)
    obj.states = jax.tree.map(jnp.asarray, p["states"])
    if mesh is not None:
        from ..parallel import mesh as M

        obj.states = jax.device_put(
            obj.states, M.state_shardings(obj.spec, mesh, chains=True))
    obj.iter = p["iter"]
    from ..models.convergence import VectorConvergenceTracker

    if "tracker_vec" in p:
        obj.tracker = VectorConvergenceTracker(obj.cc, obj.n_chains)
        obj.tracker.restore(p["tracker_vec"])
    else:  # legacy checkpoints: list of per-chain scalar-tracker dicts
        obj.tracker = VectorConvergenceTracker.from_scalar_dicts(
            obj.cc, p["trackers"])
    obj._end_iter = p["end_iter"]
    # window chunks stay host-side numpy; downstream consumers
    # (jnp.concatenate / slicing) accept either
    obj._window = p["window"]
    for ch in obj._window:  # legacy (v1) chunks predate compaction
        ch.setdefault("chain_ids", np.arange(obj.n_chains))
    obj._metric_rows = p["metric_rows"]
    obj.MAP_per_chain = p["MAP_per_chain"]
    obj._reference_comparisons = {}
    obj.time = p["time"]
    obj.output_dir = p["output_dir"]
    # resumed runs keep logging to the original output dir (append)
    obj.logger = RunLogger(obj.output_dir, 1, mode="a")
    obj.row_names = p.get("row_names")
    obj.col_names = p.get("col_names")
    return obj


def load_sampler(cls, path: str, mesh=None):
    import jax.numpy as jnp

    with open(path, "rb") as fh:
        p = pickle.load(fh)
    spec = p["spec"]
    obj = cls.__new__(cls)
    obj.spec = spec
    obj.cc = p["cc"]
    obj.run_cfg = p["run_cfg"]
    obj.rank = p["rank"]
    obj.post_warmup = p["post_warmup"]
    obj.temp_sched = p["temp_sched"]
    obj.hyperprior_params = p["hyperprior_params"]
    obj.mesh = mesh
    if mesh is not None:
        from ..parallel import mesh as Mm

        obj._state_sharding = Mm.state_shardings(spec, mesh, chains=False)
        obj.data = jax.device_put(
            jnp.asarray(p["data"]), Mm.data_sharding(mesh))
        obj.state = jax.device_put(
            jax.tree.map(jnp.asarray, p["state"]), obj._state_sharding)
    else:
        obj._state_sharding = None
        obj.data = jnp.asarray(p["data"])
        obj.state = jax.tree.map(jnp.asarray, p["state"])
    obj.dims = {"K": spec.K, "N": spec.N, "G": spec.G}
    obj.iter = p["iter"]
    from ..models.convergence import ConvergenceTracker

    obj.tracker = ConvergenceTracker(obj.cc)
    obj.tracker.restore(p["tracker"])
    obj.time = p["time"]
    obj.MAP_metrics = p["MAP_metrics"]
    obj._metric_rows = p["metric_rows"]
    import collections

    window_chunks = -(-obj.cc.MAP_over // obj.cc.MAP_every) + 1
    obj._window = collections.deque(p["window"], maxlen=window_chunks)
    obj._archive = p["archive"]
    obj.MAP = p["MAP"]
    obj.credible_intervals = (
        obj.MAP.get("credible_intervals") if obj.MAP else None)
    obj.output_dir = p["output_dir"]
    from .logging import RunLogger

    # resumed runs keep logging to the original output dir (append)
    obj.logger = RunLogger(obj.output_dir, obj.run_cfg.verbosity, mode="a")
    obj.reference_comparison = {}
    obj.row_names = p.get("row_names")
    obj.col_names = p.get("col_names")
    obj.record_full = p.get("record_full", False)
    return obj
