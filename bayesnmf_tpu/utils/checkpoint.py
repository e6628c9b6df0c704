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
        "archive": sampler._archive,
        "MAP": _to_host(sampler.MAP) if sampler.MAP is not None else None,
        "output_dir": sampler.output_dir,
        "row_names": getattr(sampler, "row_names", None),
        "col_names": getattr(sampler, "col_names", None),
    }
    with open(path, "wb") as fh:
        pickle.dump(payload, fh, protocol=4)


def load_sampler(cls, path: str):
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
    obj.data = jnp.asarray(p["data"])
    obj.dims = {"K": spec.K, "N": spec.N, "G": spec.G}
    obj.state = jax.tree.map(jnp.asarray, p["state"])
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

    obj.logger = RunLogger(None, obj.run_cfg.verbosity)
    obj.reference_comparison = {}
    obj.row_names = p.get("row_names")
    obj.col_names = p.get("col_names")
    return obj
