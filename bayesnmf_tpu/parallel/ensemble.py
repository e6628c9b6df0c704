"""Multi-chain ensemble driver: many independent chains, one device program.

No reference equivalent (the R package runs exactly one chain,
advanced.qmd:56). Chains are vmapped into a single jitted chunk program
(parallel/chains.py), optionally sharded over a (chain, g) mesh. Each chain
keeps reference semantics individually: warmup with accept-all MH until its
own convergence, then ``post_warmup`` true-MH inference samples; per-chain
convergence is tracked host-side from the vectorized metric outputs.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    ConvergenceControl,
    ModelSpec,
    default_MH,
    default_hyperprior_params,
)
from ..models import gibbs
from ..models.convergence import ConvergenceTracker
from ..models.map_estimate import compute_map
from . import chains as chains_mod


class ChainEnsemble:
    """Run ``n_chains`` independent Gibbs chains of the same model."""

    def __init__(
        self,
        data,
        rank,
        n_chains: int = 8,
        likelihood: str = "poisson",
        prior: str = "truncnormal",
        rank_method: str = "SBFI",
        MH: Optional[bool] = None,
        convergence_control: Optional[ConvergenceControl] = None,
        prop_temp: float = 0.2,
        post_warmup: Optional[int] = None,
        mesh=None,
        seed: int = 0,
        store_E: bool = True,
    ):
        data = np.asarray(data, np.float32)
        if isinstance(rank, (int, np.integer)):
            ranks = [int(rank)]
        else:
            ranks = sorted(int(r) for r in rank)
        learning_rank = len(ranks) > 1
        if learning_rank and min(ranks) != 0:
            ranks = list(range(0, max(ranks) + 1))
        N = max(ranks)
        if MH is None:
            MH = default_MH(likelihood, prior)
        self.spec = ModelSpec(
            K=data.shape[0], N=N, G=data.shape[1], likelihood=likelihood,
            prior=prior, MH=MH, learning_rank=learning_rank,
            rank_method=rank_method,
        )
        self.cc = convergence_control or ConvergenceControl()
        self.n_chains = n_chains
        self.post_warmup = (post_warmup if post_warmup is not None
                            else 2 * self.cc.MAP_over) if MH else 0
        self.store_E = store_E

        n_iters = self.cc.maxiters + self.post_warmup
        rng = np.random.default_rng(seed)
        if learning_rank:
            sched = gibbs.temp_schedule(
                n_iters, int(round(prop_temp * self.cc.maxiters)), rng)
        else:
            sched = np.ones(n_iters, np.float32)
        self.temp_sched = np.concatenate([[np.float32(0)], sched])

        self.hp = default_hyperprior_params(self.spec, float(data.mean()))
        self.mesh = mesh
        if mesh is not None:
            from . import mesh as M

            self._init_fn, self._run_fn = chains_mod.make_sharded_chain_runner(
                self.spec, mesh, n_chains)
            self.data = jax.device_put(jnp.asarray(data), M.data_sharding(mesh))
            self.states = self._init_fn(self.hp, self.data,
                                        jax.random.PRNGKey(seed))
        else:
            self._run_fn = None
            self.data = jnp.asarray(data)
            self.states = chains_mod.init_chain_states(
                self.spec, self.hp, self.data, jax.random.PRNGKey(seed),
                n_chains)

        self.trackers = [ConvergenceTracker(self.cc) for _ in range(n_chains)]
        self.iter = 1
        # per-chain iteration at which the inference phase ends
        self._end_iter = np.full(n_chains, -1, np.int64)
        self._window = []      # recent chunks (device)
        self._metric_rows = []  # list of (C, chunk, n_metrics) host arrays
        self.MAP_per_chain: list = [None] * n_chains
        self.time = {}

    # ------------------------------------------------------------------

    def _accept_all_vec(self):
        return jnp.asarray(
            [self.spec.MH and not t.converged for t in self.trackers], bool)

    def _run_chunk(self, steps: int):
        temps = jnp.asarray(
            self.temp_sched[self.iter + 1: self.iter + steps + 1])
        acc = self._accept_all_vec()
        if self._run_fn is not None:
            self.states, samples = self._run_fn(
                self.data, self.hp, self.states, temps, acc)
        else:
            self.states, samples = chains_mod.run_chunk_chains(
                self.spec, self.data, self.hp, self.states, temps, acc)
        chunk = {"P": samples["P"], "A": samples["A"],
                 "start_iter": self.iter + 1}
        if self.store_E:
            chunk["E"] = samples["E"]
        self._window.append(chunk)
        max_chunks = -(-self.cc.MAP_over // self.cc.MAP_every) + 1
        if len(self._window) > max_chunks:
            self._window.pop(0)
        self._metric_rows.append(np.asarray(samples["metrics"]))
        self.iter += steps

    def _metrics_tail(self, n: int):
        rows = np.concatenate(self._metric_rows, axis=1)  # (C, iters, m)
        return rows[:, -n:, :]

    def _check_convergence(self):
        win = self._metrics_tail(self.cc.MAP_over)
        # per-chain MAP metric: mean of loglik/logpost over window, as the
        # reference does (update_MAP_metrics_, utils.R:369-379)
        col = {"loglikelihood": 3, "logposterior": 4, "RMSE": 1, "KL": 2}[
            self.cc.metric]
        vals = np.nanmean(win[:, :, col], axis=1)
        if self.cc.metric in ("loglikelihood", "logposterior"):
            vals = -vals
        temps_all_one = bool(np.all(
            self.temp_sched[max(self.iter - self.cc.MAP_over, 1):
                            self.iter + 1] == 1.0))
        for c, t in enumerate(self.trackers):
            was = t.converged
            t.update(float(vals[c]), self.iter, temps_all_one)
            if t.converged and not was:
                self._end_iter[c] = self.iter + self.post_warmup

    def run(self):
        """Run all chains to completion; returns self."""
        t0 = time.time()
        cc = self.cc
        while True:
            boundary = ((self.iter // cc.MAP_every) + 1) * cc.MAP_every
            hard_stop = cc.maxiters + self.post_warmup
            boundary = min(boundary, hard_stop)
            self._run_chunk(boundary - self.iter)
            if (self.iter % cc.MAP_every == 0
                    and self.iter >= max(cc.MAP_over, cc.MAP_every)) \
                    or self.iter >= hard_stop:
                self._check_convergence()
            all_done = all(
                t.converged and (self._end_iter[c] <= self.iter)
                for c, t in enumerate(self.trackers))
            if all_done or self.iter >= hard_stop:
                break
        self.time["total"] = (time.time() - t0) / 60.0
        self.time["iters"] = self.iter
        self._compute_maps()
        return self

    def _compute_maps(self):
        Ps = jnp.concatenate([c["P"] for c in self._window], axis=1)
        As = np.concatenate([np.asarray(c["A"]) for c in self._window], axis=1)
        Es = (jnp.concatenate([c["E"] for c in self._window], axis=1)
              if self.store_E else None)
        S = min(self.cc.MAP_over, Ps.shape[1])
        for c in range(self.n_chains):
            P_h = Ps[c, -S:]
            A_h = As[c, -S:]
            if Es is not None:
                E_h = Es[c, -S:]
            else:
                E_h = jnp.zeros((S, self.spec.N, 1), jnp.float32)
            self.MAP_per_chain[c] = compute_map(
                P_h, E_h, A_h, final=True, want_ci=False)

    # ------------------------------------------------------------------

    @property
    def learned_ranks(self):
        return np.array([
            int(np.asarray(m_["A_full"]).sum()) if m_ is not None else -1
            for m_ in self.MAP_per_chain])

    def throughput(self):
        """Chain-iterations per second over the whole run."""
        secs = self.time["total"] * 60.0
        return self.n_chains * self.iter / max(secs, 1e-9)

    def diagnostics(self, metrics=("logposterior", "loglikelihood",
                                   "RMSE", "rank"),
                    n_draws: Optional[int] = None):
        """Cross-chain convergence report: rank-normalized split-R̂ and
        bulk/tail ESS per metric (see parallel/diagnostics.py). Defaults to
        the retained inference window (``n_draws=MAP_over``)."""
        from .diagnostics import ensemble_diagnostics

        if n_draws is None:
            n_draws = self.cc.MAP_over
        return ensemble_diagnostics(self, metrics=metrics, n_draws=n_draws)
