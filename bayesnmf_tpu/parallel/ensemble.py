"""Multi-chain ensemble driver: many independent chains, one device program.

No reference equivalent (the R package runs exactly one chain,
advanced.qmd:56). Chains are vmapped into a single jitted chunk program
(parallel/chains.py), optionally sharded over a (chain, g) mesh. Each chain
keeps reference semantics individually: warmup with accept-all MH until its
own convergence, then ``post_warmup`` true-MH inference samples; per-chain
convergence is tracked host-side from the vectorized metric outputs.

First-class driver features (same surface as models/sampler.GibbsSampler):
logging to ``output_dir/log.txt``, periodic checkpoint + bit-exact resume
(utils/checkpoint.py), and postprocessing entry points — per-chain COSMIC
assignment via the same cosine-weighted Hungarian voting the single-chain
path uses (postprocessing.R:175-341) plus pooled cross-chain summaries.
"""

from __future__ import annotations

import os
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
from ..models.convergence import VectorConvergenceTracker
from ..models.map_estimate import compute_map
from ..utils.logging import RunLogger
from . import chains as chains_mod


class _ChainView:
    """Single-chain adapter over an ensemble: quacks enough like a
    GibbsSampler (spec/MAP/_gather_window/reference_comparison) for the
    shared postprocessing machinery to run unchanged per chain."""

    def __init__(self, ensemble: "ChainEnsemble", chain: int):
        self._ens = ensemble
        self.chain = chain
        self.spec = ensemble.spec
        self.row_names = getattr(ensemble, "row_names", None)
        self.MAP = ensemble.MAP_per_chain[chain]

    @property
    def reference_comparison(self):
        """Memoization lives on the ensemble so it survives view churn."""
        return self._ens._reference_comparisons.setdefault(self.chain, {})

    @reference_comparison.setter
    def reference_comparison(self, value):
        self._ens._reference_comparisons[self.chain] = value

    def get_MAP(self, **kw):
        if self.MAP is None:
            raise ValueError(
                "per-chain MAP not computed yet; call ensemble.run() first")
        return self.MAP

    def assign_signatures_ensemble(self, reference_P="cosmic", idxs=None,
                                   credible_interval=0.95):
        from ..utils.postprocessing import assign_signatures_ensemble

        return assign_signatures_ensemble(
            self, reference_P=reference_P, idxs=idxs,
            credible_interval=credible_interval)

    def summary(self, reference_P="cosmic"):
        from ..utils.postprocessing import sampler_summary

        return sampler_summary(self, reference_P=reference_P)

    def _gather_window(self, end_iter: int, n_samples: int):
        lo = end_iter - n_samples + 1
        c = self.chain
        Ps, Es, As = [], [], []
        for ch in self._ens._window:
            n = ch["P"].shape[1]
            s, e = ch["start_iter"], ch["start_iter"] + n - 1
            if e < lo or s > end_iter:
                continue
            i0, i1 = max(lo - s, 0), min(end_iter - s, n - 1) + 1
            Ps.append(jnp.asarray(ch["P"][c, i0:i1]))
            As.append(np.asarray(ch["A"][c, i0:i1]))
            if "E" in ch:
                Es.append(jnp.asarray(ch["E"][c, i0:i1]))
        if not Ps:
            raise ValueError("no samples in requested window")
        E = jnp.concatenate(Es) if Es else None
        return jnp.concatenate(Ps), E, np.concatenate(As)


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
        output_dir: Optional[str] = None,
        overwrite: bool = False,
        verbosity: int = 1,
        periodic_save: bool = True,
        A_masks=None,
    ):
        self.row_names = None
        self.col_names = None
        if hasattr(data, "index") and hasattr(data, "columns"):
            self.row_names = [str(r) for r in data.index]
            self.col_names = [str(c) for c in data.columns]
            data = data.to_numpy()
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
        # Optional per-chain FIXED inclusion masks (n_chains, N): chain c
        # samples a rank-sum(A_masks[c]) model; excluded columns keep drawing
        # from the prior exactly like the reference's A_n = 0 dispatch
        # (sample_Pn.R:12-13), so each chain's included-column posterior is
        # identical in distribution to a dedicated rank-k fit. This is the
        # engine of the parallel min-BIC rank search (fit(rank_method='BIC')):
        # every candidate rank runs simultaneously in the ONE vmapped device
        # program instead of the reference's serial lapply (bayesNMF.R:67-105).
        self.A_masks = None
        if A_masks is not None:
            if learning_rank:
                raise ValueError(
                    "A_masks fixes per-chain ranks; incompatible with a "
                    "learned rank (pass a scalar rank = max candidate rank)")
            self.A_masks = np.asarray(A_masks, np.float32)
            if self.A_masks.shape != (n_chains, N):
                raise ValueError(
                    f"A_masks must have shape ({n_chains}, {N}), got "
                    f"{self.A_masks.shape}")
        self.n_chains = n_chains
        self.post_warmup = (post_warmup if post_warmup is not None
                            else 2 * self.cc.MAP_over) if MH else 0
        self.store_E = store_E
        self.seed = seed
        self.periodic_save = periodic_save

        from ..models.sampler import _resolve_output_dir

        self.output_dir = _resolve_output_dir(output_dir, overwrite)
        self.logger = RunLogger(self.output_dir, verbosity)
        self.logger.log(
            f"Initialized ensemble: {n_chains} chains, likelihood = "
            f"{likelihood}, prior = {prior}, MH = {MH}", 1)

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
        self._data_np = data
        self._attach_mesh(mesh)
        self.states = self._init_states(jax.random.PRNGKey(seed))

        # vectorized over chains: one (C,)-array tracker, not C objects —
        # O(1) numpy ops per chunk even at thousands of vmapped chains
        self.tracker = VectorConvergenceTracker(self.cc, n_chains)
        self.iter = 1
        # per-chain iteration at which the inference phase ends
        self._end_iter = np.full(n_chains, -1, np.int64)
        self._window = []      # recent chunks (device)
        self._metric_rows = []  # list of (C, chunk, n_metrics) host arrays
        self.MAP_per_chain: list = [None] * n_chains
        self._reference_comparisons: dict = {}
        self.time = {}

    # ------------------------------------------------------------------
    # device plumbing (mesh-aware; re-entrant for checkpoint resume)
    # ------------------------------------------------------------------

    def _attach_mesh(self, mesh):
        self.mesh = mesh
        if mesh is not None:
            from . import mesh as M

            self._init_fn, self._run_fn = chains_mod.make_sharded_chain_runner(
                self.spec, mesh, self.n_chains, store_E=self.store_E)
            self.data = jax.device_put(
                jnp.asarray(self._data_np), M.data_sharding(mesh))
        else:
            self._init_fn = None
            self._run_fn = None
            self.data = jnp.asarray(self._data_np)

    def _init_states(self, key):
        if self._init_fn is not None:
            states = self._init_fn(self.hp, self.data, key)
        else:
            states = chains_mod.init_chain_states(
                self.spec, self.hp, self.data, key, self.n_chains)
        if self.A_masks is not None:
            # fixed per-chain inclusion: A never updates (learning_rank is
            # False), so setting it once pins each chain's rank for the run
            states["params"]["A"] = jax.device_put(
                jnp.asarray(self.A_masks),
                states["params"]["A"].sharding)
            states["params"]["R"] = jax.device_put(
                jnp.asarray(self.A_masks.sum(axis=1), jnp.int32),
                states["params"]["R"].sharding)
        return states

    # ------------------------------------------------------------------

    def _accept_all_vec(self):
        return jnp.asarray(self.spec.MH & ~self.tracker.converged)

    def _run_chunk(self, steps: int):
        temps = jnp.asarray(
            self.temp_sched[self.iter + 1: self.iter + steps + 1])
        acc = self._accept_all_vec()
        if self._run_fn is not None:
            self.states, samples = self._run_fn(
                self.data, self.hp, self.states, temps, acc)
        else:
            self.states, samples = chains_mod.run_chunk_chains(
                self.spec, self.data, self.hp, self.states, temps, acc,
                store_E=self.store_E)
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
        newly = self.tracker.update(vals, self.iter, temps_all_one)
        self._end_iter[newly] = self.iter + self.post_warmup
        for c in np.nonzero(newly)[0]:
            self.logger.log(
                f"chain {c} converged at {self.iter} due to "
                f"{self.tracker.why(c)}", 1)
        n_conv = int(self.tracker.converged.sum())
        self.logger.log(
            f"iter = {self.iter}: {n_conv}/{self.n_chains} chains "
            "converged", 1)
        if self.periodic_save and self.output_dir:
            self.save_object()

    def run(self):
        """Run all chains to completion (resumable: continues from the
        current iteration after ``ChainEnsemble.load``); returns self."""
        t0 = time.time()
        cc = self.cc
        self.logger.log("Starting ensemble Gibbs sampler", 1)
        hard_stop = cc.maxiters + self.post_warmup

        def all_done():
            return bool(np.all(self.tracker.converged
                               & (self._end_iter <= self.iter)))

        while self.iter < hard_stop and not all_done():
            boundary = ((self.iter // cc.MAP_every) + 1) * cc.MAP_every
            boundary = min(boundary, hard_stop)
            self._run_chunk(boundary - self.iter)
            if self.iter % cc.MAP_every == 0 or self.iter >= hard_stop:
                self._check_convergence()
        self.time["total"] = self.time.get("total", 0.0) + (
            time.time() - t0) / 60.0
        self.time["iters"] = self.iter
        self._compute_maps()
        self.logger.log(
            f"Ensemble done: {self.iter} iterations, "
            f"{self.throughput():.1f} chain-it/s", 1)
        if self.output_dir:
            self.save_object()
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
            # store_E=False runs carry no exposure history: the MAP omits E
            # (signature estimates + assignment remain valid) instead of
            # fabricating zeros.
            E_h = Es[c, -S:] if Es is not None else None
            res = compute_map(P_h, E_h, A_h, final=True, want_ci=False)
            res["idx"] = np.arange(self.iter - S + 1, self.iter + 1)[
                res["idx_mask"]]
            res["sig_idx"] = np.arange(len(res["keep_sigs"]))
            self.MAP_per_chain[c] = res

    # ------------------------------------------------------------------
    # persistence (checkpoint + bit-exact resume)
    # ------------------------------------------------------------------

    def save_object(self, path: Optional[str] = None):
        from ..utils.checkpoint import save_ensemble

        path = path or (os.path.join(self.output_dir, "ensemble.ckpt")
                        if self.output_dir else "ensemble.ckpt")
        save_ensemble(self, path)
        return path

    @classmethod
    def load(cls, path: str, mesh=None):
        from ..utils.checkpoint import load_ensemble

        return load_ensemble(cls, path, mesh=mesh)

    # ------------------------------------------------------------------
    # postprocessing entry points
    # ------------------------------------------------------------------

    def chain(self, c: int) -> _ChainView:
        """Single-chain view for the shared postprocessing machinery."""
        if self.MAP_per_chain[c] is None:
            self._compute_maps()
        return _ChainView(self, c)

    def assign_signatures(self, reference_P="cosmic", credible_interval=0.95):
        """Per-chain posterior-ensemble reference assignment
        (assign_signatures_ensemble_, postprocessing.R:175-341, run per
        chain). Returns {chain: {'assignments', 'votes'}}."""
        from ..utils.postprocessing import assign_signatures_ensemble

        return {
            c: assign_signatures_ensemble(
                self.chain(c), reference_P=reference_P,
                credible_interval=credible_interval)
            for c in range(self.n_chains)
        }

    def summary(self, reference_P="cosmic"):
        """Pooled cross-chain summary: one row per (chain, signature) with
        the per-chain reference assignment and cosine (summarize_samplers,
        postprocessing.R:114-152, over chains instead of samplers)."""
        import pandas as pd

        from ..utils.postprocessing import sampler_summary

        if not self.store_E:
            raise ValueError(
                "summary() needs exposure medians; rerun with store_E=True "
                "(assign_signatures() works without E)")
        frames = []
        for c in range(self.n_chains):
            df = sampler_summary(self.chain(c), reference_P).copy()
            df.insert(0, "Chain", c)
            frames.append(df)
        return pd.concat(frames, ignore_index=True)

    def pooled_assignment(self, reference_P="cosmic"):
        """Majority assignment across chains: for each reference signature,
        the fraction of chains whose MAP includes a signature assigned to it.
        The cross-chain analog of the reference's within-chain vote pooling."""
        import pandas as pd

        per_chain = self.assign_signatures(reference_P)
        rows = []
        for c, res in per_chain.items():
            a = res["assignments"]
            for _, r in a.iterrows():
                rows.append({"Chain": c, "sig_ref": r.sig_ref,
                             "MAP_cosine": r.MAP_cosine})
        df = pd.DataFrame(rows)
        agg = df.groupby("sig_ref").agg(
            n_chains=("Chain", "nunique"),
            mean_cosine=("MAP_cosine", "mean"),
        ).reset_index()
        agg["prop_chains"] = agg["n_chains"] / self.n_chains
        return agg.sort_values("prop_chains", ascending=False).reset_index(
            drop=True)

    # ------------------------------------------------------------------

    def bic_table(self):
        """Per-chain BIC over each chain's final MAP_over-iteration window:
        BIC = -2*mean(loglik) + n_params*log(G), the same statistic the
        reference's min-BIC driver reads from MAP_metrics (bayesNMF.R:95-97 /
        update_MAP_metrics_, utils.R:381-388). Returns a DataFrame sorted by
        BIC with one row per chain (columns: chain, rank, BIC, loglik)."""
        import pandas as pd

        win = self._metrics_tail(self.cc.MAP_over)  # (C, S, m)
        mean_ll = np.nanmean(win[:, :, 3], axis=1)
        n_params = win[:, -1, 5]  # sum(A)*(G+K); constant when A is fixed
        ranks = win[:, -1, 7]
        bic = -2.0 * mean_ll + n_params * np.log(self.spec.G)
        df = pd.DataFrame({
            "chain": np.arange(self.n_chains),
            "rank": ranks.astype(int),
            "BIC": bic,
            "loglik": mean_ll,
        })
        return df.sort_values("BIC").reset_index(drop=True)

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
