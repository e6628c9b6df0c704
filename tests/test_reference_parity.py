"""Recovery parity on the reference package's bundled example dataset.

The reference ships inst/extdata/example_data.rds — a simulated 96x64 SBS
catalog generated from 4 true signatures (SURVEY.md L0; tutorial.qmd:34-38).
The acceptance bar is statistical: recovered signatures must match the
bundled ground truth within MCMC variance (BASELINE.json:5).
"""

import numpy as np
import pytest

from bayesnmf_tpu import ConvergenceControl
from bayesnmf_tpu.models.sampler import GibbsSampler
from bayesnmf_tpu.utils.assignment import hungarian_solve, pairwise_cosine
from bayesnmf_tpu.utils.rds import load_example_data


@pytest.fixture(scope="module")
def example():
    d = load_example_data()
    M = np.asarray(d["M"], np.float32)
    P_true = np.asarray(d["P"], np.float32)
    return M, P_true


def matched_cosines(P_est, P_true):
    sim = pairwise_cosine(P_est, P_true)
    cols = hungarian_solve(-sim)
    return np.array([sim[i, c] for i, c in enumerate(cols) if c >= 0])


def test_fixed_rank_recovery_mh(example):
    M, P_true = example
    cc = ConvergenceControl(MAP_over=100, MAP_every=50, miniters=100,
                            maxiters=600, Ninarow_nochange=3, Ninarow_nobest=5)
    s = GibbsSampler(M, 4, likelihood="poisson", prior="truncnormal", MH=True,
                     convergence_control=cc, post_warmup=100, seed=0)
    s.run_gibbs_sampler()
    cos = matched_cosines(np.asarray(s.MAP["P"]), P_true)
    assert cos.min() > 0.9, cos
    assert cos.mean() > 0.95, cos


def test_fixed_rank_recovery_gibbs(example):
    M, P_true = example
    cc = ConvergenceControl(MAP_over=100, MAP_every=50, miniters=100,
                            maxiters=500, Ninarow_nochange=3, Ninarow_nobest=5)
    s = GibbsSampler(M, 4, likelihood="poisson", prior="exponential", MH=False,
                     convergence_control=cc, seed=1)
    s.run_gibbs_sampler()
    cos = matched_cosines(np.asarray(s.MAP["P"]), P_true)
    assert cos.min() > 0.85, cos


@pytest.mark.slow
def test_rank_learning_recovers_4(example):
    M, P_true = example
    cc = ConvergenceControl(MAP_over=100, MAP_every=50, miniters=100,
                            maxiters=1500, Ninarow_nochange=3,
                            Ninarow_nobest=6)
    s = GibbsSampler(M, range(1, 8), likelihood="poisson", prior="truncnormal",
                     MH=True, rank_method="SBFI", convergence_control=cc,
                     prop_temp=0.3, post_warmup=200, seed=0)
    s.run_gibbs_sampler()
    learned = int(np.asarray(s.MAP["A_full"]).sum())
    assert learned == 4, learned
    cos = matched_cosines(np.asarray(s.MAP["P"]), P_true)
    assert cos.min() > 0.9, cos
