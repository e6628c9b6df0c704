"""Deterministic unit tests of the convergence tracker (check_convergence_,
convergence.R:60-154)."""

import math

from bayesnmf_tpu.config import ConvergenceControl
from bayesnmf_tpu.models.convergence import ConvergenceTracker


def cc(**kw):
    base = dict(MAP_over=100, MAP_every=100, tol=0.001, Ninarow_nochange=3,
                Ninarow_nobest=5, miniters=100, maxiters=10000)
    base.update(kw)
    return ConvergenceControl(**base)


def test_no_change_convergence():
    t = ConvergenceTracker(cc())
    v = 100.0
    msgs = []
    for i, it in enumerate(range(100, 1100, 100)):
        msgs.append(t.update(v, it, temps_all_one=True))
        if t.converged:
            break
    assert t.converged and t.why == "no change"
    # first check forces a change (prev = metric+1), so 3 no-change checks
    # after that -> converge on the 4th update
    assert t.converged_iter == 400
    assert "no change" in msgs[-1]


def test_no_best_convergence():
    t = ConvergenceTracker(cc(tol=1e-9))
    # oscillating but never improving beyond the first value
    vals = [100.0, 101.0, 100.5, 101.2, 100.8, 101.5, 100.9, 101.1]
    it = 100
    t.update(50.0, it, True)  # initial best = 50
    for v in vals:
        it += 100
        t.update(v, it, True)
        if t.converged:
            break
    assert t.converged and t.why == "no best"


def test_maxiters_convergence():
    t = ConvergenceTracker(cc(maxiters=300))
    t.update(1.0, 100, True)
    t.update(0.5, 200, True)
    t.update(0.2, 300, True)
    assert t.converged and t.why == "max iters"


def test_tempering_gate_blocks_convergence():
    t = ConvergenceTracker(cc())
    v = 100.0
    for it in range(100, 900, 100):
        t.update(v, it, temps_all_one=False)  # gate closed
    assert not t.converged
    # inarow_no_change still counts; once the gate opens, converge quickly
    assert t.inarow_no_change >= 3
    t.update(v, 900, temps_all_one=True)
    assert t.converged and t.why == "no change"


def test_miniters_gate():
    t = ConvergenceTracker(cc(miniters=500))
    v = 10.0
    for it in range(100, 500, 100):
        t.update(v, it, True)
    assert not t.converged
    t.update(v, 500, True)
    assert t.converged


def test_nan_resets_counters():
    t = ConvergenceTracker(cc())
    t.update(10.0, 100, True)
    t.update(10.0, 200, True)
    assert t.inarow_no_change == 1
    t.update(math.nan, 300, True)
    assert t.inarow_no_change == 0 and t.inarow_na == 1
