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


def test_vector_tracker_matches_scalar():
    """VectorConvergenceTracker over C chains must reproduce C independent
    scalar trackers on identical metric streams, including the NA branch,
    the gates, and the converged/why bookkeeping."""
    import numpy as np

    from bayesnmf_tpu.models.convergence import VectorConvergenceTracker

    rng = np.random.default_rng(0)
    C, checks = 32, 25
    control = cc(miniters=300, maxiters=2000, Ninarow_nochange=3,
                 Ninarow_nobest=4)
    streams = 100.0 + np.cumsum(rng.normal(0, 0.2, (checks, C)), axis=0)
    # inject plateaus (no-change), rises (no-best), and NaNs
    streams[10:14, : C // 2] = streams[9, : C // 2]
    streams[5, C // 2:] = np.nan
    scalars = [ConvergenceTracker(control) for _ in range(C)]
    vec = VectorConvergenceTracker(control, C)
    for i in range(checks):
        it = (i + 1) * 100
        gate = it >= 400
        for c in range(C):
            if not scalars[c].converged:
                scalars[c].update(float(streams[i, c]), it, gate)
        vec.update(streams[i], it, gate)
    for c in range(C):
        s = scalars[c]
        assert vec.converged[c] == s.converged, c
        if s.converged:
            assert vec.converged_iter[c] == s.converged_iter, c
            assert vec.why(c) == s.why, c
        else:
            assert vec.inarow_no_change[c] == s.inarow_no_change, c
            assert vec.inarow_no_best[c] == s.inarow_no_best, c
            assert vec.inarow_na[c] == s.inarow_na, c


def test_vector_tracker_scales_to_thousands():
    import time

    import numpy as np

    from bayesnmf_tpu.models.convergence import VectorConvergenceTracker

    C = 100_000
    vec = VectorConvergenceTracker(cc(), C)
    m = np.full(C, 50.0)
    t0 = time.perf_counter()
    for i in range(10):
        vec.update(m, (i + 1) * 100, True)
    dt = time.perf_counter() - t0
    assert vec.converged.all()
    assert dt < 2.0, f"vector tracker too slow at 100k chains: {dt:.2f}s"
