"""Tests of assignment, cosine similarity, ensemble voting, summaries, RDS."""

import numpy as np
import pandas as pd
import pytest

from bayesnmf_tpu.utils.assignment import (
    hungarian_assignment,
    hungarian_solve,
    hungarian_solve_batch,
    pairwise_cosine,
)
from bayesnmf_tpu.utils.cosmic import get_cosmic, get_cosmic_colors
from bayesnmf_tpu.utils.rds import load_example_data


def test_cosmic_matrix_shape():
    c = get_cosmic()
    assert c.shape == (96, 79)
    assert c.index[0].count(">") == 1  # trinucleotide labels like A[C>A]A
    np.testing.assert_allclose(c.to_numpy().sum(axis=0), 1.0, atol=2e-2)
    assert len(get_cosmic_colors()) == 6


def test_example_data_loads():
    d = load_example_data()
    assert d["M"].shape == (96, 64)
    assert d["P"].shape == (96, 4)
    # M should be counts generated from P/E structure
    assert (np.asarray(d["M"], float) >= 0).all()


def test_pairwise_cosine_matches_manual():
    rng = np.random.default_rng(0)
    a = rng.random((10, 3))
    b = rng.random((10, 5))
    sim = pairwise_cosine(a, b)
    assert sim.shape == (3, 5)
    want = (a[:, 0] @ b[:, 2]) / (np.linalg.norm(a[:, 0]) * np.linalg.norm(b[:, 2]))
    np.testing.assert_allclose(sim[0, 2], want, rtol=1e-9)


def test_pairwise_cosine_dim_mismatch():
    with pytest.raises(ValueError):
        pairwise_cosine(np.ones((4, 2)), np.ones((5, 2)))


def test_hungarian_matches_scipy_random():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(1)
    for _ in range(25):
        r, c = rng.integers(1, 15, 2)
        cost = rng.normal(size=(r, c))
        got = hungarian_solve(cost)
        rows, cols = linear_sum_assignment(cost)
        got_cost = sum(cost[i, got[i]] for i in range(r) if got[i] >= 0)
        np.testing.assert_allclose(got_cost, cost[rows, cols].sum(), rtol=1e-12)


def test_hungarian_batch_consistent():
    rng = np.random.default_rng(2)
    costs = rng.normal(size=(7, 4, 9))
    batch = hungarian_solve_batch(costs)
    for i in range(7):
        single = hungarian_solve(costs[i])
        c_b = sum(costs[i, j, batch[i, j]] for j in range(4))
        c_s = sum(costs[i, j, single[j]] for j in range(4))
        np.testing.assert_allclose(c_b, c_s, rtol=1e-12)


def test_hungarian_assignment_identity_on_cosmic():
    # assigning 5 exact COSMIC signatures must recover their own names
    cosmic = get_cosmic()
    sub = cosmic[["SBS1", "SBS5", "SBS13", "SBS40", "SBS3"]]
    df = hungarian_assignment(sub, cosmic)
    assert list(df.sig_ref) == ["SBS1", "SBS5", "SBS13", "SBS40", "SBS3"]
    np.testing.assert_allclose(df.cos_sim, 1.0, atol=1e-9)


def test_hungarian_assignment_pads_square():
    rng = np.random.default_rng(3)
    est = rng.random((20, 6))
    ref = rng.random((20, 2))
    mat = hungarian_assignment(est, ref, return_mat=True)
    assert mat.shape == (6, 6)  # padded with zero-cos "None" columns
    assert (mat.columns == "None").sum() == 4
    df = hungarian_assignment(est, ref)
    assert (df.sig_ref == "None").sum() == 4
    assert (df.cos_sim[df.sig_ref == "None"] == 0).all()


def test_hungarian_assignment_row_reorder():
    # shuffled reference rows must be reordered by row name before similarity
    cosmic = get_cosmic()
    est = cosmic[["SBS1", "SBS5"]]
    shuffled = cosmic.sample(frac=1.0, random_state=0)  # permute rows
    df = hungarian_assignment(est, shuffled)
    assert list(df.sig_ref) == ["SBS1", "SBS5"]
    np.testing.assert_allclose(df.cos_sim, 1.0, atol=1e-9)
