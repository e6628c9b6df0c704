"""MAP inference over the posterior sample window: mode-of-A, renormalized
elementwise means, credible intervals.

Parity: get_MAP_ (utils.R:194-288) + get_mode (helpers.R:63-79). The binary-A
mode is found by bit-packing each A sample (replacing the reference's
string-hash of matrices) on the small (S, N) host array; the heavy P/E
averaging and quantiles stay on device as fused jnp reductions.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import math as m


def a_mode(A_hist: np.ndarray):
    """Mode of the binary inclusion samples.

    Args:
      A_hist: (S, N) 0/1 array (host numpy).
    Returns: (mode_vector (N,), match_mask (S,), top_counts list[(pattern, count)])
    """
    Ab = np.asarray(A_hist).astype(np.int8)
    uniq, inverse, counts = np.unique(
        Ab, axis=0, return_inverse=True, return_counts=True
    )
    order = np.argsort(-counts)
    mode_row = uniq[order[0]]
    mask = inverse == order[0]
    top = [
        ("".join(str(int(v)) for v in uniq[i]), int(counts[i]))
        for i in order[:5]
    ]
    return mode_row.astype(np.float32), mask, top


def compute_map(P_hist, E_hist, A_hist, final: bool, credible_interval=0.95,
                want_ci: bool = True):
    """Compute the MAP estimate (and CIs) from a window of posterior samples.

    Steps (get_MAP_, utils.R:200-288): (i) mode of A; (ii) subset samples
    matching the mode; (iii) renormalize each so P columns sum to 1 scaling E
    up; (iv) elementwise mean → MAP P/E; CIs = elementwise quantiles.

    Args:
      P_hist: (S, K, N); E_hist: (S, N, G); A_hist: (S, N) — device or host.
      final: subset to included signatures (keep_sigs) if True.
    Returns dict with P, E, A, keep_sigs, idx_mask, A_counts, and optionally
    credible_intervals {P: {lower, upper}, E: {lower, upper}}.
    """
    A_host = np.asarray(A_hist)
    mode_row, mask, top = a_mode(A_host)
    S = A_host.shape[0]
    idx = np.nonzero(mask)[0]

    if final:
        keep_sigs = np.nonzero(mode_row == 1)[0]
        if keep_sigs.size == 0:
            keep_sigs = np.arange(mode_row.shape[0])
    else:
        keep_sigs = np.arange(mode_row.shape[0])

    # gather matching samples (concrete host-driven fancy indexing)
    P_sel = jnp.asarray(P_hist)[idx][:, :, keep_sigs]  # (S', K, n)
    E_sel = jnp.asarray(E_hist)[idx][:, keep_sigs, :]  # (S', n, G)

    # renormalize per sample: columns of P sum to 1, scale E up
    s = jnp.sum(P_sel, axis=1, keepdims=True)          # (S', 1, n)
    safe = jnp.where(s > 0, s, 1.0)
    P_rn = P_sel / safe
    E_rn = E_sel * jnp.swapaxes(safe, 1, 2)            # (S', n, G)

    P_map = jnp.mean(P_rn, axis=0)
    E_map = jnp.mean(E_rn, axis=0)

    out = {
        "P": P_map,
        "E": E_map,
        "A": mode_row[keep_sigs],
        "A_full": mode_row,
        "keep_sigs": keep_sigs,
        "idx_mask": mask,
        "A_counts": top,
    }
    if want_ci:
        lo = (1.0 - credible_interval) / 2.0
        qs = jnp.asarray([lo, 1.0 - lo], jnp.float32)
        P_ci = jnp.quantile(P_rn, qs, axis=0)
        E_ci = jnp.quantile(E_rn, qs, axis=0)
        out["credible_intervals"] = {
            "P": {"lower": P_ci[0], "upper": P_ci[1]},
            "E": {"lower": E_ci[0], "upper": E_ci[1]},
        }
    return out


def map_quality_metrics(data, map_est, G: int, K: int):
    """RMSE/KL/n_params/BIC-shape metrics of a MAP estimate.

    Parity: compute_metrics_ with final A recoded to ones (utils.R:419-423):
    the MAP P/E are already filtered/renormalized, so Mhat = P @ E.
    """
    P, E = map_est["P"], map_est["E"]
    Mh = m.dot_f32(P, E)
    n_par = float(np.asarray(jnp.sum(jnp.asarray(map_est["A_full"])))) * (G + K)
    return {
        "RMSE": float(np.asarray(m.rmse(data, Mh))),
        "KL": float(np.asarray(m.padded_kl(Mh, data))),
        "n_params": n_par,
        "rank": float(np.sum(np.asarray(map_est["A_full"]))),
    }
