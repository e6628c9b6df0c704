"""Fused Pallas TPU kernel: the full sequential P+E Metropolis-Hastings
sweeps of one Gibbs iteration as a single VMEM-resident kernel.

Why: the XLA path builds ~6 small kernels per column update; at 96x500 the
arrays are ~200KB, so per-kernel latency (not bandwidth) dominates a
single-chain iteration. Fusing both sweeps into one kernel keeps data, Mhat,
and the factor matrices in VMEM across all 2N column updates — one kernel
launch per iteration instead of ~12N.

Scope: the Poisson-likelihood + MH path (the reference's flagship family,
sample_Pn.R:132-248), truncnormal/exponential priors, exact or
reference-parity Hastings ratio, fixed or learned rank (A enters as data).
Randomness is pre-drawn outside as uniforms; the truncated-normal draws use
the in-kernel inverse CDF (ops/pallas_special.py; erf_inv lowers in Mosaic,
erf/erfc do not). The math mirrors updates.sweep_P/sweep_E exactly — those
remain the portable reference implementation (and the CPU-mesh test target).

VMEM budget: all (K, G) operands resident; fits comfortably to G ~ 2000 at
K = 96 (a few MB); larger problems use the XLA path where per-op latency no
longer dominates.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_special as ps

_FLOOR = 1e-6
_EPS = 1e-30
# Ablation-only trace-time switch: False compiles the kernel without the
# NaN-clamp event counting (the NA_events observability column) to measure
# its cost. Production default is True — never ship False.
COUNT_NA = True


def _ndtri(p):
    """Inverse normal CDF, f32-robust over the full (0, 1) range.

    erf_inv lowers in Mosaic and is f32-exact in the central region, but for
    tail p the argument 2p-1 rounds to exactly ±1.0 in f32 (|p| ≲ 6e-8 from
    either end) and erf_inv(±1) = ±inf poisons the truncated-normal draws —
    prior-fallback draws have no MH rejection to mask the inf, so one bad
    draw NaNs the whole chain. Acklam's tail branches work in sqrt(-2 log p)
    space and stay finite/accurate there.
    """
    central = 1.4142135623730951 * jax.lax.erf_inv(2.0 * p - 1.0)
    tails = ps.ndtri(p)
    return jnp.where((p < 0.02425) | (p > 0.97575), tails, central)


def _truncnorm_icdf(u, mu, sd):
    """Inverse-CDF truncated-normal draw, mirroring
    distributions.truncnorm_nonneg: tail-form icdf for alpha <= 8, and the
    Exp(1)/alpha deep-tail limit beyond (where ndtr underflows f32 and
    erf_inv(-1) = -inf would poison the proposal)."""
    alpha = -mu / sd
    tail = ps.ndtr(-alpha)
    v = jnp.maximum(u * tail, jnp.float32(1.2e-38))
    z_icdf = jnp.maximum(-_ndtri(v), alpha)
    a_safe = jnp.maximum(alpha, 1.0)
    z_tail = a_safe - jnp.log(jnp.maximum(u, 1.2e-38)) / a_safe
    z = jnp.where(alpha > 8.0, z_tail, z_icdf)
    return jnp.maximum(mu + sd * z, 0.0)


def _tn_logpdf(x, mu, var):
    sd = jnp.sqrt(var)
    z = (x - mu) / sd
    return (-0.5 * z * z - jnp.log(sd) - 0.9189385332046727
            - ps.log_ndtr(mu / sd))


def _hyper_sweep_side(x, mu_old, sq_old, hhp, hu, out_mu, out_sq):
    """In-kernel Mu/Sigmasq hyper-update for ONE side (P or E): the exact
    Metropolized-conjugate transitions of updates.sample_prior_params
    (exact_truncnorm_hypers path) — the conjugate normal / Wilson-Hilferty
    inv-gamma propose, the Hastings ratio collapses to Phi ratios.
    ``hhp`` rows: [m0, s0, a0, b0] (hyperprior, broadcast); ``hu`` rows:
    4 uniform planes (z_mu, lu_mu, z_sq, lu_sq sources)."""
    m0, s0 = hhp[0], hhp[1]
    a0, b0 = hhp[2], hhp[3]
    z_mu = _ndtri(hu[0])
    lu_mu = jnp.log(hu[1])
    z_sq = _ndtri(hu[2])
    lu_sq = jnp.log(hu[3])

    den = 1.0 / s0 + 1.0 / sq_old
    prop = (m0 / s0 + x / sq_old) / den + jnp.sqrt(1.0 / den) * z_mu
    sd = jnp.sqrt(sq_old)
    la = ps.log_ndtr(mu_old / sd) - ps.log_ndtr(prop / sd)
    mu_new = jnp.where(lu_mu < la, prop, mu_old)

    a = a0 + 0.5
    b = b0 + 0.5 * (x - mu_new) * (x - mu_new)
    c = 1.0 - 1.0 / (9.0 * a)
    sqa3 = 3.0 * jnp.sqrt(a)
    t_new = c + z_sq / sqa3
    g_new = a * t_new * t_new * t_new
    ok = g_new > 1e-30
    g_new_s = jnp.maximum(g_new, 1e-30)
    sq_new = b / g_new_s
    g_old = b / jnp.maximum(sq_old, 1e-30)
    # cbrt via exp(log/3): g_old/a > 0 always
    t_old = jnp.exp(jnp.log(jnp.maximum(g_old / a, 1e-38)) / 3.0)
    z_old = sqa3 * (t_old - c)

    def logw(g, t, zz, sq):
        return ((a - 1.0) * jnp.log(g) - g + 0.5 * zz * zz
                + 2.0 * jnp.log(jnp.maximum(t, 1e-30))
                - ps.log_ndtr(mu_new / jnp.sqrt(sq)))

    la2 = jnp.where(
        ok,
        logw(g_new_s, t_new, z_sq, sq_new) - logw(g_old, t_old, z_old, sq_old),
        -jnp.inf)
    out_mu[:] = mu_new
    out_sq[:] = jnp.where(lu_sq < la2, sq_new, sq_old)


def _sweep_kernel(prior_kind, exact_mh, N, rank_method, hyper_update,
                  M_ref, P_in, E_in, A_in, Mh_in, aP_in, aE_in,
                  UprP_ref, UprE_ref, UpP_ref, UaP_ref, UpE_ref, UaE_ref,
                  hp0_p_in, hp1_p_in, hp0_e_in, hp1_e_in, rank_in,
                  Hu_p, Hu_e, Hhp_p, Hhp_e,
                  P_out, E_out, Mh_out, aP_out, aE_out, A_out, rank_out,
                  nan_out, hp0_p, hp1_p, hp0_e, hp1_e):
    """One fused Gibbs iteration core: P-sweep + E-sweep, and (when
    ``rank_method`` is set) the rank draw R + the inclusion sweep over A.
    hp*_p/_e are (Mu, Sigmasq) for the truncnormal prior or (Lambda, unused)
    for the exponential prior. ``rank_in`` packs:
      row 0: [temperature, accept_all_flag, 0...], row 1: Gumbel noise for
      the R categorical (N+1 entries), row 2: uniforms for the N Bernoulli A
      draws (rows 1-2 all-zero when not rank learning).

    The accept-all warmup flag is DATA (an operand), not a trace-time
    constant: per-chain flags in a vmapped ensemble are a traced vector (each
    chain flips from warmup accept-all to true MH at its own convergence), so
    a static flag would lock ensembles out of this kernel entirely — the one
    capability axis the reference lacks (advanced.qmd:56).
    """
    M = M_ref[:]
    P_out[:] = P_in[:]
    E_out[:] = E_in[:]
    Mh_out[:] = Mh_in[:]
    aP_out[:] = aP_in[:]
    aE_out[:] = aE_in[:]
    A_out[:] = A_in[:]
    rank_out[:] = rank_in[:]
    nan_out[0:1, 0:1] = jnp.zeros((1, 1), jnp.float32)
    A_ref = A_out
    acc_on = rank_in[0, 1] > 0.0

    # ---- prior-parameter hyper-sweep (truncnormal exact path) ----------
    # Runs FIRST on the pre-sweep P/E, exactly like the host-graph order
    # (gibbs_step: sample_prior_params then the sweeps); the sweeps below
    # read the freshly updated hp refs.
    hp0_p[:] = hp0_p_in[:]
    hp1_p[:] = hp1_p_in[:]
    hp0_e[:] = hp0_e_in[:]
    hp1_e[:] = hp1_e_in[:]
    if hyper_update:
        _hyper_sweep_side(P_in[:], hp0_p_in[:], hp1_p_in[:], Hhp_p, Hu_p,
                          hp0_p, hp1_p)
        _hyper_sweep_side(E_in[:], hp0_e_in[:], hp1_e_in[:], Hhp_e, Hu_e,
                          hp0_e, hp1_e)

    def prior_draw_of(u_prior, Mu_n, Sq_n, Lam_n):
        if prior_kind == "exponential":
            return -jnp.log(u_prior) / Lam_n
        return _truncnorm_icdf(u_prior, Mu_n, jnp.sqrt(Sq_n))

    def mh_column(Mh, old, other, Mu_n, Sq_n, Lam_n, u_prop, u_acc,
                  u_prior, axis):
        """Active-column (A_n = 1) MH update. ``other`` is E_n (1,G) for the
        P sweep (axis=1 reduction) or P_n (K,1) for the E sweep (axis=0).

        For the truncnormal prior an all-zero ``other`` needs no special
        case: den = 0 collapses the conditional to exactly the prior
        (mu = Mu, var = Sq) and the exact Hastings ratio to exactly 0, so
        the generic path IS the prior-fallback path. The exponential prior's
        conditional divides by den, so it keeps the explicit guard."""
        sig = jnp.maximum(Mh, _FLOOR)
        contrib_old = old * other  # (K,G) broadcast outer
        Mno = Mh - contrib_old
        o2 = other * other
        resid = (M - Mno) / sig
        mu1 = jnp.sum(resid * other, axis=axis, keepdims=True)
        den = jnp.sum(o2 / sig, axis=axis, keepdims=True)
        if prior_kind == "exponential":
            den_s = jnp.maximum(den, _EPS)
            mu = (mu1 - Lam_n) / den_s
            var = 1.0 / den_s
        else:
            den2 = den + 1.0 / Sq_n
            mu = (mu1 + Mu_n / Sq_n) / den2
            var = 1.0 / den2
        sd = jnp.sqrt(var)
        proposal = _truncnorm_icdf(u_prop, mu, sd)
        if prior_kind == "exponential":
            inactive = jnp.sum(o2) <= 0.0
            proposal = jnp.where(
                inactive, prior_draw_of(u_prior, Mu_n, Sq_n, Lam_n),
                proposal)

        Mh_prop = Mh + (proposal - old) * other
        lam_o = jnp.maximum(Mh, _FLOOR)
        lam_n = jnp.maximum(Mh_prop, _FLOOR)
        # ratio form: log1p(d/lam_o) is well-conditioned even under the
        # VPU's fast-log (log(lam_n)-log(lam_o) amplifies transcendental
        # error by ~sum(M) and destroys the acceptance ratio)
        d_lam = lam_n - lam_o
        lp_core = M * jnp.log1p(d_lam / lam_o) - d_lam
        if exact_mh:
            sig_r = jnp.maximum(Mh_prop, _FLOOR)
            mu1_r = jnp.sum(((M - Mno) / sig_r) * other, axis=axis,
                            keepdims=True)
            den_r = jnp.sum(o2 / sig_r, axis=axis, keepdims=True)
            if prior_kind == "exponential":
                den_rs = jnp.maximum(den_r, _EPS)
                mu_r = (mu1_r - Lam_n) / den_rs
                var_r = 1.0 / den_rs
                lprior = -Lam_n * (proposal - old)
            else:
                den_r2 = den_r + 1.0 / Sq_n
                mu_r = (mu1_r + Mu_n / Sq_n) / den_r2
                var_r = 1.0 / den_r2
                lprior = (_tn_logpdf(proposal, Mu_n, Sq_n)
                          - _tn_logpdf(old, Mu_n, Sq_n))
            log_ratio = (jnp.sum(lp_core, axis=axis, keepdims=True) + lprior
                         + _tn_logpdf(old, mu_r, var_r)
                         - _tn_logpdf(proposal, mu, var))
            if prior_kind == "exponential":
                log_ratio = jnp.where(inactive, 0.0, log_ratio)
        else:
            vs_o = jnp.maximum(Mh_prop, 1.0)
            vs_n = jnp.maximum(Mh, 1.0)
            r_o = M - Mh
            r_n = M - Mh_prop
            log_ratio = jnp.sum(
                lp_core
                + (-0.5 * r_o * r_o / vs_o - 0.5 * jnp.log(vs_o))
                - (-0.5 * r_n * r_n / vs_n - 0.5 * jnp.log(vs_n)),
                axis=axis, keepdims=True)
        ratio_raw = jnp.minimum(jnp.exp(log_ratio), 1.0)
        nan_mask = jnp.isnan(ratio_raw)
        n_nan = (jnp.sum(nan_mask.astype(jnp.float32)) if COUNT_NA
                 else jnp.zeros((), jnp.float32))
        ratio = jnp.where(nan_mask, 0.0, ratio_raw)
        take = acc_on | (u_acc < ratio)
        rec = jnp.where(acc_on, 1.0, ratio)
        new_val = jnp.where(take, proposal, old)
        Mh_new = Mh + (new_val - old) * other
        return new_val, Mh_new, rec, n_nan

    # Both sweeps are unrolled over the (static, small) N: Mosaic cannot
    # prove dynamic slices on the 128-lane axis, so a fori_loop with
    # pl.ds(n, 1) column indexing does not lower; static indices do.
    # Each column dispatches on its (scalar, data-dependent) inclusion flag
    # with pl.when: excluded columns run ONLY the prior draw, active columns
    # skip the prior-fallback icdf entirely — in a parallel-BIC ensemble
    # (fixed per-chain A masks) the excluded columns cost ~nothing.

    # ------------------------- P sweep (columns) -------------------------
    for n in range(N):
        A_n = A_ref[n, 0]
        Mu_n = hp0_p[:, n:n + 1]
        Sq_n = hp1_p[:, n:n + 1]

        @pl.when(A_n == 0.0)
        def _p_prior(n=n, Mu_n=Mu_n, Sq_n=Sq_n):
            P_out[:, n:n + 1] = prior_draw_of(
                UprP_ref[:, n:n + 1], Mu_n, Sq_n, Mu_n)

        @pl.when(A_n != 0.0)
        def _p_mh(n=n, Mu_n=Mu_n, Sq_n=Sq_n):
            new_col, Mh_new, rec, n_nan = mh_column(
                Mh_out[:], P_out[:, n:n + 1], E_out[n:n + 1, :],
                Mu_n, Sq_n, Mu_n,
                UpP_ref[:, n:n + 1], UaP_ref[:, n:n + 1],
                UprP_ref[:, n:n + 1], axis=1)
            P_out[:, n:n + 1] = new_col
            Mh_out[:] = Mh_new
            aP_out[:, n:n + 1] = rec
            nan_out[0:1, 0:1] = nan_out[0:1, 0:1] + n_nan

    # ------------------------- E sweep (rows) ----------------------------
    for n in range(N):
        A_n = A_ref[n, 0]
        Mu_n = hp0_e[n:n + 1, :]
        Sq_n = hp1_e[n:n + 1, :]

        @pl.when(A_n == 0.0)
        def _e_prior(n=n, Mu_n=Mu_n, Sq_n=Sq_n):
            E_out[n:n + 1, :] = prior_draw_of(
                UprE_ref[n:n + 1, :], Mu_n, Sq_n, Mu_n)

        @pl.when(A_n != 0.0)
        def _e_mh(n=n, Mu_n=Mu_n, Sq_n=Sq_n):
            new_row, Mh_new, rec, n_nan = mh_column(
                Mh_out[:], E_out[n:n + 1, :], P_out[:, n:n + 1],
                Mu_n, Sq_n, Mu_n,
                UpE_ref[n:n + 1, :], UaE_ref[n:n + 1, :],
                UprE_ref[n:n + 1, :], axis=0)
            E_out[n:n + 1, :] = new_row
            Mh_out[:] = Mh_new
            aE_out[n:n + 1, :] = rec
            nan_out[0:1, 0:1] = nan_out[0:1, 0:1] + n_nan

    if rank_method is None:
        return

    # ---------------- rank draw R + inclusion sweep over A ----------------
    # (sample_R + sample_An, sample_params.R:101-241; mirrors
    # updates.sample_R / updates.sweep_A — those stay the portable reference)
    # (Mosaic cannot store rank-0 scalars to VMEM; everything that lands in a
    # ref is kept (1, 1)-shaped via keepdims.)
    temp = rank_in[0, 0]
    fN = jnp.float32(N)
    sumA = jnp.sum(A_ref[:])
    # tpu.iota is integer-only; make the f32 ladder via convert
    r = jax.lax.broadcasted_iota(jnp.int32, (1, N + 1), 1).astype(jnp.float32)
    p1_r = jnp.clip(r / fN, 0.4 / fN, 1.0 - 0.4 / fN)
    loglik_r = sumA * jnp.log(p1_r) + (fN - sumA) * jnp.log(1.0 - p1_r)
    # Gumbel-max categorical draw (distributionally exact; one VPU max pass)
    scores = temp * loglik_r + rank_in[1:2, :]
    mx = jnp.max(scores, axis=1, keepdims=True)
    # unique max w.p. 1 under continuous Gumbel noise; sum-select the index
    R_new = jnp.sum(jnp.where(scores >= mx, r, 0.0), axis=1, keepdims=True)
    rank_out[0:1, 0:1] = R_new

    p1 = jnp.clip(R_new / fN, 0.4 / fN, 1.0 - 0.4 / fN)  # (1, 1)
    logit_p1 = jnp.log(p1) - jnp.log1p(-p1)
    if rank_method == "SBFI":
        G = M.shape[1]
        K = M.shape[0]
        sbfi_pen = jnp.float32((G + K) * math.log(G) / 2.0)

    for n in range(N):
        A_n = A_out[n, 0]
        P_n = P_out[:, n:n + 1]
        E_n = E_out[n:n + 1, :]
        contrib = P_n * E_n
        Mh_off = Mh_out[:] - A_n * contrib
        lam_off = jnp.maximum(Mh_off, _FLOOR)
        lam_on = jnp.maximum(Mh_off + contrib, _FLOOR)
        d = lam_on - lam_off
        delta = jnp.sum(M * jnp.log1p(d / lam_off) - d)
        if rank_method == "SBFI":
            delta = delta - sbfi_pen
        log_odds = logit_p1 + temp * delta  # (1, 1)
        p = 1.0 / (1.0 + jnp.exp(-log_odds))
        is_nan = jnp.isnan(p)
        nan_out[0:1, 0:1] = nan_out[0:1, 0:1] + is_nan.astype(jnp.float32)
        p = jnp.where(is_nan, 0.5, p)
        a_new = (rank_in[2:3, n:n + 1] < p).astype(jnp.float32)  # (1, 1)
        Mh_out[:] = Mh_off + a_new[0, 0] * contrib
        A_out[n:n + 1, 0:1] = a_new


@functools.partial(
    jax.jit,
    static_argnames=("prior_kind", "exact_mh", "rank_method"))
def fused_gibbs_sweeps(data, P, E, A, Mhat, acc_P, acc_E,
                       Upr_P, Upr_E, Up_P, Ua_P, Up_E, Ua_E,
                       hp0_p, hp1_p, hp0_e, hp1_e, rank_pack,
                       prior_kind: str, exact_mh: bool, accept_all,
                       rank_method, hyper_u=None, hyper_hp=None):
    """Run the Gibbs iteration core — both MH sweeps, plus the rank draw R
    and inclusion sweep A when ``rank_method`` is 'SBFI'/'BFI' — in ONE
    Pallas kernel.

    Args mirror updates.sweep_P/sweep_E (+ sample_R/sweep_A): prior-fallback
    uniforms (Upr_P/Upr_E, transformed to prior draws in-kernel),
    proposal/acceptance uniforms (U*), the prior parameter pair per side
    (Mu/Sigmasq for truncnormal, Lambda/ones for exponential), and
    ``rank_pack`` (3, N+1): row 0 [temperature, ...], row 1 Gumbel noise for
    the R categorical, row 2 uniforms for the A Bernoulli draws (all-zeros
    when not rank learning). All uniform tensors may be slices of ONE
    jax.random.uniform call (RNG launches, not FLOPs, dominate a
    small-problem iteration).

    ``accept_all`` may be a Python bool OR a traced boolean scalar — it rides
    into the kernel as data at rank_pack[0, 1], so vmapping this function
    over a chain axis (per-chain warmup flags) adds one grid dimension
    instead of forcing the slow path.

    ``hyper_u``/``hyper_hp``: optional ((4,K,N),(4,N,G)) pairs of uniform
    planes and broadcast hyperprior rows [m, s, a, b] — when given, the
    kernel ALSO runs the exact truncnormal Mu/Sigmasq hyper-sweep in VMEM
    before the P/E sweeps (replacing the host-graph sample_prior_params
    call and its extra RNG launches), returning the updated prior params.

    Returns (P, E, Mhat, acc_P, acc_E, A, R_float, nan_count,
    Mu_p', Sigmasq_p', Mu_e', Sigmasq_e').
    """
    K, N = P.shape
    G = E.shape[1]
    rank_pack = rank_pack.at[0, 1].set(
        jnp.asarray(accept_all, jnp.float32).reshape(()))
    hyper_update = hyper_u is not None
    if hyper_update:
        (Hu_p, Hu_e), (Hhp_p, Hhp_e) = hyper_u, hyper_hp
    else:
        Hu_p = Hu_e = Hhp_p = Hhp_e = jnp.zeros((1, 1), jnp.float32)
    kern = functools.partial(_sweep_kernel, prior_kind, exact_mh,
                             N, rank_method, hyper_update)
    out_shapes = [
        jax.ShapeDtypeStruct((K, N), jnp.float32),   # P
        jax.ShapeDtypeStruct((N, G), jnp.float32),   # E
        jax.ShapeDtypeStruct((K, G), jnp.float32),   # Mhat
        jax.ShapeDtypeStruct((K, N), jnp.float32),   # acc_P
        jax.ShapeDtypeStruct((N, G), jnp.float32),   # acc_E
        jax.ShapeDtypeStruct((N, 1), jnp.float32),   # A
        jax.ShapeDtypeStruct((3, N + 1), jnp.float32),  # rank pack (R at [0,0])
        jax.ShapeDtypeStruct((1, 1), jnp.float32),   # NaN-clamp event count
        jax.ShapeDtypeStruct((K, N), jnp.float32),   # Mu_p / Lambda_p out
        jax.ShapeDtypeStruct((K, N), jnp.float32),   # Sigmasq_p out
        jax.ShapeDtypeStruct((N, G), jnp.float32),   # Mu_e / Lambda_e out
        jax.ShapeDtypeStruct((N, G), jnp.float32),   # Sigmasq_e out
    ]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_in = 22
    interpret = jax.devices()[0].platform != "tpu"
    (P_o, E_o, Mh_o, aP_o, aE_o, A_o, rank_o, nan_o,
     hp0_p_o, hp1_p_o, hp0_e_o, hp1_e_o) = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[vmem] * n_in,
        out_specs=[vmem] * 12,
        input_output_aliases={1: 0, 2: 1, 4: 2, 5: 3, 6: 4,
                              13: 8, 14: 9, 15: 10, 16: 11},
        interpret=interpret,
    )(jnp.asarray(data, jnp.float32), P, E,
      jnp.asarray(A, jnp.float32).reshape(N, 1), Mhat, acc_P, acc_E,
      Upr_P, Upr_E, Up_P, Ua_P, Up_E, Ua_E,
      hp0_p, hp1_p, hp0_e, hp1_e, rank_pack,
      Hu_p, Hu_e, Hhp_p, Hhp_e)
    return (P_o, E_o, Mh_o, aP_o, aE_o, A_o.reshape(N), rank_o[0, 0],
            nan_o[0, 0], hp0_p_o, hp1_p_o, hp0_e_o, hp1_e_o)


def fused_pe_sweeps(data, P, E, A, Mhat, acc_P, acc_E,
                    Upr_P, Upr_E, Up_P, Ua_P, Up_E, Ua_E,
                    hp0_p, hp1_p, hp0_e, hp1_e,
                    prior_kind: str, exact_mh: bool, accept_all: bool):
    """Fixed-rank form: both MH sweeps only; returns (P, E, Mhat, acc_P, acc_E)."""
    N = P.shape[1]
    rank_pack = jnp.zeros((3, N + 1), jnp.float32)
    out = fused_gibbs_sweeps(
        data, P, E, A, Mhat, acc_P, acc_E,
        Upr_P, Upr_E, Up_P, Ua_P, Up_E, Ua_E,
        hp0_p, hp1_p, hp0_e, hp1_e, rank_pack,
        prior_kind=prior_kind, exact_mh=exact_mh, accept_all=accept_all,
        rank_method=None)
    return out[:5]
