"""Special functions as pure VPU arithmetic for Pallas TPU kernels.

Mosaic does not lower erf/erfc/erf_inv (probed: NotImplementedError), so the
fused sweep kernels need their own inverse-normal-CDF and normal log-CDF built
from +,-,*,/ and exp/log/sqrt only. Accuracy targets are f32: ndtri via
Acklam's rational approximation (|rel err| < 1.2e-8 in f64, f32-limited
here), ndtr via Abramowitz-Stegun 7.1.26 (|abs err| < 7.5e-8), log_ndtr with
an asymptotic tail expansion for x < -4 where ndtr underflows/loses bits.

These are also usable outside Pallas (plain jnp), which is how the unit tests
validate them against scipy.
"""

from __future__ import annotations

import jax.numpy as jnp

_SQRT2PI = 2.5066282746310002
_LOG_SQRT2PI = 0.9189385332046727


def ndtri(p):
    """Inverse standard normal CDF (Acklam), elementwise, f32-safe.

    Valid for p in (0, 1); inputs are clamped to [tiny, 1-eps].
    """
    tiny = jnp.float32(1.2e-38)
    p = jnp.clip(p, tiny, 1.0 - 1.2e-7)

    # coefficients (Acklam 2003)
    a1, a2, a3 = -3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02
    a4, a5, a6 = 1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00
    b1, b2, b3 = -5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02
    b4, b5 = 6.680131188771972e01, -1.328068155288572e01
    c1, c2, c3 = -7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00
    c4, c5, c6 = -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00
    d1, d2, d3, d4 = 7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00, 3.754408661907416e00

    p_low = 0.02425

    # lower tail
    q_l = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(p, tiny)))
    x_low = (((((c1 * q_l + c2) * q_l + c3) * q_l + c4) * q_l + c5) * q_l + c6) / (
        (((d1 * q_l + d2) * q_l + d3) * q_l + d4) * q_l + 1.0)

    # upper tail (symmetric)
    q_u = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - p, tiny)))
    x_up = -(((((c1 * q_u + c2) * q_u + c3) * q_u + c4) * q_u + c5) * q_u + c6) / (
        (((d1 * q_u + d2) * q_u + d3) * q_u + d4) * q_u + 1.0)

    # central region
    q_c = p - 0.5
    r = q_c * q_c
    x_mid = (((((a1 * r + a2) * r + a3) * r + a4) * r + a5) * r + a6) * q_c / (
        ((((b1 * r + b2) * r + b3) * r + b4) * r + b5) * r + 1.0)

    return jnp.where(p < p_low, x_low, jnp.where(p > 1.0 - p_low, x_up, x_mid))


def ndtr(x):
    """Standard normal CDF via A&S 7.1.26, |abs err| < 7.5e-8, elementwise."""
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.2316419 * z)
    poly = t * (0.319381530 + t * (-0.356563782 + t * (1.781477937 + t * (
        -1.821255978 + t * 1.330274429))))
    pdf = jnp.exp(-0.5 * z * z) / _SQRT2PI
    upper = 1.0 - pdf * poly
    return jnp.where(x >= 0, upper, 1.0 - upper)


def log_ndtr(x):
    """log of the standard normal CDF; asymptotic tail for x < -4:
    log Phi(x) ~ -x^2/2 - log(-x) - log sqrt(2 pi) + log1p(-1/x^2 + 3/x^4)."""
    safe_tail = jnp.minimum(x, -4.0)
    ix2 = 1.0 / (safe_tail * safe_tail)
    tail = (-0.5 * safe_tail * safe_tail - jnp.log(-safe_tail) - _LOG_SQRT2PI
            + jnp.log1p(-ix2 * (1.0 - 3.0 * ix2)))
    direct = jnp.log(jnp.maximum(ndtr(jnp.maximum(x, -4.0)), 1e-38))
    return jnp.where(x < -4.0, tail, direct)


def truncnorm_icdf_nonneg(u, mu, sd):
    """Inverse-CDF draw of Normal(mu, sd^2) truncated to [0, inf) from a
    uniform u in (0,1): the Pallas-side analog of
    ops.distributions.truncnorm_nonneg (tail-form inverse CDF + clamp)."""
    alpha = -mu / sd
    tail = ndtr(-alpha)
    tiny = jnp.float32(1.2e-38)
    v = jnp.maximum(u * tail, tiny)
    z = jnp.maximum(-ndtri(v), alpha)
    return jnp.maximum(mu + sd * z, 0.0)


def truncnorm_logpdf(x, mu, var):
    """log pdf of Normal(mu, var) truncated to [0, inf) (x assumed >= 0)."""
    sd = jnp.sqrt(var)
    z = (x - mu) / sd
    return -0.5 * z * z - jnp.log(sd) - _LOG_SQRT2PI - log_ndtr(mu / sd)
