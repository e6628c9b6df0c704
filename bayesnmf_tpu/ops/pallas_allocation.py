"""Fused Pallas TPU kernel for latent-count multinomial allocation.

The conjugate Poisson-Gibbs path draws, per cell (k, g),
Z[k,:,g] ~ Multinomial(M[k,g], p ∝ P[k,:]*A*E[:,g]) and consumes only the two
marginal sums (sample_Pn.R:100-114, sample_En.R:99-113; the reference runs a
K*G R-level rmultinom loop, sample_params.R:253-265 — its dominant cost).

ops/allocation.py implements the binary-splitting factorization as a chain of
log2(N) XLA-level batched-binomial launches; that is fast but (a) pays
sequential launch/fusion boundaries per tree level, (b) materializes the
(n2, K, G) level stacks plus a (17, n2-1, K, G) uniform tensor in HBM. This
kernel runs the WHOLE tree for a G-tile inside VMEM and emits only
``Zsum_g``/``Zsum_k`` — the SURVEY §2.3 design ("emit both partial sums
directly; never materialize Z"). Randomness comes from the TPU core's native
PRNG (``pltpu.prng_random_bits``), so no uniform tensor ever touches HBM.

Per-tile HBM traffic drops to: read M, E tiles + write Zsum_k tile (+ one
(K, N) accumulator) — the information-theoretic minimum for this update.

Two trace-time modes share all sampling math:
  - ``use_prng=True`` (real TPU): seed the core PRNG from the threefry key's
    raw words + the grid index; generate every uniform in VMEM.
  - ``use_prng=False`` (CPU interpret tests): consume a pre-drawn uniform
    tensor operand, mirroring ops/allocation.py's scheme, so the exact
    tree/binomial logic is unit-testable off-TPU.

Exactness: the conditional binomials use the same two exact regimes as
ops/distributions.binomial_from_u (40-step f32-exact CDF inversion for
n*p' <= 10; BTRS transformed rejection above). BTRS candidates are unrolled
(8 rounds from the shared planes, + 8 fresh-bit rounds in PRNG mode); the
probability that ALL rounds reject is <= 0.14^16 ~ 5e-14 per element (0.86
is BTRS's acceptance floor), in which case the draw falls back to the
binomial mode floor((n+1)p) — astronomically rarer than f32 rounding error.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY = 1.2e-38  # python float: a module-level jnp constant would be
# "captured" by the kernel trace, which pallas_call rejects
_HALF_LOG_2PI = 0.9189385332046727
_UNROLL = 8          # BTRS rounds fed from the shared uniform planes
_FB_ROUNDS = 4       # extra fresh-bit rounds (PRNG mode only): total 12
# rounds puts P(all reject) <= 0.14^12 ~ 8e-11 per element — the mode
# fallback fires ~once per 1e10 draws, far below f32 rounding effects
_INV_STEPS = 40      # f32-exact CDF inversion bound (see distributions.py)
N_PLANES = 1 + 2 * _UNROLL  # inversion plane + (u, v) per BTRS round


def _lgamma_pos(x):
    """log Gamma(x) for x >= 1 as pure VPU arithmetic (Mosaic has no lgamma):
    shift into z >= 5 by the recurrence, then the 3-term Stirling series.
    Truncation error at z = 5: next term 1/(1680 z^7) ~ 8e-9 — below f32
    resolution of the binomial acceptance test (the XLA path's lax.lgamma
    is itself an f32 approximation of the same order). The shift loop, not
    the series, is the dominant cost (one log per iteration over the whole
    tile), so it runs the minimum count that guarantees z >= 5 from z >= 1."""
    shift = jnp.zeros_like(x)
    z = x
    for _ in range(4):
        small = z < 5.0
        shift = shift + jnp.where(small, jnp.log(jnp.maximum(z, _TINY)), 0.0)
        z = jnp.where(small, z + 1.0, z)
    zi = 1.0 / z
    zi2 = zi * zi
    series = zi * (8.3333333333e-2 - zi2 * (2.7777777778e-3
                                            - zi2 * 7.9365079365e-4))
    return (z - 0.5) * jnp.log(z) - z + _HALF_LOG_2PI + series - shift


def _binomial_tile(n, p, uniforms):
    """Exact Binomial(n, p) on a (K, Gt) tile from a list of uniform tiles
    (>= N_PLANES [+ 2*_FB_ROUNDS] entries). Mirrors
    distributions.binomial_from_u's regimes; see module docstring for the
    all-rounds-rejected bound."""
    flip = p > 0.5
    pp = jnp.where(flip, 1.0 - p, p)
    np_ = n * pp
    small = np_ <= 10.0

    # ---- inversion regime (n*p' <= 10) -----------------------------------
    p_inv = jnp.where(small, pp, 0.01)
    n_inv = jnp.where(small, n, 1.0)
    u = uniforms[0]
    ratio = p_inv / jnp.maximum(1.0 - p_inv, 1e-12)
    pmf = jnp.exp(n_inv * jnp.log1p(-p_inv))  # P(X = 0)
    cdf = pmf
    x_inv = jnp.zeros_like(n)
    for j in range(_INV_STEPS):
        x_inv = x_inv + (u > cdf).astype(jnp.float32)
        pmf = pmf * (n_inv - j) / (j + 1.0) * ratio
        cdf = cdf + pmf
    x_inv = jnp.minimum(x_inv, n_inv)

    # ---- BTRS regime (n*p' > 10), Hörmann 1993 ---------------------------
    p_b = jnp.where(small, 0.4, pp)
    n_b = jnp.where(small, 100.0, n)
    spq = jnp.sqrt(n_b * p_b * (1.0 - p_b))
    b = 1.15 + 2.53 * spq
    a = -0.0873 + 0.0248 * b + 0.01 * p_b
    c = n_b * p_b + 0.5
    vr = 0.92 - 4.2 / b
    alpha = (2.83 + 5.1 / b) * spq
    lpq = jnp.log(p_b / jnp.maximum(1.0 - p_b, 1e-12))
    m_ = jnp.floor((n_b + 1.0) * p_b)
    h = _lgamma_pos(m_ + 1.0) + _lgamma_pos(n_b - m_ + 1.0)

    def candidate(uu, vv):
        us = 0.5 - jnp.abs(uu)
        k = jnp.floor((2.0 * a / jnp.maximum(us, 1e-8) + b) * uu + c)
        in_range = (k >= 0.0) & (k <= n_b)
        squeeze = (us >= 0.07) & (vv <= vr)
        v2 = jnp.log(jnp.maximum(vv, _TINY) * alpha
                     / (a / jnp.maximum(us * us, 1e-12) + b))
        t = (h - _lgamma_pos(k + 1.0) - _lgamma_pos(n_b - k + 1.0)
             + (k - m_) * lpq)
        return k, in_range & (squeeze | (v2 <= t))

    k_acc = jnp.zeros_like(n)
    done = jnp.zeros(n.shape, jnp.bool_)
    n_rounds = (len(uniforms) - 1) // 2
    for r in range(n_rounds):
        k, ok = candidate(uniforms[1 + 2 * r] - 0.5, uniforms[2 + 2 * r])
        k_acc = jnp.where(~done & ok, k, k_acc)
        done = done | ok
    # astronomically-rare leftover: the binomial mode
    k_acc = jnp.where(done, k_acc, m_)

    y = jnp.where(small, x_inv, k_acc)
    return jnp.where(flip, n - y, y)


def _alloc_kernel(N, n2, use_prng, *refs):
    """One G-tile of the whole allocation tree, VMEM-resident.

    Ref layout: [seed|u], M, P, A, E  ->  Zsum_g (accumulated), Zsum_k.
    """
    if use_prng:
        (seed_ref, M_ref, P_ref, A_ref, E_ref, zg_ref, zk_ref) = refs
    else:
        (u_ref, M_ref, P_ref, A_ref, E_ref, zg_ref, zk_ref) = refs
    gi = pl.program_id(0)
    if use_prng:
        # Mosaic accepts at most 2 seed words: fold the grid index into the
        # first key word (Knuth multiplicative mix) for a distinct
        # per-G-tile stream
        pltpu.prng_seed(seed_ref[0] + gi * jnp.int32(-1640531527),
                        seed_ref[1])

    def fresh_uniform(shape):
        bits = pltpu.prng_random_bits(shape)
        return ((bits & 0xFFFFFF).astype(jnp.float32) * (2.0 ** -24)
                + (2.0 ** -25))

    M = M_ref[:]
    P = P_ref[:]
    E = E_ref[:]

    # bottom-up node weights; padding components carry None (exact zero
    # weight — they receive exactly zero counts by construction)
    leaves = [P[:, n:n + 1] * A_ref[n, 0] * E[n:n + 1, :] for n in range(N)]
    leaves += [None] * (n2 - N)
    levels = [leaves]
    while len(levels[-1]) > 1:
        prev = levels[-1]
        cur = []
        for a_, b_ in zip(prev[0::2], prev[1::2]):
            cur.append(a_ if b_ is None else a_ + b_)
        levels.append(cur)
    total = levels[-1][0]
    counts = [jnp.where(total > 0.0, M, 0.0)]  # all-zero-weight cell guard

    # top-down conditional-binomial splits, fully unrolled (n2 - 1 nodes)
    node_j = 0
    for li in range(len(levels) - 2, -1, -1):
        child = levels[li]
        nxt = []
        for pi, cnt in enumerate(counts):
            wl = child[2 * pi]
            wr = child[2 * pi + 1] if 2 * pi + 1 < len(child) else None
            if cnt is None or wr is None:
                # padding parent, or right child has exact-zero weight:
                # everything goes left, no randomness consumed
                nxt.append(cnt)
                nxt.append(None)
                continue
            wp = wl + wr
            q = jnp.clip(wl / jnp.maximum(wp, 1e-30), 0.0, 1.0)
            degen = (q <= 0.0) | (q >= 1.0) | (cnt <= 0.0)
            q_c = jnp.where(degen, 0.5, q)
            n_c = jnp.where(degen, 0.0, cnt)
            if use_prng:
                planes = [fresh_uniform(cnt.shape)
                          for _ in range(N_PLANES + 2 * _FB_ROUNDS)]
            else:
                planes = [u_ref[r, node_j] for r in range(N_PLANES)]
            left = _binomial_tile(n_c, q_c, planes)
            left = jnp.minimum(left, cnt)
            left = jnp.where(q >= 1.0, cnt, left)
            left = jnp.where((q <= 0.0) | (cnt <= 0.0), 0.0, left)
            nxt.append(left)
            nxt.append(cnt - left)
            node_j += 1
        counts = nxt

    @pl.when(gi == 0)
    def _init():
        zg_ref[:] = jnp.zeros(zg_ref.shape, zg_ref.dtype)

    for n in range(N):
        cnt_n = counts[n]  # (K, Gt) latent counts for component n
        zk_ref[n:n + 1, :] = jnp.sum(cnt_n, axis=0, keepdims=True)
        zg_ref[:, n:n + 1] = zg_ref[:, n:n + 1] + jnp.sum(
            cnt_n, axis=1, keepdims=True)


def _pick_tile(K: int, G: int, n2: int) -> int:
    """Largest 128-multiple G-tile keeping the tree working set ~<= 6 MB of
    VMEM (about 3*n2 live (K, Gt) f32 arrays: weights + counts + temps)."""
    budget = 6 * 1024 * 1024
    per_g = 3 * n2 * K * 4
    t = max(budget // per_g, 128)
    t = (t // 128) * 128
    return int(min(t, -(-G // 128) * 128))


@functools.partial(jax.jit, static_argnames=("interpret",))
def allocate_counts_fused(key, M, P, A, E, interpret: bool | None = None):
    """Draw the multinomial latent-count marginal sums in ONE Pallas kernel.

    Same contract as ops.allocation.allocate_counts: returns
    (Zsum_g (K, N), Zsum_k (N, G)). ``interpret=None`` auto-selects: compiled
    with in-kernel PRNG on TPU, interpret mode with a pre-drawn uniform
    operand elsewhere (pltpu.prng_* has no CPU lowering).
    """
    K, N = P.shape
    G = E.shape[1]
    n2 = 1 << max(int(math.ceil(math.log2(max(N, 1)))), 0)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    use_prng = not interpret

    Gt = _pick_tile(K, G, n2)
    Gp = -(-G // Gt) * Gt
    if Gp != G:
        # zero-weight padding cells allocate exactly zero counts
        M = jnp.pad(M, ((0, 0), (0, Gp - G)))
        E = jnp.pad(E, ((0, 0), (0, Gp - G)))
    grid = Gp // Gt

    kern = functools.partial(_alloc_kernel, N, n2, use_prng)
    vmem = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((K, Gt), lambda i: (0, i), memory_space=vmem),   # M
        pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=vmem),    # P
        pl.BlockSpec((N, 1), lambda i: (0, 0), memory_space=vmem),    # A
        pl.BlockSpec((N, Gt), lambda i: (0, i), memory_space=vmem),   # E
    ]
    out_specs = [
        pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=vmem),    # Zsum_g
        pl.BlockSpec((N, Gt), lambda i: (0, i), memory_space=vmem),   # Zsum_k
    ]
    out_shape = [
        jax.ShapeDtypeStruct((K, N), jnp.float32),
        jax.ShapeDtypeStruct((N, Gp), jnp.float32),
    ]
    if use_prng:
        raw = jax.random.key_data(key) if jnp.issubdtype(
            key.dtype, jax.dtypes.prng_key) else key
        seed = jax.lax.bitcast_convert_type(
            raw.reshape(2), jnp.int32)
        first = pl.BlockSpec(memory_space=pltpu.SMEM)
        args = (seed,)
    else:
        n_nodes = max(n2 - 1, 1)
        u = jax.random.uniform(
            jax.random.fold_in(key, 0),
            (N_PLANES, n_nodes, K, Gp), jnp.float32, minval=_TINY)
        first = pl.BlockSpec((N_PLANES, n_nodes, K, Gt),
                             lambda i: (0, 0, 0, i), memory_space=vmem)
        args = (u,)

    zg, zk = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[first] + in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args, jnp.asarray(M, jnp.float32), P,
      jnp.asarray(A, jnp.float32).reshape(N, 1), E)
    return zg, zk[:, :G]
