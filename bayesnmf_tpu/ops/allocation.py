"""Fused latent-count multinomial allocation (the Poisson-Gibbs hot op).

The reference draws, for every cell (k, g), Z[k,:,g] ~ Multinomial(M[k,g],
p ∝ P[k,:]*A*E[:,g]) in a K*G R-level loop (sample_Zkg, sample_params.R:253-265)
— its dominant cost. Downstream only the two marginal sums are consumed
(sample_Pn.R:100-114 needs Σ_g Z[k,n,·]; sample_En.R:99-113 needs Σ_k Z[·,n,g]),
so the K×N×G tensor is never materialized here.

TPU-native design: the multinomial is drawn as a chain of N-1 conditional
binomials, each a fully vectorized (K, G) ``jax.random.binomial`` draw on the
VPU, with the two partial sums accumulated in the scan carry. Cost is
O(N * K * G) vector work with O(K*N + N*G) output — bandwidth-optimal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def allocate_counts(key, M, P, A, E):
    """Draw Z ~ Multinomial(M[k,g], probs ∝ P[k,:]*A*E[:,g]) per cell and
    return its marginal sums without materializing Z.

    Args:
      key: PRNG key.
      M: (K, G) observed counts (float32, integer-valued).
      P: (K, N) signatures; A: (N,) inclusion; E: (N, G) exposures.

    Returns:
      Zsum_g: (K, N) = Σ_g Z[k, n, g]
      Zsum_k: (N, G) = Σ_k Z[k, n, g]

    If all weights in a cell are zero the cell allocates all-zero counts,
    matching the reference's guard (sample_params.R:257-261).
    """
    K, N = P.shape
    G = E.shape[1]
    PA = P * A[None, :]  # (K, N)

    # Unnormalized weights w_n[k,g] = PA[k,n] * E[n,g]; total = Mhat[k,g].
    total = jnp.dot(PA, E, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)  # (K, G)
    zero_cell = total <= 0.0

    keys = jax.random.split(key, N)

    def body(carry, inp):
        remaining, rem_weight, Zsum_g, Zsum_k = carry
        n, kk = inp
        w_n = jnp.outer(PA[:, n], E[n, :])  # (K, G) rank-1, VPU-cheap
        # conditional binomial prob q = w_n / remaining weight
        q = jnp.where(rem_weight > 0.0, w_n / jnp.maximum(rem_weight, 1e-30), 0.0)
        q = jnp.clip(q, 0.0, 1.0)
        z_n = jax.random.binomial(kk, remaining, q, dtype=jnp.float32)
        z_n = jnp.where(zero_cell, 0.0, jnp.minimum(z_n, remaining))
        Zsum_g = Zsum_g.at[:, n].set(jnp.sum(z_n, axis=1))
        Zsum_k = Zsum_k.at[n, :].set(jnp.sum(z_n, axis=0))
        return (remaining - z_n, rem_weight - w_n, Zsum_g, Zsum_k), None

    init = (
        jnp.asarray(M, jnp.float32),
        total,
        jnp.zeros((K, N), jnp.float32),
        jnp.zeros((N, G), jnp.float32),
    )
    ns = jnp.arange(N)
    (remaining, _, Zsum_g, Zsum_k), _ = jax.lax.scan(body, init, (ns, keys))

    # Numerical safety: any counts left by q-clipping round-off go to the last
    # active component (q==1 on the final step makes this a no-op in theory).
    # Find last n with any weight; add remaining there via argmax over reversed A.
    last_active = (N - 1) - jnp.argmax((A > 0)[::-1])
    leftover = jnp.where(zero_cell, 0.0, remaining)
    Zsum_g = Zsum_g.at[:, last_active].add(jnp.sum(leftover, axis=1))
    Zsum_k = Zsum_k.at[last_active, :].add(jnp.sum(leftover, axis=0))
    return Zsum_g, Zsum_k
