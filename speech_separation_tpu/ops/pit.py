"""Permutation-invariant training (PIT) loss ops.

The reference's uPIT objective (archs/uPIT.py:157-206): elementwise MSE
between masked mixture and each of the num_spk! permutations of the source
magnitudes, summed per utterance, minimum over permutations;
loss = sum_b min_perm / num_spk, norm = sum(lengths) * feat_dim, and the
scalar optimized is loss / norm.

TPU formulation: the per-permutation error decomposes into pairwise errors
    E[b, i, j] = sum_{t,f} (masked_i[b,t,f] - source_j[b,t,f])^2
so we compute the (B, S, S) pairwise matrix once (one fused reduction —
XLA never materializes the (B,T,S,S,F) broadcast) and sum E along each of
the S! permutations (S! is tiny: num_spk <= 3 in practice). This does
S^2 work instead of S! full-tensor passes.

Padding is harmless by construction, exactly as in the reference: the mix is
zero-padded, so masked estimates are zero there, and sources are zero-padded
too — the pairwise errors at padded positions vanish.
"""

from __future__ import annotations

import itertools
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def make_permutations(num_spk: int) -> np.ndarray:
    """(S!, S) int32 array of all permutations, itertools order —
    the same order the reference enumerates (archs/uPIT.py:186)."""
    return np.asarray(list(itertools.permutations(range(num_spk))), dtype=np.int32)


def pairwise_mse(masked: jnp.ndarray, sources: jnp.ndarray) -> jnp.ndarray:
    """E[b, i, j] = sum_{t,f} (masked[b,:,i,:] - sources[b,j])^2.

    masked:  (B, T, S, F) — per-source masked mixture estimates
    sources: (B, S, T, F) — ground-truth source magnitudes
    Returns (B, S_est, S_src) float32.
    """
    diff = masked.transpose(0, 2, 1, 3)[:, :, None, :, :] - sources[:, None, :, :, :]
    return jnp.sum(jnp.square(diff), axis=(3, 4))


def permutation_min_loss(pair_err: jnp.ndarray, num_spk: int):
    """Min-over-permutations assignment from the pairwise error matrix.

    Returns (min_losses (B,), best_perm_idx (B,) int32) where
    min_losses[b] = min_p sum_i pair_err[b, i, perms[p, i]].
    """
    perms = jnp.asarray(make_permutations(num_spk))  # (P, S)
    # per-permutation total: gather pair_err[b, i, perms[p, i]] and sum over i
    # (B, P, S) -> (B, P)
    idx = perms.T[None, :, :]                        # (1, S, P)
    gathered = jnp.take_along_axis(pair_err, jnp.broadcast_to(idx, (pair_err.shape[0],) + idx.shape[1:]), axis=2)
    per_perm = jnp.sum(gathered, axis=1)             # (B, P)
    best = jnp.argmin(per_perm, axis=1)
    return jnp.min(per_perm, axis=1), best.astype(jnp.int32)
