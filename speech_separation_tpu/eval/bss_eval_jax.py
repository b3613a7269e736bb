"""BSS-eval on device: batched, complex-free, jit-compiled.

The host numpy implementation (bss_eval.py) scores ~1 utterance/second on
this class of host; a 3k-utterance test set takes an hour of scarce CPU.
This version runs the whole metric on the TPU:

- all correlations (the Gram matrix of delayed sources and the
  source/estimate cross-correlations) are plain matmuls against a
  shifted-copies matrix — no FFT, no complex dtypes (the TPU backend has
  neither), and the MXU eats the O(n^2 * L * flen) work;
- the (n*flen)^2 normal-equation solves are batched jnp.linalg.solve
  calls, with two steps of iterative refinement to recover float64-grade
  accuracy from the float32 factorization (the Gram systems are
  ill-conditioned for correlated speech);
- zero-padding utterances to a common length provably does not change any
  of the quantities (zeros contribute nothing to correlations, and the
  projection/artifact supports stay inside the padded window), so ragged
  test sets batch exactly.

Status: EXPERIMENTAL throughput path. Measured on a v5e core against the
float64 host implementation with strongly-correlated AR(0.95) material:
SIR within ~0.05 dB, SDR within ~0.5 dB, SAR within ~2 dB — the float32
Gram entries, not the solve, limit accuracy on near-singular systems
(iterative refinement cannot recover information lost when forming G).
The numpy/float64 implementation in bss_eval.py remains the default for
scoring; use this for quick large-scale sweeps where 0.5 dB slack is
acceptable (it scores ~0.1 s/utterance after a large one-time compile).
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _shifted_matrix(x: jnp.ndarray, flen: int, out_len: int) -> jnp.ndarray:
    """(..., L) -> (..., flen, out_len): row a = x delayed by a samples."""
    L = x.shape[-1]
    pad = jnp.zeros(x.shape[:-1] + (flen - 1,), x.dtype)
    xp = jnp.concatenate([pad, x, jnp.zeros(x.shape[:-1] + (out_len - L,), x.dtype)],
                         axis=-1)
    # row a reads xp starting at flen-1-a
    idx = (flen - 1 - np.arange(flen))[:, None] + np.arange(out_len)[None, :]
    return jnp.take(xp, jnp.asarray(idx), axis=-1)


def _refined_solve(G, D, iters: int = 2):
    """Batched solve with iterative refinement in float32."""
    x = jnp.linalg.solve(G, D)
    for _ in range(iters):
        r = D - jnp.matmul(G, x)
        x = x + jnp.linalg.solve(G, r)
    return x


@partial(jax.jit, static_argnames=("flen", "compute_permutation"))
def _bss_eval_batch(refs: jnp.ndarray, ests: jnp.ndarray, flen: int,
                    compute_permutation: bool):
    """refs, ests: (B, n, L) float32, zero-padded. Returns per-permutation-
    selected (sdr, sir, sar, perm) each (B, n)."""
    B, n, L = refs.shape
    out_len = L + flen - 1

    # shifted source copies: (B, n, flen, out_len)
    S = jax.vmap(lambda r: _shifted_matrix(r, flen, out_len))(refs)
    Sf = S.reshape(B, n * flen, out_len)

    # Gram of delayed sources (shared by every estimate): (B, nf, nf)
    G = jnp.matmul(Sf, jnp.swapaxes(Sf, 1, 2),
                   precision=jax.lax.Precision.HIGHEST)
    ests_pad = jnp.concatenate(
        [ests, jnp.zeros((B, n, out_len - L), ests.dtype)], axis=-1)
    # D[b, k, i*flen+a] = <est_k, S_i delayed a> : (B, n_est, nf)
    D = jnp.einsum("bkl,bfl->bkf", ests_pad, Sf,
                   precision=jax.lax.Precision.HIGHEST)

    # joint projection coefficients for every estimate: solve G C^T = D^T
    C_all = _refined_solve(G, jnp.swapaxes(D, 1, 2))        # (B, nf, n_est)
    P_all = jnp.einsum("bfk,bfl->bkl", C_all, Sf,
                       precision=jax.lax.Precision.HIGHEST)  # (B, n_est, out)

    # per-target projections: for each target j, the flen x flen diagonal
    # block of G and the matching slice of D
    Gd = G.reshape(B, n, flen, n, flen)
    G_j = jnp.stack([Gd[:, j, :, j, :] for j in range(n)], axis=1)  # (B,n,flen,flen)
    D_j = D.reshape(B, n, n, flen)                                  # (B,k,j,flen)
    # solve per (k, j): lay out (B, j, flen, k)
    rhs = jnp.swapaxes(D_j, 1, 2).transpose(0, 1, 3, 2)             # (B,j,flen,k)
    C_t = _refined_solve(G_j, rhs)                                  # (B,j,flen,k)
    # s_target[b,k,j,:] = C_t[b,j,:,k] @ S[b,j]
    s_target = jnp.einsum("bjfk,bjfl->bkjl", C_t, S,
                          precision=jax.lax.Precision.HIGHEST)

    e_interf = P_all[:, :, None, :] - s_target                      # (B,k,j,out)
    e_artif = ests_pad[:, :, None, :] - P_all[:, :, None, :]

    def ratio_db(num, den):
        return 10.0 * jnp.log10(jnp.sum(num ** 2, -1) / jnp.sum(den ** 2, -1))

    sdr_m = ratio_db(s_target, e_interf + e_artif)  # (B, k, j)
    sir_m = ratio_db(s_target, e_interf)
    sar_m = ratio_db(s_target + e_interf, e_artif)

    if not compute_permutation:
        idx = jnp.arange(n)
        eye = (sdr_m[:, idx, idx], sir_m[:, idx, idx], sar_m[:, idx, idx],
               jnp.broadcast_to(idx, (B, n)))
        return eye

    perms = np.asarray(list(itertools.permutations(range(n))))  # (P, n)
    rows = np.arange(n)
    per_perm_sir = jnp.stack(
        [sir_m[:, rows, p].mean(axis=1) for p in perms], axis=1)  # (B, P)
    best = jnp.argmax(per_perm_sir, axis=1)                       # (B,)
    perm_table = jnp.asarray(perms)
    chosen = perm_table[best]                                     # (B, n)

    # gather m[b, k, chosen[b, k]]
    def select(m):
        return jnp.take_along_axis(m.reshape(B, n, n),
                                   chosen[:, :, None], axis=2)[:, :, 0]
    return select(sdr_m), select(sir_m), select(sar_m), chosen


def bss_eval_sources_batch(reference_sources, estimated_sources,
                           lengths=None, compute_permutation=True,
                           flen: int = 512, max_batch: int = 8):
    """Device BSS-eval over a batch of utterances.

    Args:
      reference_sources, estimated_sources: (B, n, L) arrays (numpy or jax),
        zero-padded to a common L (padding does not affect the metrics).
      lengths: unused (kept for API symmetry) — zero padding is exact.
      max_batch: device sub-batch size (the shifted-copies matrix is
        ~n*flen*L*4 bytes per utterance).

    Returns (sdr, sir, sar, perm) numpy arrays, each (B, n).
    """
    refs = np.asarray(reference_sources, np.float32)
    ests = np.asarray(estimated_sources, np.float32)
    B = refs.shape[0]
    outs = []
    for s in range(0, B, max_batch):
        chunk = slice(s, min(s + max_batch, B))
        r = _bss_eval_batch(jnp.asarray(refs[chunk]), jnp.asarray(ests[chunk]),
                            flen, compute_permutation)
        outs.append(tuple(np.asarray(x) for x in r))
    sdr = np.concatenate([o[0] for o in outs])
    sir = np.concatenate([o[1] for o in outs])
    sar = np.concatenate([o[2] for o in outs])
    perm = np.concatenate([o[3] for o in outs])
    return sdr, sir, sar, perm
