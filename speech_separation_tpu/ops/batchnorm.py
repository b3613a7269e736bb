"""Batch normalization with the reference's padded-statistics semantics.

The reference applies ``nn.BatchNorm1d(1200)`` to the *padded* output of
pad_packed_sequence (archs/uPIT.py:119,138; archs/RSH.py:159,178), so padding
frames — which the packed LSTM leaves as exact zeros — contribute to the
batch statistics. That is faithfully reproduced here (it is part of the
trained model's function, not a bug to fix silently): statistics are taken
over all (batch, time) positions of *real* rows, padding included.

``row_mask`` exists because the TPU pipeline pads the final partial batch
with dummy rows to keep shapes static; dummy rows are excluded from the
statistics so they are numerically invisible (the reference simply runs a
smaller last batch).

torch semantics matched exactly:
- normalization uses biased variance; the running-variance update uses the
  unbiased estimate (factor n/(n-1));
- running stats update: running = (1 - momentum) * running + momentum * stat
  with momentum = 0.1;
- eval mode normalizes with the running statistics.
"""

from __future__ import annotations

import jax.numpy as jnp


def init_batchnorm(num_channels: int):
    params = {"gamma": jnp.ones((num_channels,), jnp.float32),
              "beta": jnp.zeros((num_channels,), jnp.float32)}
    state = {"mean": jnp.zeros((num_channels,), jnp.float32),
             "var": jnp.ones((num_channels,), jnp.float32)}
    return params, state


def batchnorm_apply(params, state, x: jnp.ndarray, row_mask: jnp.ndarray,
                    train: bool, momentum: float = 0.1, eps: float = 1e-5):
    """Normalize x over (batch, time) per channel.

    Args:
      x: (B, T, C)
      row_mask: (B,) float32 — 1.0 for real rows, 0.0 for shape-padding
                dummy rows. Real rows contribute *all* their T positions
                (including padding frames), matching the reference.
      train: batch statistics + running update if True, running stats if not.

    Returns (y, new_state).
    """
    B, T, C = x.shape
    if train:
        rm = row_mask[:, None, None]
        n = jnp.sum(row_mask) * T
        mean = jnp.sum(x * rm, axis=(0, 1)) / n
        var = jnp.sum(jnp.square(x - mean) * rm, axis=(0, 1)) / n
        new_state = {
            "mean": (1.0 - momentum) * state["mean"] + momentum * mean,
            "var": (1.0 - momentum) * state["var"] + momentum * var * n / (n - 1.0),
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) / jnp.sqrt(var + eps)
    return y * params["gamma"] + params["beta"], new_state
