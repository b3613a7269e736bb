"""MXU-dtype matmul helpers.

`jnp.dot(x.astype(bf16), w.astype(bf16), preferred_element_type=f32)` runs
the FORWARD on the MXU at full bf16 rate, but its autodiff backward
receives a float32 cotangent (the primal output is f32), so both gradient
matmuls (dx = g @ w^T, dw = x^T @ g) promote to float32 — a fraction of
the MXU's bf16 throughput. ``head_dot`` fixes that with a custom VJP that
rounds the cotangent to bfloat16 once and keeps both gradient matmuls on
the bf16 path (float32 accumulation via preferred_element_type, exactly
like the forward).

Numerics: the bf16 perf path already rounds activations and gate inputs
to bf16 (models/blstm.py, ops/lstm_pallas.py); rounding the head
cotangent is the same class of error (~1e-2 relative on gradients) and
does not touch the float32 parity path (compute_dtype='float32' uses the
plain dot).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _dot_bf16(x, w):
    return jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _dot_bf16_fwd(x, w):
    x16 = x.astype(jnp.bfloat16)
    w16 = w.astype(jnp.bfloat16)
    return (jnp.dot(x16, w16, preferred_element_type=jnp.float32),
            (x16, w16))


def _dot_bf16_bwd(res, g):
    x16, w16 = res
    g16 = g.astype(jnp.bfloat16)
    dx = jnp.dot(g16, w16.T, preferred_element_type=jnp.float32)
    # contract every leading (batch/time) axis: (..., K)^T @ (..., O)
    n_batch = g16.ndim - 1
    dims = (tuple(range(n_batch)), tuple(range(n_batch)))
    dw = jax.lax.dot_general(x16, g16, ((dims), ((), ())),
                             preferred_element_type=jnp.float32)
    return dx, dw


_dot_bf16.defvjp(_dot_bf16_fwd, _dot_bf16_bwd)


def head_dot(y, w, dtype):
    """y @ w with MXU dtype ``dtype``; f32 output. In bfloat16 mode the
    gradient matmuls also run bf16 (see module docstring)."""
    if dtype == jnp.bfloat16:
        return _dot_bf16(y, w)
    return jnp.dot(y.astype(dtype), w.astype(dtype),
                   preferred_element_type=jnp.float32)
