"""MXU-dtype matmul helper for the mask head.

``head_dot`` feeds the head matmul to the MXU in the model's compute
dtype (bf16 on the perf path) with float32 accumulation, and lets XLA
autodiff the backward.

A custom-VJP variant that rounded the backward's float32 cotangent to
bfloat16 (so both gradient matmuls dx = g·wᵀ and dw = xᵀ·g ran at the
bf16 MXU rate) was built and A/B-measured at reference scale with
tools/step_anatomy.py: the full step got SLOWER by 0.3–0.6 ms in two
independent clean-window runs. At this head size ((38400, 1200) x
(1200, 514)) the f32 gradient matmuls are already under 1 ms and partly
fused with the PIT-loss backward; the extra rounding pass and the fusion
barrier of a custom VJP cost more than the bf16 rate saves. The negative
result is recorded in docs/performance.md; the plain dot is the
measured winner.
"""

from __future__ import annotations

import jax.numpy as jnp


def head_dot(y, w, dtype):
    """y @ w with MXU input dtype ``dtype`` and float32 accumulation."""
    return jnp.dot(y.astype(dtype), w.astype(dtype),
                   preferred_element_type=jnp.float32)
