"""ops/mxu.head_dot: the mask-head matmul in the model's MXU dtype.

The bf16 path must produce the cast-dot primal exactly, and its
(XLA-autodiff) gradients must stay within bf16 rounding of full-f32
autodiff — the guarantee the perf path's numerics envelope rests on."""

import numpy as np
import jax
import jax.numpy as jnp

from speech_separation_tpu.ops.mxu import head_dot


def _vals(seed=0, B=3, T=17, K=24, O=10):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, O)) / np.sqrt(K), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, T, O)), jnp.float32)
    return x, w, g


def test_f32_path_is_plain_dot():
    x, w, _ = _vals()
    got = head_dot(x, w, jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x @ w))


def test_bf16_primal_matches_cast_dot():
    x, w, _ = _vals()
    got = head_dot(x, w, jnp.bfloat16)
    ref = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bf16_grads_close_to_f32_grads():
    """bf16-input autodiff must agree with full-f32 autodiff to bf16
    rounding error (the operands are rounded; the cotangent stays f32)."""
    x, w, g = _vals()

    def loss_bf16(x, w):
        return jnp.vdot(head_dot(x, w, jnp.bfloat16), g)

    def loss_ref(x, w):
        return jnp.vdot(x @ w, g)

    dx_c, dw_c = jax.grad(loss_bf16, argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    for c, r in ((dx_c, dx_r), (dw_c, dw_r)):
        c, r = np.asarray(c), np.asarray(r)
        # bf16 rounding class: ~0.4% relative per entry plus absolute
        # accumulation error scaled to the array's magnitude (near-zero
        # entries see cancellation of O(scale) rounded terms)
        tol = 0.02 * np.abs(r) + 0.03 * np.max(np.abs(r))
        assert np.all(np.abs(c - r) <= tol), \
            np.max((np.abs(c - r) - tol) / np.max(np.abs(r)))
        assert c.dtype == np.float32


def test_bf16_grads_under_jit_and_vmap_shapes():
    # 2D input (the RSH per-pass shape after reshape) also works
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((40, 24)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((24, 8)), jnp.float32)
    f = jax.jit(lambda x, w: jnp.sum(head_dot(x, w, jnp.bfloat16) ** 2))
    dx, dw = jax.grad(f, argnums=(0, 1))(x, w)
    assert dx.shape == x.shape and dw.shape == w.shape
    assert np.all(np.isfinite(np.asarray(dx)))
