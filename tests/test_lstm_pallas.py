"""Pallas LSTM sequence kernel: forward and gradient parity against a plain
JAX reference recurrence (interpret mode on CPU; the same kernel compiles
for TPU unchanged)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.ops.lstm_pallas import lstm_seq, lstm_seq_fwd


def _reference_lstm(xw, w_hh, h0, c0, lengths):
    """Straightforward masked recurrence (float32, lax.scan)."""
    T, D, B, G = xw.shape
    H = G // 4
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(jnp.float32)

    def step(carry, inp):
        h, c = carry
        xw_t, m = inp  # (D,B,G), (B,)
        m = m[None, :, None]
        gates = xw_t + jnp.matmul(h, w_hh, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        h2 = m * h_new + (1 - m) * h
        c2 = m * c_new + (1 - m) * c
        return (h2, c2), m * h_new

    (hT, cT), ys = jax.lax.scan(step, (h0, c0), (xw, mask))
    return ys, hT, cT


def _setup(T=12, D=2, B=4, H=8, seed=0):
    rng = np.random.default_rng(seed)
    G = 4 * H
    xw = jnp.asarray(rng.standard_normal((T, D, B, G)).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.standard_normal((D, H, G)).astype(np.float32) * 0.3)
    h0 = jnp.asarray(rng.standard_normal((D, B, H)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((D, B, H)).astype(np.float32))
    lengths = jnp.asarray([T, T - 3, 5, 1], dtype=jnp.int32)
    return xw, w, h0, c0, lengths


def test_forward_matches_reference():
    xw, w, h0, c0, lengths = _setup()
    # f32 saved activations -> exact ys (default bf16 trades ys precision
    # for HBM traffic on the perf path)
    ys, h_last, c_last = lstm_seq(xw, w, h0, c0, lengths, jnp.float32)
    ys_ref, h_ref, c_ref = _reference_lstm(xw, w, h0, c0, lengths)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_last), np.asarray(c_ref), atol=2e-5)


def test_forward_saved_activations_shapes():
    xw, w, h0, c0, lengths = _setup()
    ys, cs, gates, h_last, c_last = lstm_seq_fwd(xw, w, h0, c0, lengths)
    assert cs.shape == ys.shape
    assert ys.dtype == jnp.bfloat16  # save_dtype governs ys too
    assert gates.shape == xw.shape and gates.dtype == jnp.bfloat16


@pytest.mark.parametrize("save_dtype,tol", [(jnp.float32, 2e-5),
                                            (jnp.bfloat16, 2e-2)])
def test_gradients_match_reference(save_dtype, tol):
    """f32-saved activations give exact gradients; bf16 (the perf path)
    is accurate to ~1e-3 relative."""
    xw, w, h0, c0, lengths = _setup()

    def loss_pallas(xw, w, h0, c0):
        ys, h_last, c_last = lstm_seq(xw, w, h0, c0, lengths, save_dtype)
        return (jnp.sum(ys ** 2) + jnp.sum(jnp.sin(h_last))
                + jnp.sum(c_last ** 2) * 0.1)

    def loss_ref(xw, w, h0, c0):
        ys, h_last, c_last = _reference_lstm(xw, w, h0, c0, lengths)
        return (jnp.sum(ys ** 2) + jnp.sum(jnp.sin(h_last))
                + jnp.sum(c_last ** 2) * 0.1)

    lp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2, 3))(xw, w, h0, c0)
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(xw, w, h0, c0)
    # with bf16 saved activations the loss itself is computed on bf16 ys
    np.testing.assert_allclose(float(lp), float(lr),
                               rtol=1e-5 if save_dtype == jnp.float32 else 2e-3)
    names = ["dxw", "dw_hh", "dh0", "dc0"]
    for name, a, b in zip(names, gp, gr):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, atol=tol,
                                   err_msg=name)


def test_gradient_masked_steps_zero():
    """dxw must be exactly zero at steps past each row's length."""
    xw, w, h0, c0, lengths = _setup()

    def loss(xw):
        ys, h_last, c_last = lstm_seq(xw, w, h0, c0, lengths, jnp.float32)
        return jnp.sum(ys ** 2) + jnp.sum(h_last ** 2)

    dxw = np.asarray(jax.grad(loss)(xw))
    T = xw.shape[0]
    for b, L in enumerate(np.asarray(lengths)):
        assert np.all(dxw[L:, :, b, :] == 0.0), f"row {b}"


def test_infer_kernel_matches_training_forward():
    from speech_separation_tpu.ops.lstm_pallas import lstm_seq_infer
    xw, w, h0, c0, lengths = _setup(seed=5)
    ys_t, h_t, c_t = lstm_seq(xw, w, h0, c0, lengths, jnp.float32)
    ys_i, h_i, c_i = lstm_seq_infer(xw, w, h0, c0, lengths)
    np.testing.assert_allclose(np.asarray(ys_i), np.asarray(ys_t), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_i), np.asarray(h_t), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_i), np.asarray(c_t), atol=1e-6)


def test_suffix_direction_gradients_match_reference():
    """suffix_dirs marks flipped-input directions (the BLSTM backward
    direction): forward and gradients must match a scan reference built on
    the same flip + suffix-mask formulation."""
    xw, w, h0, c0, lengths = _setup(T=10, D=2, B=4, H=8, seed=3)
    T = xw.shape[0]

    def ref(xw, w, h0, c0, lengths):
        mask_f = (jnp.arange(T)[:, None] < lengths[None, :]).astype(jnp.float32)
        mask_b = jnp.flip(mask_f, axis=0)  # suffix mask
        mask = jnp.stack([mask_f, mask_b], axis=1)[:, :, :, None]

        def step(carry, inp):
            h, c = carry
            xw_t, m = inp
            gates = xw_t + jnp.matmul(h, w, preferred_element_type=jnp.float32)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (m * h_new + (1 - m) * h, m * c_new + (1 - m) * c), m * h_new

        (hT, cT), ys = jax.lax.scan(step, (h0, c0), (xw, mask))
        return ys, hT, cT

    def loss_k(xw, w, h0, c0):
        ys, hl, cl = lstm_seq(xw, w, h0, c0, lengths, jnp.float32,
                              (False, True))
        return jnp.sum(ys ** 2) + jnp.sum(hl * cl)

    def loss_r(xw, w, h0, c0):
        ys, hl, cl = ref(xw, w, h0, c0, lengths)
        return jnp.sum(ys ** 2) + jnp.sum(hl * cl)

    lk, gk = jax.value_and_grad(loss_k, argnums=(0, 1, 2, 3))(xw, w, h0, c0)
    lr, gr = jax.value_and_grad(loss_r, argnums=(0, 1, 2, 3))(xw, w, h0, c0)
    np.testing.assert_allclose(float(lk), float(lr), rtol=1e-5)
    for a, b in zip(gk, gr):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-5)
