"""Fused chunk-attention kernel (ops/attention_pallas.py) vs the einsum
reference arithmetic — forward and custom-VJP gradients, f32 and the bf16
perf path, including fully-masked pad rows. Runs the kernel in interpret
mode on CPU (the TPU-world fake-backend discipline, tests/conftest.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.ops.attention_pallas import chunk_attention


def _reference(q, k, v, key_mask, scale):
    """models/sepformer.py's einsum arithmetic, folded heads: (N, T, dh)."""
    logits = jnp.einsum("nqd,nkd->nqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    logits = logits + (1.0 - key_mask)[:, None, :] * (-1e9)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("nqk,nkd->nqd", w, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _data(N=12, T=20, dh=8, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((N, T, dh)), dtype)
    k = jnp.asarray(rng.standard_normal((N, T, dh)), dtype)
    v = jnp.asarray(rng.standard_normal((N, T, dh)), dtype)
    # ragged key masks, including one fully-masked row (a pad chunk)
    lens = rng.integers(1, T + 1, size=N)
    lens[1] = 0
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    return q, k, v, jnp.asarray(mask)


def test_forward_matches_reference_f32():
    q, k, v, m = _data()
    scale = 1.0 / np.sqrt(q.shape[-1])
    got = chunk_attention(q, k, v, m)
    want = _reference(q, k, v, m, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_matches_reference_bf16():
    q, k, v, m = _data(dtype=jnp.bfloat16, seed=1)
    scale = 1.0 / np.sqrt(q.shape[-1])
    got = chunk_attention(q, k, v, m)
    want = _reference(q, k, v, m, scale)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_row_padding_is_invisible():
    """N not a multiple of the internal row block: outputs for the real
    rows are unchanged."""
    q, k, v, m = _data(N=13, seed=2)
    got = chunk_attention(q, k, v, m)
    want = _reference(q, k, v, m, 1.0 / np.sqrt(q.shape[-1]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_vjp_matches_reference_f32():
    q, k, v, m = _data(seed=3)
    scale = 1.0 / np.sqrt(q.shape[-1])

    def loss_kernel(q, k, v):
        o = chunk_attention(q, k, v, m)
        return jnp.sum(jnp.sin(o) * jnp.arange(o.size).reshape(o.shape))

    def loss_ref(q, k, v):
        o = _reference(q, k, v, m, scale)
        return jnp.sum(jnp.sin(o) * jnp.arange(o.size).reshape(o.shape))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"d{name}")


def test_vjp_bf16_close():
    q, k, v, m = _data(dtype=jnp.bfloat16, seed=4)

    def loss(fn, q, k, v):
        o = fn(q, k, v)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gk = jax.grad(lambda *a: loss(lambda q, k, v: chunk_attention(
        q, k, v, m), *a), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: loss(lambda q, k, v: _reference(
        q, k, v, m, 1.0 / np.sqrt(q.shape[-1])), *a),
        argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-2, err_msg=f"d{name}")


def test_jit_and_under_checkpoint():
    """The kernel must compose with jit and jax.checkpoint (SepFormer's
    remat path wraps the whole separator)."""
    q, k, v, m = _data(seed=5)

    @jax.jit
    def f(q, k, v):
        g = jax.checkpoint(lambda q, k, v: chunk_attention(q, k, v, m))
        return jnp.sum(g(q, k, v) ** 2)

    val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
