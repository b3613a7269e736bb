"""blstm_forward's Pallas path must agree with the lax.scan path
(interpret mode on CPU, float32 so the comparison is exact)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.models.blstm import (init_blstm_params,
                                                blstm_forward, random_hidden)


def test_blstm_pallas_matches_scan():
    B, T, F, H, L = 3, 20, 12, 16, 2
    params = init_blstm_params(jax.random.PRNGKey(0), F, H, L)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lengths = jnp.asarray([20, 13, 6], dtype=jnp.int32)
    h0, c0 = random_hidden(jax.random.PRNGKey(1), L, B, H)

    out_scan, (h_s, c_s) = blstm_forward(params, x, lengths, h0, c0,
                                         use_pallas=False)
    out_pl, (h_p, c_p) = blstm_forward(params, x, lengths, h0, c0,
                                       use_pallas=True)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_scan), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_s), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), atol=2e-5)


def test_blstm_pallas_grad_close_to_scan():
    B, T, F, H, L = 2, 12, 8, 8, 1
    params = init_blstm_params(jax.random.PRNGKey(2), F, H, L)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lengths = jnp.asarray([12, 7], dtype=jnp.int32)
    shape = (L, 2, B, H)
    h0 = jnp.zeros(shape); c0 = jnp.zeros(shape)

    def loss(p, use_pallas):
        out, _ = blstm_forward(p, x, lengths, h0, c0, use_pallas=use_pallas)
        return jnp.sum(out ** 2)

    g_scan = jax.grad(lambda p: loss(p, False))(params)
    g_pl = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pl),
                    jax.tree_util.tree_leaves(g_scan)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        # Pallas saves gate activations in bf16 -> ~1e-3 relative
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)


def test_pallas_rows_feasibility_gate():
    """The use_pallas=None auto-pick falls back to lax.scan when the
    kernel's K=1 per-step VMEM blocks would overflow the scoped ceiling
    (dual-path archs fold chunks into the row axis — rows can be huge)."""
    from speech_separation_tpu.models.blstm import pallas_rows_feasible

    # production shapes that must stay on the kernel: reference BLSTM
    # (B=100, H=600) and DPRNN dual-path scans (B*K=3200 rows, H=128)
    assert pallas_rows_feasible(100, 600)
    assert pallas_rows_feasible(3200, 128)
    # far past the ceiling: 16x the dual-path row count must fall back
    assert not pallas_rows_feasible(51200, 128)

    # monotone in rows: the gate can't re-enable at larger batches
    feas = [pallas_rows_feasible(r, 128) for r in
            (1, 100, 3200, 12800, 51200, 204800)]
    assert feas == sorted(feas, reverse=True)
