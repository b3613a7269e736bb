"""The opt-in fused-attention SepFormer config (fused_attention=1) must
reproduce the einsum path through a full train step — the knob changes
the attention implementation, never the numbers."""

import numpy as np

import jax

from speech_separation_tpu.models import sepformer
from speech_separation_tpu.train.loop import (TrainLoopConfig, make_optimizer,
                                              make_update_step)


def _loss_and_grads(fused: bool):
    cfg = sepformer.Config(n_filters=8, filter_len=16, stride=8, channels=8,
                           heads=2, d_ff=16, chunk=8, blocks=2, num_spk=2,
                           fused_attention=fused)
    params, state = sepformer.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, L = 4, 512
    srcs = (0.1 * rng.standard_normal((B, 2, L))).astype(np.float32)
    batch = {"mix_wav": srcs.sum(axis=1), "source_wavs": srcs,
             "sample_lengths": np.asarray([512, 400, 300, 512], np.int32),
             "row_mask": np.ones(B, np.float32)}

    def loss_of(p):
        loss, _aux = sepformer.loss_fn(cfg, p, state, batch,
                                       jax.random.PRNGKey(1), train=True)
        return loss

    loss, grads = jax.value_and_grad(loss_of)(params)
    return float(loss), jax.tree_util.tree_leaves(grads)


def test_fused_attention_matches_einsum_loss_and_grads():
    """Loss and raw gradients agree to f32 tolerance. (Post-Adam params
    are NOT compared: Adam's m/sqrt(v) first-step normalization turns a
    noise-level gradient difference into a +-lr sign flip.)"""
    loss_e, grads_e = _loss_and_grads(False)
    loss_f, grads_f = _loss_and_grads(True)
    np.testing.assert_allclose(loss_f, loss_e, rtol=1e-5)
    for a, b in zip(grads_e, grads_f):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=1e-5 + 1e-4 * np.abs(b).max())


def test_fused_attention_kwarg_coercion():
    cfg = sepformer.Config.from_kwargs(fused_attention="1")
    assert cfg.fused_attention is True
    cfg = sepformer.Config.from_kwargs(fused_attention="0")
    assert cfg.fused_attention is False
