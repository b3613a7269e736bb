"""The bf16 perf path of every conv/attention arch, exercised end to end.

The production config runs these models with compute_dtype="bfloat16",
which since round 4 also sets the activation STORAGE dtype (halving the
HBM bytes of the bandwidth-bound block stacks — docs/performance.md).
Before this module existed, no test actually ran a bf16 forward for the
TCN-family archs: a dtype-mismatch crash in Conv-TasNet's depthwise conv
(bf16 activations vs f32 kernel) survived the whole suite. Each test here
runs loss + grad in both numeric configs and pins bf16 to f32 loosely —
these are tiny random models, so the check is "same computation, lower
precision", not convergence (PARITY.md covers that at scale).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import convtasnet as ct
from speech_separation_tpu.models import dprnn as dp
from speech_separation_tpu.models import sepformer as sf
from speech_separation_tpu.models import tcn


def _wave_batch(B=3, n=256, num_spk=2, seed=0, lengths=(256, 192, 130)):
    rng = np.random.default_rng(seed)
    srcs = (0.1 * rng.standard_normal((B, num_spk, n))).astype(np.float32)
    for i, L in enumerate(lengths):
        srcs[i, :, L:] = 0.0
    return {
        "mix_wav": jnp.asarray(srcs.sum(axis=1)),
        "source_wavs": jnp.asarray(srcs),
        "sample_lengths": jnp.asarray(np.asarray(lengths, np.int32)),
        "row_mask": jnp.ones((B,), jnp.float32),
    }


def _spec_batch(B=3, T=40, F=33, num_spk=2, seed=0, lengths=(40, 30, 17)):
    rng = np.random.default_rng(seed)
    mix = np.abs(rng.standard_normal((B, T, F))).astype(np.float32)
    srcs = np.abs(rng.standard_normal((B, num_spk, T, F))).astype(np.float32)
    for i, L in enumerate(lengths):
        mix[i, L:] = 0.0
        srcs[i, :, L:] = 0.0
    return {
        "mix": jnp.asarray(mix),
        "sources": jnp.asarray(srcs),
        "lengths": jnp.asarray(np.asarray(lengths, np.int32)),
        "row_mask": jnp.ones((B,), jnp.float32),
    }


def _loss_and_gradnorm(mod, cfg, batch):
    params, state = mod.init(jax.random.PRNGKey(0), cfg)

    def scalar(p):
        loss, _ = mod.loss_fn(cfg, p, state, batch, jax.random.PRNGKey(1),
                              True)
        return loss

    loss, grads = jax.value_and_grad(scalar)(params)
    gn = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                      for g in jax.tree_util.tree_leaves(grads)))
    return float(loss), float(gn)


CASES = [
    # (module, tiny kwargs, batch builder, rel tol on |loss| and gradnorm)
    (ct, dict(n_filters=32, filter_len=16, stride=8, channels=16, hidden=24,
              kernel=3, blocks=3, repeats=2), _wave_batch, 0.08),
    (dp, dict(n_filters=16, filter_len=16, stride=8, channels=12,
              rnn_hidden=10, chunk=8, blocks=2), _wave_batch, 0.08),
    (sf, dict(n_filters=16, filter_len=16, stride=8, channels=16, heads=2,
              d_ff=24, chunk=8, blocks=2), _wave_batch, 0.08),
    (tcn, dict(feat_dim=33, num_spk=2, channels=16, hidden=24, blocks=3,
               repeats=2), _spec_batch, 0.08),
]


@pytest.mark.parametrize("mod,kw,mk_batch,tol",
                         CASES, ids=[c[0].__name__.split(".")[-1]
                                     for c in CASES])
def test_bf16_loss_and_grad_match_f32(mod, kw, mk_batch, tol):
    """loss_fn + grad must RUN in compute_dtype=bfloat16 (same params, same
    batch) and land near the f32 values. Catches dtype-mismatch crashes on
    the storage-dtype path and gross numeric regressions alike."""
    batch = mk_batch()
    l32, g32 = _loss_and_gradnorm(mod, mod.Config(**kw), batch)
    l16, g16 = _loss_and_gradnorm(
        mod, mod.Config(compute_dtype="bfloat16", **kw), batch)
    assert np.isfinite(l16) and np.isfinite(g16)
    assert abs(l16 - l32) <= tol * max(abs(l32), 1.0)
    assert abs(g16 - g32) <= tol * max(g32, 1.0)


def test_convtasnet_causal_bf16_separate_runs():
    """The causal (streaming) Conv-TasNet config in bf16: separate() must
    run and return finite audio — the offline anchor for the streamed
    path's numeric config (eval/streaming.py uses the same dtypes)."""
    cfg = ct.Config(num_spk=2, causal=True, compute_dtype="bfloat16",
                    n_filters=32, filter_len=16, stride=8, channels=16,
                    hidden=24, kernel=3, blocks=3, repeats=2)
    params, state = ct.init(jax.random.PRNGKey(0), cfg)
    wav = jnp.asarray(0.1 * np.random.default_rng(2)
                      .standard_normal((2, 240)).astype(np.float32))
    n = jnp.asarray([240, 200], jnp.int32)
    out = np.asarray(ct.separate(cfg, params, state, wav, n))
    assert out.shape == (2, 2, 240) and np.isfinite(out).all()
