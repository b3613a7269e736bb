"""Fused waveform->waveforms pipeline: must agree with the staged path
(masks npz -> masked iSTFT) on the same model."""

import os

import numpy as np
import pytest

import jax

from speech_separation_tpu.dsp import STFTConfig, stft_np, istft_np
from speech_separation_tpu.models import upit
from speech_separation_tpu.train.checkpoint import save_checkpoint
from speech_separation_tpu.eval.pipeline import SeparationPipeline


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    cfg = upit.Config(feat_dim=257, num_spk=2, hidden=16, num_layers=1,
                      zero_init_hidden=True)
    params, state = upit.init(jax.random.PRNGKey(0), cfg)
    path = str(root / "model.mdl")
    save_checkpoint(path, params=params, state=state, epoch=0,
                    meta={"arch": "uPIT"})
    return path, cfg, params, state


def test_fused_pipeline_matches_staged(tiny_model):
    model_path, cfg, params, state = tiny_model
    kwargs = {"hidden": "16", "num_layers": "1", "zero_init_hidden": "1"}
    pipe = SeparationPipeline(model_path, model_kwargs=kwargs,
                              batch_size=4, length_quantum=4096)

    rng = np.random.default_rng(0)
    signals = [rng.standard_normal(n).astype(np.float32) * 0.1
               for n in (7000, 5000, 3210)]
    outs = pipe.separate(signals)

    scfg = STFTConfig()
    for sig, ests in zip(signals, outs):
        assert len(ests) == 2
        # staged computation in numpy for this utterance
        spec = stft_np(sig, scfg.n_fft, scfg.hop)  # (F, T) complex
        mag = np.abs(spec).T[None]  # (1, T, F)
        T_i = spec.shape[1]
        import jax.numpy as jnp
        batch = {"mix": jnp.asarray(mag),
                 "lengths": jnp.asarray([T_i], dtype=jnp.int32),
                 "row_mask": jnp.ones((1,), jnp.float32)}
        masks = np.asarray(upit.infer_masks(cfg, params, state, batch,
                                            jax.random.PRNGKey(0)))[0]
        for s, est in enumerate(ests):
            m = masks[:T_i, s * 257:(s + 1) * 257].T  # (F, T)
            ref = istft_np(spec * m, scfg.hop)
            assert len(est) == len(ref)
            np.testing.assert_allclose(est, ref, atol=2e-4)


def test_pipeline_bucket_reuse(tiny_model):
    model_path, *_ = tiny_model
    kwargs = {"hidden": "16", "num_layers": "1", "zero_init_hidden": "1"}
    pipe = SeparationPipeline(model_path, model_kwargs=kwargs,
                              batch_size=2, length_quantum=4096)
    rng = np.random.default_rng(1)
    sigs = [rng.standard_normal(3000).astype(np.float32) for _ in range(5)]
    outs = pipe.separate(sigs)
    assert len(outs) == 5
    assert len(pipe._fns) == 1  # same bucket -> one executable
