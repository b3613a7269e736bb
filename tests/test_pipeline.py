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


def test_best_source_perm_recovers_swaps():
    from speech_separation_tpu.eval.pipeline import _best_source_perm

    rng = np.random.default_rng(3)
    a = rng.standard_normal((3, 500)).astype(np.float32)
    noisy = a + 0.1 * rng.standard_normal((3, 500)).astype(np.float32)
    for perm in ([1, 0, 2], [2, 0, 1], [0, 1, 2]):
        got = _best_source_perm(a, noisy[perm])
        # applying got to the permuted rows must recover a's order
        np.testing.assert_array_equal(np.asarray(perm)[got], [0, 1, 2])


def test_separate_long_aligns_and_stitches(tiny_model, monkeypatch):
    """The long-form stitcher must undo arbitrary per-window source-order
    flips and reconstruct continuous tracks via the crossfade. The
    separation itself is mocked with the true sources so the test isolates
    the windowing/alignment/crossfade logic."""
    from speech_separation_tpu.eval.pipeline import SeparationPipeline

    model_path, cfg, params, state = tiny_model
    pipe = SeparationPipeline(model_path,
                              model_kwargs={"hidden": "16", "num_layers": "1",
                                            "zero_init_hidden": "1"})
    sr = pipe.stft_cfg.sample_rate
    rng = np.random.default_rng(0)
    total = int(5.5 * sr)
    # two smooth, distinct sources (band-limited noise)
    def smooth(x, k=41):
        return np.convolve(x, np.ones(k) / k, mode="same")
    s_true = np.stack([smooth(rng.standard_normal(total)),
                       smooth(np.sin(np.arange(total) * 0.01)
                              + 0.2 * rng.standard_normal(total))]
                      ).astype(np.float32)
    mix = s_true.sum(axis=0)

    calls = {"n": 0}

    def fake_separate(signals, num_spk=None):
        # return the TRUE source slices for each window, with the source
        # order flipped on odd windows — the worst case for stitching
        outs = []
        offset = 0
        for k, w in enumerate(signals):
            L = len(w)
            start = int(round(offset))
            sl = s_true[:, start: start + L]
            if k % 2 == 1:
                sl = sl[::-1]
            outs.append([sl[0].copy(), sl[1].copy()])
            offset += L - int(1.0 * sr)  # window hop = W - V
            calls["n"] += 1
        return outs

    monkeypatch.setattr(pipe, "separate", fake_separate)
    tracks = pipe.separate_long(mix, num_spk=2, window_sec=2.0,
                                overlap_sec=1.0)
    assert len(tracks) == 2 and all(len(t) == total for t in tracks)
    assert calls["n"] >= 4  # actually windowed
    # global order follows window 0 (unflipped) -> tracks == s_true
    for s in range(2):
        err = np.linalg.norm(tracks[s] - s_true[s]) / np.linalg.norm(s_true[s])
        assert err < 1e-3, err


def test_separate_long_real_model_runs(tiny_model):
    """End-to-end long-form run through the real fused pipeline (untrained
    model): shapes, finiteness, and single-shape compilation reuse."""
    from speech_separation_tpu.eval.pipeline import SeparationPipeline

    model_path, cfg, params, state = tiny_model
    pipe = SeparationPipeline(model_path,
                              model_kwargs={"hidden": "16", "num_layers": "1",
                                            "zero_init_hidden": "1"},
                              batch_size=8, length_quantum=4096)
    sr = pipe.stft_cfg.sample_rate
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(int(7.3 * sr)) * 0.1).astype(np.float32)
    tracks = pipe.separate_long(x, window_sec=2.0, overlap_sec=0.5)
    assert len(tracks) == 2
    assert all(len(t) == len(x) for t in tracks)
    assert all(np.all(np.isfinite(t)) for t in tracks)
    # all full windows share one (n_t, S) fused executable
    assert len(pipe._fns) <= 2


def test_best_source_perm_silence_prefers_identity():
    """Silent overlap rows carry no speaker evidence: their noise
    correlations must not flip the track assignment (identity wins any
    near-tie)."""
    from speech_separation_tpu.eval.pipeline import _best_source_perm

    rng = np.random.default_rng(9)
    # both previous tracks silent in the overlap -> zero evidence
    prev = np.zeros((2, 400), np.float32)
    cur = rng.standard_normal((2, 400)).astype(np.float32)
    np.testing.assert_array_equal(_best_source_perm(prev, cur), [0, 1])
    # one silent row: the voiced row still pins the assignment
    voiced = rng.standard_normal(400).astype(np.float32)
    prev2 = np.stack([voiced, np.zeros(400, np.float32)])
    cur2 = np.stack([np.zeros(400, np.float32) + 1e-7,
                     voiced + 0.05 * rng.standard_normal(400).astype(np.float32)])
    got = _best_source_perm(prev2, cur2)
    np.testing.assert_array_equal(got, [1, 0])
