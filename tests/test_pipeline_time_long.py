"""Long-form separation (`separate_long`) for DOMAIN='time' archs
(VERDICT round-3 weak #7): the windowed stitcher — permutation alignment
over the shared overlap + coverage-renormalized crossfade — over
learned-basis waveform outputs instead of masked-iSTFT outputs. The time
branch returns FULL window-length tracks (the spectral branch returns
hop*(T-1)), so the Lk bookkeeping differs; these tests pin both the
dispatch and the stitching."""

import os

import numpy as np
import pytest

import jax

from speech_separation_tpu.models import convtasnet as ct
from speech_separation_tpu.train.checkpoint import save_checkpoint
from speech_separation_tpu.eval.pipeline import SeparationPipeline

TINY = dict(n_filters=16, filter_len=16, stride=8, channels=12, hidden=16,
            kernel=3, blocks=2, repeats=1)


@pytest.fixture(scope="module")
def tiny_time_model(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe_time_long")
    cfg = ct.Config(num_spk=2, **TINY)
    params, state = ct.init(jax.random.PRNGKey(0), cfg)
    path = str(root / "model.mdl")
    save_checkpoint(path, params=params, state=state, epoch=0,
                    meta={"arch": "ConvTasNet",
                          "model_kwargs": {k: str(v) for k, v in TINY.items()}})
    return path


def test_separate_long_time_domain_runs(tiny_time_model):
    """End-to-end long-form through the real fused time branch (untrained
    model): full-coverage output lengths, finiteness, one compiled shape."""
    pipe = SeparationPipeline(tiny_time_model, batch_size=8,
                              length_quantum=2048)
    assert pipe.domain == "time"
    sr = pipe.stft_cfg.sample_rate
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(int(7.3 * sr)) * 0.1).astype(np.float32)
    tracks = pipe.separate_long(x, window_sec=2.0, overlap_sec=0.5)
    assert len(tracks) == 2
    assert all(len(t) == len(x) for t in tracks)
    assert all(np.all(np.isfinite(t)) for t in tracks)
    # all full windows share one (padded-samples, S) fused executable
    assert len(pipe._fns) <= 2


def test_separate_long_time_domain_aligns_and_stitches(tiny_time_model,
                                                       monkeypatch):
    """Stitcher correctness over the time branch's full-window-length
    outputs: per-window source-order flips must be undone and the
    crossfaded tracks must reproduce continuous sources."""
    pipe = SeparationPipeline(tiny_time_model)
    sr = pipe.stft_cfg.sample_rate
    rng = np.random.default_rng(0)
    total = int(5.5 * sr)

    def smooth(x, k=41):
        return np.convolve(x, np.ones(k) / k, mode="same")
    s_true = np.stack([smooth(rng.standard_normal(total)),
                       smooth(np.sin(np.arange(total) * 0.01)
                              + 0.2 * rng.standard_normal(total))]
                      ).astype(np.float32)
    mix = s_true.sum(axis=0)

    V = int(1.024 * sr)  # hop-multiple overlap: mock offsets match exactly
    calls = {"n": 0}

    def fake_separate(signals, num_spk=None):
        # TRUE source slices per window, order flipped on odd windows —
        # time-branch windows come back at FULL window length
        outs = []
        offset = 0
        for k, w in enumerate(signals):
            L = len(w)
            start = int(round(offset))
            sl = s_true[:, start: start + L]
            if sl.shape[1] < L:  # final padded window: zero-extend like
                sl = np.pad(sl, ((0, 0), (0, L - sl.shape[1])))
            if k % 2 == 1:
                sl = sl[::-1]
            outs.append([sl[0].copy(), sl[1].copy()])
            offset += L - V
            calls["n"] += 1
        return outs

    monkeypatch.setattr(pipe, "separate", fake_separate)
    tracks = pipe.separate_long(mix, num_spk=2, window_sec=2.0,
                                overlap_sec=1.024)
    assert len(tracks) == 2 and all(len(t) == total for t in tracks)
    assert calls["n"] >= 4
    for s in range(2):
        err = np.linalg.norm(tracks[s] - s_true[s]) / np.linalg.norm(s_true[s])
        assert err < 1e-3, err
