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

    # overlap 1.024 s = 8192 samples, an STFT-hop multiple: separate_long
    # quantizes window/overlap to hop multiples (full-coverage guarantee),
    # and this mock's offset arithmetic must match the real window hop
    V = int(1.024 * sr)

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
            offset += L - V  # window hop = W - V
            calls["n"] += 1
        return outs

    monkeypatch.setattr(pipe, "separate", fake_separate)
    tracks = pipe.separate_long(mix, num_spk=2, window_sec=2.0,
                                overlap_sec=1.024)
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


def test_separate_stream_matches_separate(tiny_model, tmp_path):
    """The streaming core (bounded-memory batches, prefetch threads,
    header-length ordering) must produce byte-identical tracks to the
    in-memory separate() on the same audio — including through a wav-file
    round trip with wav_num_samples-based ordering."""
    from speech_separation_tpu.utils.audio import (load_wav, wav_num_samples,
                                                   write_wav_int16)

    model_path, *_ = tiny_model
    kwargs = {"hidden": "16", "num_layers": "1", "zero_init_hidden": "1"}
    pipe = SeparationPipeline(model_path, model_kwargs=kwargs,
                              batch_size=2, length_quantum=4096)
    rng = np.random.default_rng(5)
    paths, signals = [], []
    for k, n in enumerate((7000, 3000, 5000, 3100, 4000)):
        x = (rng.standard_normal(n) * 0.1).astype(np.float32)
        p = str(tmp_path / f"u{k}.wav")
        write_wav_int16(p, 8000, x)
        paths.append(p)
        signals.append(load_wav(p)[0])

    ref = pipe.separate(signals)

    lengths = [wav_num_samples(p) for p in paths]
    assert lengths == [len(s) for s in signals]  # header parse is exact
    got = [None] * len(paths)
    for i, tracks in pipe.separate_stream(
            lambda i: load_wav(paths[i])[0], lengths):
        got[i] = tracks
    for r, g in zip(ref, got):
        for a, b in zip(r, g):
            np.testing.assert_array_equal(a, b)


def test_separate_long_covers_whole_input(tiny_model):
    """ADVICE round-2: no silent hop-rounding tail — tracks span the full
    input, including lengths that are not hop multiples."""
    model_path, *_ = tiny_model
    pipe = SeparationPipeline(model_path,
                              model_kwargs={"hidden": "16", "num_layers": "1",
                                            "zero_init_hidden": "1"},
                              batch_size=8, length_quantum=4096)
    sr = pipe.stft_cfg.sample_rate
    rng = np.random.default_rng(2)
    for n in (int(3.37 * sr), int(1.01 * sr)):  # > W and <= W, odd lengths
        x = (0.1 * rng.standard_normal(n)).astype(np.float32)
        tracks = pipe.separate_long(x, window_sec=2.0, overlap_sec=0.5)
        assert all(len(t) == n for t in tracks)
        # the final hop of every track carries real (nonzero) audio
        hop = pipe.stft_cfg.hop
        for t in tracks:
            assert np.any(t[-hop:] != 0.0)


def test_separate_long_mid_stream_silence_and_swap(tiny_model, monkeypatch):
    """VERDICT round-2 #10: a joint speaker pause spanning a window
    boundary must NOT flip the output tracks (identity margin on silent
    overlaps), and a genuine source-order flip in an active region must
    still be realigned. Separation is mocked with true-source slices (plus
    noise) so the test isolates the stitcher."""
    model_path, *_ = tiny_model
    pipe = SeparationPipeline(model_path,
                              model_kwargs={"hidden": "16", "num_layers": "1",
                                            "zero_init_hidden": "1"})
    sr = pipe.stft_cfg.sample_rate
    rng = np.random.default_rng(11)
    total = int(7.0 * sr)

    def smooth(x, k=41):
        return np.convolve(x, np.ones(k) / k, mode="same")

    s_true = np.stack([smooth(rng.standard_normal(total)),
                       smooth(np.sin(np.arange(total) * 0.01)
                              + 0.2 * rng.standard_normal(total))]
                      ).astype(np.float32)
    # W=2.048s (16384), V=1.024s (8192) — hop multiples, so the mock's
    # offsets match separate_long's quantized window hop of 8192. Both
    # speakers pause over [3.0s, 4.2s], fully covering the overlap between
    # the windows starting at 16384 and 24576 ([3.072s, 4.096s])
    s_true[:, int(3.0 * sr): int(4.2 * sr)] = 0.0
    mix = s_true.sum(axis=0)
    V = int(1.024 * sr)

    def fake_separate(signals, num_spk=None):
        outs = []
        offset = 0
        for k, w in enumerate(signals):
            L = len(w)
            sl = s_true[:, offset: offset + L]
            if sl.shape[1] < L:
                sl = np.pad(sl, ((0, 0), (0, L - sl.shape[1])))
            # windows 5+ (starts >= 5.12s, active audio) come back flipped
            if k >= 5:
                sl = sl[::-1]
            # correlation noise: what a real model adds on silent frames
            sl = sl + 1e-5 * rng.standard_normal(sl.shape).astype(np.float32)
            outs.append([sl[0], sl[1]])
            offset += L - V
        return outs

    monkeypatch.setattr(pipe, "separate", fake_separate)
    tracks = pipe.separate_long(mix, num_spk=2, window_sec=2.048,
                                overlap_sec=1.024)
    assert all(len(t) == total for t in tracks)
    for s in range(2):
        err = (np.linalg.norm(tracks[s] - s_true[s])
               / np.linalg.norm(s_true[s]))
        assert err < 1e-2, f"track {s} diverged (err {err}) — a silent " \
            "overlap or the window-5 flip broke the alignment chain"


def test_rsh_fused_pipeline_and_stream(tmp_path):
    """The fused wav->wavs program also serves RSH (S sequential extraction
    passes inside one jit); stream and in-memory paths agree."""
    from speech_separation_tpu.models import rsh
    from speech_separation_tpu.train.checkpoint import save_checkpoint

    cfg = rsh.Config(feat_dim=257, hidden=16, num_layers=1,
                     zero_init_hidden=True)
    params, state = rsh.init(jax.random.PRNGKey(2), cfg)
    path = str(tmp_path / "rsh.mdl")
    save_checkpoint(path, params=params, state=state, epoch=0,
                    meta={"arch": "RSH"})
    pipe = SeparationPipeline(path,
                              model_kwargs={"hidden": "16", "num_layers": "1",
                                            "zero_init_hidden": "1"},
                              batch_size=2, length_quantum=4096, num_spk=2)
    rng = np.random.default_rng(4)
    sigs = [(0.1 * rng.standard_normal(n)).astype(np.float32)
            for n in (5000, 3200, 4100)]
    ref = pipe.separate(sigs)
    assert all(len(tracks) == 2 for tracks in ref)
    assert all(np.all(np.isfinite(t)) for tracks in ref for t in tracks)
    # three-speaker extraction from the same model: one more pass
    three = pipe.separate(sigs[:1], num_spk=3)
    assert len(three[0]) == 3

    got = [None] * len(sigs)
    for i, tracks in pipe.separate_stream(sigs.__getitem__,
                                          [len(s) for s in sigs]):
        got[i] = tracks
    for r, g in zip(ref, got):
        for a, b in zip(r, g):
            np.testing.assert_array_equal(a, b)


def test_fixed_head_arch_rejects_foreign_num_spk(tiny_model):
    """uPIT/TCN emit exactly cfg.num_spk masks; asking the pipeline for a
    different count must fail with a clear error, not a reshape TypeError
    from inside jit."""
    model_path = tiny_model[0]
    kwargs = {"hidden": "16", "num_layers": "1", "zero_init_hidden": "1"}
    pipe = SeparationPipeline(model_path, model_kwargs=kwargs,
                              batch_size=2, length_quantum=4096)
    with pytest.raises(ValueError, match="separates exactly 2"):
        pipe.separate([np.zeros(4000, np.float32)], num_spk=3)
