import numpy as np
import pytest

import jax.numpy as jnp

from speech_separation_tpu.dsp import (
    hann_periodic, num_frames, istft_output_length, reflect_pad_center,
    stft_np, istft_np, stft_centered_batch, stft_magnitude_batch, istft_batch,
)


def _rand_signal(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32) * 0.1


def _batch_pad(xs, n_fft, hop):
    """Host-side batching: per-sample reflect pad + zero pad to common length."""
    max_len = max(len(x) for x in xs)
    n_t = num_frames(max_len, hop)
    Lp = max_len + n_fft
    xp = np.zeros((len(xs), Lp), np.float32)
    for i, x in enumerate(xs):
        padded = reflect_pad_center(x, n_fft)
        xp[i, : len(padded)] = padded
    return xp, n_t


def test_hann_periodic_matches_definition():
    w = hann_periodic(8)
    n = np.arange(8)
    expected = 0.5 - 0.5 * np.cos(2 * np.pi * n / 8)
    np.testing.assert_allclose(w, expected, rtol=1e-6)
    assert w[0] == 0.0  # periodic window starts at zero


def test_stft_np_matches_definitional_dft():
    """Golden check: windowed DFT computed by explicit loops."""
    x = _rand_signal(1000)
    n_fft, hop = 64, 16
    S = stft_np(x, n_fft=n_fft, hop=hop)
    assert S.shape == (33, 1 + 1000 // 16)
    xp = np.pad(x.astype(np.float64), n_fft // 2, mode="reflect")
    w = hann_periodic(n_fft).astype(np.float64)
    for t in [0, 1, 17, S.shape[1] - 1]:
        frame = xp[t * hop: t * hop + n_fft] * w
        expected = np.array([np.sum(frame * np.exp(-2j * np.pi * k * np.arange(n_fft) / n_fft))
                             for k in range(33)])
        np.testing.assert_allclose(S[:, t], expected, atol=1e-4)


def test_istft_np_roundtrip():
    """istft(stft(x)) reproduces the interior of x (librosa semantics:
    output has hop*(T-1) samples and matches x there)."""
    x = _rand_signal(4096)
    S = stft_np(x, n_fft=512, hop=128)
    y = istft_np(S, hop=128)
    assert len(y) == istft_output_length(S.shape[1], 128)
    np.testing.assert_allclose(y, x[: len(y)], atol=1e-4)


def test_stft_batch_matches_np_reference():
    n_fft, hop = 512, 128
    xs = [_rand_signal(n, seed=i) for i, n in enumerate([3000, 2500, 1777])]
    xp, n_t = _batch_pad(xs, n_fft, hop)

    re, im = stft_centered_batch(jnp.asarray(xp), n_fft, hop, n_t)
    re, im = np.asarray(re), np.asarray(im)
    mag = np.asarray(stft_magnitude_batch(jnp.asarray(xp), n_fft, hop, n_t))
    for i, x in enumerate(xs):
        ref = stft_np(x, n_fft=n_fft, hop=hop)  # (F, T_i)
        T_i = ref.shape[1]
        np.testing.assert_allclose(re[i, :T_i].T, ref.real, atol=3e-4)
        np.testing.assert_allclose(im[i, :T_i].T, ref.imag, atol=3e-4)
        np.testing.assert_allclose(mag[i, :T_i].T, np.abs(ref), atol=3e-4)


def test_istft_batch_ragged_exact():
    """Batched iSTFT with masked frames must equal per-sample numpy iSTFT,
    including the window-normalization near each sample's own end."""
    n_fft, hop = 512, 128
    xs = [_rand_signal(n, seed=10 + i) for i, n in enumerate([3000, 1800])]
    specs = [stft_np(x, n_fft=n_fft, hop=hop) for x in xs]
    T = max(s.shape[1] for s in specs)
    B = len(xs)
    re = np.zeros((B, T, n_fft // 2 + 1), np.float32)
    im = np.zeros_like(re)
    counts = np.zeros(B, np.int32)
    for i, s in enumerate(specs):
        re[i, : s.shape[1], :] = s.T.real
        im[i, : s.shape[1], :] = s.T.imag
        counts[i] = s.shape[1]

    y = np.asarray(istft_batch(jnp.asarray(re), jnp.asarray(im),
                               jnp.asarray(counts), hop=hop))
    half = n_fft // 2
    for i, s in enumerate(specs):
        ref = istft_np(s, hop=hop)
        got = y[i, half: half + len(ref)]
        np.testing.assert_allclose(got, ref, atol=2e-4)


def test_roundtrip_snr():
    """mask=1 roundtrip: reconstruction SNR vs input is high."""
    n_fft, hop = 512, 128
    x = _rand_signal(8000, seed=3)
    S = stft_np(x, n_fft=n_fft, hop=hop)
    y = istft_np(S, hop=hop)
    err = x[: len(y)] - y
    snr = 10 * np.log10(np.sum(x[: len(y)] ** 2) / np.sum(err ** 2))
    assert snr > 60.0
