"""Pallas fused STFT kernel vs the XLA formulation (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from speech_separation_tpu.dsp.stft import (num_frames, reflect_pad_center,
                                            stft_centered_batch,
                                            stft_magnitude_batch)
from speech_separation_tpu.ops.stft_pallas import stft_pallas


def _batch(lengths, n_fft=512, hop=128, seed=0):
    rng = np.random.default_rng(seed)
    xs = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lengths]
    max_len = max(lengths)
    n_t = num_frames(max_len, hop)
    xp = np.zeros((len(xs), max_len + n_fft), np.float32)
    for i, x in enumerate(xs):
        p = reflect_pad_center(x, n_fft)
        xp[i, : len(p)] = p
    return jnp.asarray(xp), n_t


def test_pallas_stft_matches_xla():
    xp, n_t = _batch([3000, 2100, 1500])
    re_ref, im_ref = stft_centered_batch(xp, 512, 128, n_t)
    re, im = stft_pallas(xp, 512, 128, n_t)
    np.testing.assert_allclose(np.asarray(re), np.asarray(re_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(im), np.asarray(im_ref), atol=2e-4)


def test_pallas_stft_magnitude_matches_xla():
    xp, n_t = _batch([2500, 2500], seed=1)
    mag_ref = stft_magnitude_batch(xp, 512, 128, n_t)
    mag = stft_pallas(xp, 512, 128, n_t, magnitude=True)
    np.testing.assert_allclose(np.asarray(mag), np.asarray(mag_ref), atol=2e-4)


def test_pallas_stft_partial_last_tile():
    """n_t not divisible by tile_t exercises the tail-tile path."""
    xp, n_t = _batch([5000], seed=2)
    assert n_t % 16 != 0
    re, im = stft_pallas(xp, 512, 128, n_t, tile_t=16)
    re_ref, im_ref = stft_centered_batch(xp, 512, 128, n_t)
    np.testing.assert_allclose(np.asarray(re), np.asarray(re_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(im), np.asarray(im_ref), atol=2e-4)
