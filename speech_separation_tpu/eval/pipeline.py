"""Fused end-to-end separation: waveform -> separated waveforms, one XLA
program per shape bucket.

The reference runs five processes with file hand-offs between them
(features -> masks -> reconstruction, SURVEY.md §3.2). Here the whole
inference path — framing + windowed DFT, magnitude, BLSTM mask estimation,
mask x complex spectrum, inverse DFT + overlap-add — compiles into ONE jit
program: raw audio streams in, separated audio streams out, with no host
round-trips and no complex dtypes anywhere on device.

This is the serving API; the staged mask-npz/wav-file path (infer.py,
reconstruct.py) remains for reference interface compatibility.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.stft import (STFTConfig, num_frames, istft_output_length,
                        reflect_pad_center, stft_centered_batch, istft_batch)
from .infer import load_model


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class SeparationPipeline:
    """Batched waveform-to-waveforms separation with shape bucketing.

    One executable is compiled per (batch, padded-length) bucket; repeated
    calls with similar-length audio reuse the cache.
    """

    def __init__(self, model_path: str, arch_name: str = "",
                 model_kwargs: dict | None = None,
                 stft_cfg: STFTConfig = STFTConfig(),
                 batch_size: int = 16, length_quantum: int = 16384,
                 num_spk: int | None = None, seed: int = 0):
        self.arch, self.cfg, self.params, self.state = load_model(
            model_path, arch_name, model_kwargs)
        self.stft_cfg = stft_cfg
        self.batch_size = batch_size
        self.length_quantum = length_quantum
        self.num_spk = num_spk or getattr(self.cfg, "num_spk", 2)
        self._rng = jax.random.PRNGKey(seed)
        self._fns = {}

    def _fused_fn(self, n_t: int, num_spk: int):
        key = (n_t, num_spk)
        if key in self._fns:
            return self._fns[key]
        cfg, params, state = self.cfg, self.params, self.state
        arch = self.arch
        scfg = self.stft_cfg
        F = scfg.num_bins

        @jax.jit
        def fused(xp, frame_counts, rng):
            B = xp.shape[0]
            re, im = stft_centered_batch(xp, scfg.n_fft, scfg.hop, n_t)
            tmask = (jnp.arange(n_t)[None, :] < frame_counts[:, None]
                     ).astype(jnp.float32)[:, :, None]
            mag = jnp.sqrt(re * re + im * im) * tmask
            batch = {"mix": mag, "lengths": frame_counts,
                     "row_mask": jnp.ones((B,), jnp.float32)}
            if arch.NAME == "RSH":
                masks = arch.infer_masks(cfg, params, state, batch, rng,
                                         num_spk)  # (B, S, T, F)
            else:
                flat = arch.infer_masks(cfg, params, state, batch, rng)
                masks = flat.reshape(B, n_t, num_spk, F).transpose(0, 2, 1, 3)
            # masked iSTFT over (B*S) rows
            re_s = (re[:, None] * masks).reshape(B * num_spk, n_t, F)
            im_s = (im[:, None] * masks).reshape(B * num_spk, n_t, F)
            counts = jnp.repeat(frame_counts, num_spk)
            y = istft_batch(re_s, im_s, counts, hop=scfg.hop)
            return y.reshape(B, num_spk, -1)

        self._fns[key] = fused
        return fused

    def separate(self, signals: list[np.ndarray],
                 num_spk: int | None = None) -> list[list[np.ndarray]]:
        """Separate a list of waveforms. Returns, per input, a list of
        num_spk estimated source waveforms of length hop*(T_i - 1)."""
        scfg = self.stft_cfg
        S = num_spk or self.num_spk
        out: list[list[np.ndarray]] = [None] * len(signals)
        order = sorted(range(len(signals)), key=lambda i: len(signals[i]))

        for start in range(0, len(order), self.batch_size):
            idxs = order[start: start + self.batch_size]
            group = [signals[i] for i in idxs]
            max_len = _round_up(max(len(s) for s in group), self.length_quantum)
            n_t = num_frames(max_len, scfg.hop)
            Lp = max_len + scfg.n_fft
            xp = np.zeros((len(group), Lp), np.float32)
            counts = np.zeros((len(group),), np.int32)
            for r, s in enumerate(group):
                padded = reflect_pad_center(np.asarray(s, np.float32), scfg.n_fft)
                xp[r, : len(padded)] = padded
                counts[r] = num_frames(len(s), scfg.hop)

            self._rng, step_rng = jax.random.split(self._rng)
            fused = self._fused_fn(n_t, S)
            y = np.asarray(fused(jnp.asarray(xp), jnp.asarray(counts), step_rng))
            half = scfg.n_fft // 2
            for r, i in enumerate(idxs):
                L_out = istft_output_length(int(counts[r]), scfg.hop)
                out[i] = [y[r, s, half: half + L_out] for s in range(S)]
        return out
