"""Waveform-direct input pipeline: train straight from wav.scp.

The reference (and this framework's compatible path) precomputes magnitude
spectrograms to npz files and loads them per batch. That ships
(1 + num_spk) * T * 257 floats per utterance to the device. Shipping the
*waveforms* instead is ~4x fewer bytes — the STFT is a device-side matmul
that fuses into the training step (see loop.make_update_step's
from_audio mode) — and removes the feature-extraction stage and its disk
footprint entirely. On hosts where the device link is the bottleneck (or
at production data rates), this is the preferred training mode
(``--on-device-features``); numerics are identical because the same
stft_centered_batch program computes the features either way (tested).

Batch layout: {'audio': (B, 1+S, Lp) float32 — row 0 the mixture, rows
1..S the sources, each reflect-padded around its own end then zero-padded;
'sample_lengths': (B,) int32; 'lengths': (B,) int32 frame counts;
'row_mask', 'names'} — downstream-compatible with the feature batches.
"""

from __future__ import annotations

import os

import numpy as np

from ..datadir.scp import read_scp, write_scp, source_wavs_for_mix
from ..dsp.stft import STFTConfig, num_frames, reflect_pad_center
from ..utils.audio import load_wav, wav_num_samples


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class WavDataset:
    """wav.scp-backed dataset producing waveform batches.

    Caches per-utterance sample counts (header reads) to
    ``<data-dir>/utt2num_samples`` on first scan.
    """

    def __init__(self, data_dir: str, cfg: STFTConfig = STFTConfig()):
        self.cfg = cfg
        self.entries = read_scp(os.path.join(data_dir, "wav.scp"))
        if not self.entries:
            raise ValueError(f"empty wav.scp in {data_dir}")
        self.wav_files = [source_wavs_for_mix(path) for _, path in self.entries]
        self.num_spks = np.asarray(
            [max(len(w) - 1, 1) for w in self.wav_files], np.int32)

        cache = os.path.join(data_dir, "utt2num_samples")
        if os.path.isfile(cache):
            n = {k: int(v) for k, v in read_scp(cache)}
            self.num_samples = np.asarray(
                [n[utt] for utt, _ in self.entries], np.int32)
        else:
            self.num_samples = np.asarray(
                [wav_num_samples(path) for _, path in self.entries], np.int32)
            write_scp(cache, ((utt, str(n)) for (utt, _), n
                              in zip(self.entries, self.num_samples)))
        # frame counts drive bucketing like utt2num_frames does
        self.num_frames = np.asarray(
            [num_frames(int(n), cfg.hop) for n in self.num_samples], np.int32)

    def __len__(self):
        return len(self.entries)

    def utt_id(self, idx: int) -> str:
        return self.entries[idx][0]


def collate_wav_batch(dataset: WavDataset, idxs: list[int],
                      batch_size: int, sample_pad_multiple: int = 16384,
                      ship_int16: bool = True) -> dict:
    """ship_int16 re-quantizes the normalized audio to int16 for transfer
    (exact roundtrip for PCM16 sources — the corpora here — halving the
    host->device bytes; the device renormalizes). Set False for float-format
    wavs."""
    cfg = dataset.cfg
    B = batch_size
    S = max(int(dataset.num_spks[i]) for i in idxs)
    max_len = _round_up(max(int(dataset.num_samples[i]) for i in idxs),
                        sample_pad_multiple)
    Lp = max_len + cfg.n_fft

    audio = np.zeros((B, 1 + S, Lp), np.float32)
    sample_lengths = np.zeros((B,), np.int32)
    lengths = np.zeros((B,), np.int32)
    row_mask = np.zeros((B,), np.float32)
    names = []
    for row, i in enumerate(idxs):
        utt, _ = dataset.entries[i]
        wavs = dataset.wav_files[i]
        sigs = [load_wav(w, sr=cfg.sample_rate)[0] for w in wavs]
        if len(sigs) == 1:      # degenerate: source1 = mix
            sigs = [sigs[0], sigs[0]]
        for k, s in enumerate(sigs):
            padded = reflect_pad_center(s, cfg.n_fft)
            audio[row, k, : len(padded)] = padded
        n = len(sigs[0])
        sample_lengths[row] = n
        lengths[row] = num_frames(n, cfg.hop)
        row_mask[row] = 1.0
        names.append(utt)
    if ship_int16:
        audio = np.round(audio * 32768.0).clip(-32768, 32767).astype(np.int16)
    return {"audio": audio, "sample_lengths": sample_lengths,
            "lengths": lengths, "row_mask": row_mask, "names": names}


def audio_to_wave_batch(batch: dict, cfg: STFTConfig):
    """Device-side: shipped audio batch -> the waveform batch a
    DOMAIN='time' arch (models/convtasnet.py) consumes. The shipped rows
    are reflect-padded around each signal for the STFT models
    (reflect_pad_center: n_fft//2 both sides); time-domain training wants
    the raw samples, so the static n_fft//2 prefix is sliced off and
    everything past each row's true sample count is zeroed (the reflect
    tail would otherwise leak mirrored audio into the loss)."""
    import jax.numpy as jnp

    audio = batch["audio"]
    if audio.dtype == jnp.int16:
        audio = audio.astype(jnp.float32) / 32768.0
    half = cfg.n_fft // 2
    L = audio.shape[-1] - cfg.n_fft           # static: the max_len padding
    wav = audio[:, :, half: half + L]
    n = batch["sample_lengths"]
    smask = (jnp.arange(L)[None, :] < n[:, None]).astype(jnp.float32)
    wav = wav * smask[:, None, :]
    return {"mix_wav": wav[:, 0], "source_wavs": wav[:, 1:],
            "sample_lengths": n, "row_mask": batch["row_mask"]}


def audio_to_feature_batch(batch: dict, cfg: STFTConfig):
    """Device-side: waveform batch -> the {'mix','sources',...} feature
    batch the arch loss functions consume. Jit-safe (static shapes from
    the audio array). Garbage frames past each row's count are zeroed so
    the result matches zero-padded precomputed features exactly."""
    import jax.numpy as jnp
    from ..dsp.stft import stft_magnitude_batch

    audio = batch["audio"]
    if audio.dtype == jnp.int16:  # shipped quantized; renormalize on device
        audio = audio.astype(jnp.float32) / 32768.0
    B, C, Lp = audio.shape
    n_t = (Lp - cfg.n_fft) // cfg.hop + 1
    mag = stft_magnitude_batch(audio.reshape(B * C, Lp), cfg.n_fft, cfg.hop,
                               n_t).reshape(B, C, n_t, cfg.num_bins)
    tmask = (jnp.arange(n_t)[None, :] < batch["lengths"][:, None]
             ).astype(mag.dtype)[:, None, :, None]
    mag = mag * tmask
    return {"mix": mag[:, 0], "sources": mag[:, 1:],
            "lengths": batch["lengths"], "row_mask": batch["row_mask"]}
