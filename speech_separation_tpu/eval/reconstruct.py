"""Waveform reconstruction: masked iSTFT -> int16 wavs.

The reference's steps/reconstruct_sources.py loops utterances on the CPU
doing librosa.istft per source. Here the masked-spectrum multiply and the
iSTFT run on device, batched over (utterance x source) rows — mask * complex
mix is two real multiplies (re*m, im*m), so the whole stage is complex-free
and fuses into the matmul+overlap-add program of dsp.istft_batch.

Output contract matches the reference exactly: wav/<source>/<utt>.wav,
int16 at wave * 32767 (reconstruct_sources.py:41-42), length hop*(T-1).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..datadir.scp import read_scp
from ..dsp.stft import istft_batch, istft_output_length
from ..utils.audio import write_wav_int16


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def reconstruct_sources(data_dir: str, exp_dir: str, hop: int = 128,
                        sample_rate: int = 8000, rows_per_batch: int = 64,
                        time_pad_multiple: int = 128, log=print) -> None:
    entries = read_scp(os.path.join(data_dir, "feats_test.scp"))
    mask_dir = os.path.join(exp_dir, "masks")

    pending = []  # (utt, source_key, re (T,F), im (T,F), T)

    def flush():
        if not pending:
            return
        T_pad = _round_up(max(p[4] for p in pending), time_pad_multiple)
        n_bins = pending[0][2].shape[1]
        B = len(pending)
        re = np.zeros((B, T_pad, n_bins), np.float32)
        im = np.zeros((B, T_pad, n_bins), np.float32)
        counts = np.zeros((B,), np.int32)
        for r, (_, _, re_i, im_i, T_i) in enumerate(pending):
            re[r, :T_i] = re_i
            im[r, :T_i] = im_i
            counts[r] = T_i
        y = np.asarray(istft_batch(jnp.asarray(re), jnp.asarray(im),
                                   jnp.asarray(counts), hop=hop))
        n_fft = 2 * (n_bins - 1)
        half = n_fft // 2
        for r, (utt, skey, _, _, T_i) in enumerate(pending):
            out_len = istft_output_length(T_i, hop)
            wav_path = os.path.join(exp_dir, "wav", skey, utt + ".wav")
            os.makedirs(os.path.dirname(wav_path), exist_ok=True)
            write_wav_int16(wav_path, sample_rate, y[r, half: half + out_len])
        pending.clear()

    n_utts = 0
    for utt, feat_path in entries:
        spec = np.load(feat_path)["mix"]  # (F, T) complex64
        masks = np.load(os.path.join(mask_dir, utt + ".npz"))
        spec_re = spec.real.T.astype(np.float32)  # (T, F)
        spec_im = spec.imag.T.astype(np.float32)
        T_i = spec_re.shape[0]
        for skey in masks.files:
            m = masks[skey].T.astype(np.float32)  # (T, F)
            pending.append((utt, skey, spec_re * m, spec_im * m, T_i))
            if len(pending) >= rows_per_batch:
                flush()
        n_utts += 1
    flush()
    log(f"reconstructed {n_utts} utterances -> {os.path.join(exp_dir, 'wav')}")
