"""Online (real-time) separation: push audio in, pull separated audio out.

The reference — and this framework's other serving modes — are offline:
they need the whole recording (or an 8 s long-form window) before any
output exists. This engine separates a LIVE stream with bounded,
structural latency using the causal TCN (models/tcn.py, ``causal=True``):

- **causal network**: frame t's masks depend only on frames <= t, with
  exact per-block depthwise-conv context carried as state
  (tcn.streaming_forward) — chunk boundaries are mathematically
  invisible, so streaming output EQUALS the offline forward on the same
  audio (pinned by tests/test_streaming.py);
- **streaming STFT**: the center=True reflect padding needs n_fft/2
  samples of lookahead (32 ms at 8 kHz / n_fft 512) — the only
  algorithmic latency besides the chunk granularity;
- **streaming iSTFT**: masked spectra overlap-add into an accumulator;
  a sample is emitted once no future frame can touch it (its window-sum
  normalizer is then final too), reproducing the offline
  ``istft_batch`` output including edge normalization.

One fixed-shape XLA program per chunk size: (chunk_frames) frames in,
masked time-domain frames out. Total latency = chunk duration +
n_fft/2 samples + device time (sub-ms for a small causal TCN).

Usage::

    sep = StreamingSeparator("causal_tcn.mdl", chunk_frames=16)
    for block in microphone():          # arbitrary block sizes
        tracks = sep.push(block)        # list of S arrays (may be empty)
    tracks = sep.close()                # flush the tail

The concatenation of pushed+closed outputs equals
``SeparationPipeline.separate`` on the whole recording (same model).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.stft import (hann_periodic, num_frames, istft_output_length,
                        _windowed_rdft_matrix, _windowed_irdft_matrix)
from .infer import load_model


@partial(jax.jit, static_argnames=("cfg", "num_spk"))
def _chunk_program(cfg, params, conv_state, frames, num_spk: int):
    """(C, n_fft) raw sample frames -> (S, C, n_fft) masked windowed
    time-domain frames + new conv state. One compiled program per
    (chunk_frames,) shape — the whole hot path of the stream."""
    from ..models.tcn import streaming_forward

    n_fft = frames.shape[-1]
    n_bins = n_fft // 2 + 1
    A = jnp.asarray(_windowed_rdft_matrix(n_fft))
    spec = jnp.dot(frames, A, precision=jax.lax.Precision.HIGHEST)
    re, im = spec[:, :n_bins], spec[:, n_bins:]
    mag = jnp.sqrt(re * re + im * im)

    masks, new_state = streaming_forward(cfg, params, mag[None], conv_state)
    C = frames.shape[0]
    masks = masks.reshape(C, num_spk, n_bins).transpose(1, 0, 2)  # (S, C, F)

    Bmat = jnp.asarray(_windowed_irdft_matrix(n_fft))
    spec_s = jnp.concatenate([re[None] * masks, im[None] * masks], axis=-1)
    y = jnp.dot(spec_s, Bmat, precision=jax.lax.Precision.HIGHEST)
    return y, new_state


class StreamingSeparator:
    """Real-time separation of one audio stream (one model, S tracks).

    ``push(samples)`` accepts any number of float32 samples and returns
    the newly-finalized separated samples (S arrays, possibly empty);
    ``close()`` flushes the tail. Output sample s is emitted exactly once,
    in order, and the concatenated output per track has the input's
    length, equal to the offline pipeline's tracks (up to the offline
    path's hop*(T-1) trim, which close() reproduces).
    """

    def __init__(self, model_path: str, chunk_frames: int = 16,
                 model_kwargs: dict | None = None, n_fft: int = 512,
                 hop: int = 128):
        self.arch, self.cfg, self.params, _state = load_model(
            model_path, model_kwargs=model_kwargs)
        if self.arch.NAME != "TCN" or not getattr(self.cfg, "causal", False):
            raise ValueError(
                "streaming needs a causal TCN model (models/tcn.py, "
                f"causal=true); got arch={self.arch.NAME} "
                f"causal={getattr(self.cfg, 'causal', False)}")
        if self.cfg.feat_dim != n_fft // 2 + 1:
            raise ValueError(f"model feat_dim {self.cfg.feat_dim} does not "
                             f"match n_fft {n_fft}")
        from ..models.tcn import init_stream_state
        self.n_fft, self.hop, self.C = n_fft, hop, chunk_frames
        self.half = n_fft // 2
        self.S = self.cfg.num_spk
        self._state = init_stream_state(self.cfg, batch=1)
        self._w2 = np.asarray(hann_periodic(n_fft)) ** 2
        # padded-coordinate stream: reflect(half) + samples (+ reflect at
        # close). _buf holds the not-yet-fully-consumed padded samples;
        # _buf_start is the padded coordinate of _buf[0].
        self._raw = []          # pre-pad samples until half+1 are known
        self._buf = None        # np.float32, padded stream suffix
        self._buf_start = 0
        self._n_raw = 0         # total raw samples received
        self._t_done = 0        # frames processed
        # overlap-add accumulators, padded coords from _ola_start
        self._ola = np.zeros((self.S, 0), np.float32)
        self._wss = np.zeros((0,), np.float32)
        self._ola_start = 0
        self._emitted = 0       # signal-coordinate samples emitted
        self._closed = False

    # ------------------------------------------------------------- plumbing

    def _ensure_buf(self) -> bool:
        """Create the padded stream once the start reflect is computable."""
        if self._buf is not None:
            return True
        raw = np.concatenate(self._raw) if self._raw else np.zeros(0, np.float32)
        if len(raw) < self.half + 1:
            return False
        self._buf = np.concatenate([raw[1: self.half + 1][::-1], raw])
        self._raw = None
        return True

    def _grow_ola(self, upto: int) -> None:
        need = upto - self._ola_start - self._wss.shape[0]
        if need > 0:
            self._ola = np.pad(self._ola, [(0, 0), (0, need)])
            self._wss = np.pad(self._wss, (0, need))

    def _run_chunk(self, frames_np: np.ndarray, n_valid: int) -> None:
        """Run the compiled chunk program and OLA n_valid frames."""
        y, self._state = _chunk_program(self.cfg, self.params, self._state,
                                        jnp.asarray(frames_np), self.S)
        y = np.asarray(y)[:, :n_valid, :]
        t0 = self._t_done
        self._grow_ola((t0 + n_valid - 1) * self.hop + self.n_fft)
        for j in range(n_valid):
            off = (t0 + j) * self.hop - self._ola_start
            self._ola[:, off: off + self.n_fft] += y[:, j, :]
            self._wss[off: off + self.n_fft] += self._w2
        self._t_done += n_valid

    def _emit(self, upto_signal: int) -> list:
        """Finalize signal-coordinate samples [emitted, upto_signal)."""
        n = upto_signal - self._emitted
        if n <= 0:
            return [np.zeros(0, np.float32) for _ in range(self.S)]
        a = self._emitted + self.half - self._ola_start
        num = self._ola[:, a: a + n]
        den = self._wss[a: a + n]
        tiny = np.finfo(np.float32).tiny
        out = np.where(den > tiny, num / den, num).astype(np.float32)
        # drop everything older than any future frame can touch
        keep_from = self._t_done * self.hop - self._ola_start
        keep_from = max(0, min(keep_from, a + n))
        self._ola = self._ola[:, keep_from:]
        self._wss = self._wss[keep_from:]
        self._ola_start += keep_from
        self._emitted = upto_signal
        return [out[s] for s in range(self.S)]

    # ------------------------------------------------------------------ api

    def push(self, samples: np.ndarray) -> list:
        """Feed samples; returns S arrays of newly-final separated samples."""
        if self._closed:
            raise RuntimeError("push after close")
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._n_raw += len(samples)
        if self._buf is None:
            self._raw.append(samples)
            if not self._ensure_buf():
                return [np.zeros(0, np.float32) for _ in range(self.S)]
        else:
            self._buf = np.concatenate([self._buf, samples])

        # process every full chunk whose frames are fully buffered
        while True:
            t0 = self._t_done
            end_pad = (t0 + self.C - 1) * self.hop + self.n_fft
            if end_pad > self._buf_start + len(self._buf):
                break
            a = t0 * self.hop - self._buf_start
            seg = self._buf[a: a + (self.C - 1) * self.hop + self.n_fft]
            idx = (np.arange(self.C)[:, None] * self.hop
                   + np.arange(self.n_fft)[None, :])
            self._run_chunk(seg[idx], self.C)
            # frames before t_done are consumed; keep what future frames need
            cut = self._t_done * self.hop - self._buf_start
            if cut > 0:
                self._buf = self._buf[cut:]
                self._buf_start += cut
        return self._emit(max(0, self._t_done * self.hop - self.half))

    def close(self) -> list:
        """Flush: process tail frames (with end reflect padding) and emit
        the remaining samples, to the offline length hop*(T-1)."""
        if self._closed:
            raise RuntimeError("close twice")
        self._closed = True
        if not self._ensure_buf():
            raise ValueError(f"stream too short ({self._n_raw} samples; "
                             f"need more than n_fft/2 = {self.half})")
        # end reflect padding, exactly reflect_pad_center's right side;
        # raw[k] lives at padded coordinate k + half
        total = self._n_raw
        get = lambda k: self._buf[k + self.half - self._buf_start]
        right = np.asarray([get(total - 2 - i) for i in range(self.half)],
                           np.float32)
        self._buf = np.concatenate([self._buf, right])

        T_total = num_frames(total, self.hop)
        while self._t_done < T_total:
            t0 = self._t_done
            n_valid = min(self.C, T_total - t0)
            a = t0 * self.hop - self._buf_start
            need = (self.C - 1) * self.hop + self.n_fft
            seg = self._buf[a: a + need]
            if len(seg) < need:
                seg = np.pad(seg, (0, need - len(seg)))
            idx = (np.arange(self.C)[:, None] * self.hop
                   + np.arange(self.n_fft)[None, :])
            self._run_chunk(seg[idx], n_valid)
            cut = self._t_done * self.hop - self._buf_start
            if 0 < cut <= len(self._buf):
                self._buf = self._buf[cut:]
                self._buf_start += cut
        return self._emit(istft_output_length(T_total, self.hop))
