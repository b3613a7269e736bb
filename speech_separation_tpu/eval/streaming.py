"""Online (real-time) separation: push audio in, pull separated audio out.

The reference — and this framework's other serving modes — are offline:
they need the whole recording (or an 8 s long-form window) before any
output exists. This engine separates LIVE streams with bounded,
structural latency using either causal architecture:

- the causal TCN (models/tcn.py, ``causal=True``) — spectral masking;
- causal Conv-TasNet (models/convtasnet.py, ``causal=True``) — time-
  domain masking in the learned encoder basis. Its lookahead is one
  encoder window (``filter_len`` samples: 4 ms at the 32/8 kHz default)
  instead of the STFT path's n_fft/2 = 32 ms — the low-latency option.

The TCN/spectral path works like this:

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

The Conv-TasNet/time path is simpler: raw ``filter_len``-sample frames
(stride ``stride``) -> encoder matmul -> causal separator with carried
depthwise-conv state -> masked latents -> decoder matmul -> plain
overlap-add (the learned decoder has no window normalization). No
reflect padding exists, so the only algorithmic latency is the encoder
window itself; output equals the offline ``separate()`` trimmed to the
stream's true length (pinned by tests/test_streaming_time.py).

Two surfaces (both dispatch on the model's DOMAIN):

- :class:`StreamingSeparator` — one stream. One fixed-shape XLA program
  per chunk size; total latency = chunk duration + n_fft/2 samples +
  device time.
- :class:`StreamingPool` — N CONCURRENT streams (the telephony shape:
  many live calls, one chip) batched into ONE chunk program. Streams
  join/leave independently (per-row conv state is zeroed on open and
  frozen via an advance mask while a stream is starved), so slots are
  isolated: each stream's output is identical to running it alone.

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
def _chunk_program(cfg, params, conv_state, frames, advance, num_spk: int):
    """(B, C, n_fft) raw sample frames -> (B, S, C, n_fft) masked windowed
    time-domain frames + new conv state. ``advance`` (B,) float 0/1 rows:
    rows with 0 keep their previous conv state (their frame input is
    dead compute — the pool's starved-slot mechanism). One compiled
    program per (B, chunk_frames) shape — the whole hot path."""
    from ..models.tcn import streaming_forward

    B, C, n_fft = frames.shape
    n_bins = n_fft // 2 + 1
    A = jnp.asarray(_windowed_rdft_matrix(n_fft))
    spec = jnp.dot(frames, A, precision=jax.lax.Precision.HIGHEST)
    re, im = spec[..., :n_bins], spec[..., n_bins:]
    mag = jnp.sqrt(re * re + im * im)

    masks, new_state = streaming_forward(cfg, params, mag, conv_state)
    adv = advance[:, None, None]
    new_state = [jnp.where(adv, n, o) for n, o in zip(new_state, conv_state)]
    masks = masks.reshape(B, C, num_spk, n_bins).transpose(0, 2, 1, 3)

    Bmat = jnp.asarray(_windowed_irdft_matrix(n_fft))
    spec_s = jnp.concatenate([re[:, None] * masks, im[:, None] * masks],
                             axis=-1)
    y = jnp.dot(spec_s, Bmat, precision=jax.lax.Precision.HIGHEST)
    return y, new_state


@partial(jax.jit, static_argnames=("cfg", "num_spk"))
def _time_chunk_program(cfg, params, conv_state, frames, advance, num_spk: int):
    """(B, C, filter_len) raw sample frames -> (B, S, C, filter_len)
    masked-and-decoded time frames + new conv state (causal Conv-TasNet).
    Mirrors models/convtasnet._separate_core frame-for-frame: encoder
    matmul -> streaming separator -> masked latents -> decoder matmul;
    the host overlap-adds (no window normalization — learned decoder)."""
    from ..models.convtasnet import streaming_forward
    from ..ops.mxu import head_dot

    w = jax.nn.relu(head_dot(frames, params["enc"], cfg.mxu_dtype))
    masks, new_state = streaming_forward(cfg, params, w, conv_state)
    adv = advance[:, None, None]
    new_state = [jnp.where(adv, n, o) for n, o in zip(new_state, conv_state)]
    masked = (w[:, :, None, :] * masks).transpose(0, 2, 1, 3)  # (B,S,C,N)
    y = head_dot(masked, params["dec"], cfg.mxu_dtype)
    return y, new_state


class _StreamIO:
    """Host-side bookkeeping for ONE stream: sample buffering in padded
    coordinates (reflect(half) + samples [+ reflect at close]), chunk
    extraction, overlap-add with per-sample window-sum normalization, and
    finalized-sample emission. Owns no model state."""

    def __init__(self, num_spk: int, chunk_frames: int, n_fft: int, hop: int):
        self.S, self.C, self.n_fft, self.hop = num_spk, chunk_frames, n_fft, hop
        self.half = n_fft // 2
        self._w2 = np.asarray(hann_periodic(n_fft)) ** 2
        self._idx = (np.arange(self.C)[:, None] * hop
                     + np.arange(n_fft)[None, :])
        self._raw = []          # pre-pad samples until half+1 are known
        self._buf = None        # np.float32, padded stream suffix
        self._buf_start = 0
        self._n_raw = 0         # total raw samples received
        self._t_done = 0        # frames processed
        self._ola = np.zeros((num_spk, 0), np.float32)
        self._wss = np.zeros((0,), np.float32)
        self._ola_start = 0
        self._emitted = 0       # signal-coordinate samples emitted
        self.closed = False

    def feed(self, samples) -> None:
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._n_raw += len(samples)
        if self._buf is None:
            self._raw.append(samples)
            self._ensure_buf()
        else:
            self._buf = np.concatenate([self._buf, samples])

    def _ensure_buf(self) -> bool:
        if self._buf is not None:
            return True
        raw = (np.concatenate(self._raw) if self._raw
               else np.zeros(0, np.float32))
        if len(raw) < self.half + 1:
            return False
        self._buf = np.concatenate([raw[1: self.half + 1][::-1], raw])
        self._raw = None
        return True

    def has_chunk(self) -> bool:
        """A full chunk of frames is buffered."""
        if self._buf is None:
            return False
        end_pad = (self._t_done + self.C - 1) * self.hop + self.n_fft
        return end_pad <= self._buf_start + len(self._buf)

    def take_chunk(self, tail: bool = False):
        """Extract the next chunk's (C, n_fft) frames and its valid count.
        ``tail`` allows a final partial chunk (zero-padded frames past the
        stream's true frame count)."""
        t0 = self._t_done
        if tail:
            n_valid = min(self.C, num_frames(self._n_raw, self.hop) - t0)
        else:
            n_valid = self.C
        a = t0 * self.hop - self._buf_start
        need = (self.C - 1) * self.hop + self.n_fft
        seg = self._buf[a: a + need]
        if len(seg) < need:
            seg = np.pad(seg, (0, need - len(seg)))
        return seg[self._idx], n_valid

    def accept(self, y: np.ndarray, n_valid: int) -> None:
        """OLA ``n_valid`` frames of (S, C, n_fft) program output."""
        y = y[:, :n_valid, :]
        t0 = self._t_done
        upto = (t0 + n_valid - 1) * self.hop + self.n_fft
        need = upto - self._ola_start - self._wss.shape[0]
        if need > 0:
            self._ola = np.pad(self._ola, [(0, 0), (0, need)])
            self._wss = np.pad(self._wss, (0, need))
        for j in range(n_valid):
            off = (t0 + j) * self.hop - self._ola_start
            self._ola[:, off: off + self.n_fft] += y[:, j, :]
            self._wss[off: off + self.n_fft] += self._w2
        self._t_done += n_valid
        # consumed samples: future frames start at t_done*hop
        cut = self._t_done * self.hop - self._buf_start
        if 0 < cut <= len(self._buf):
            self._buf = self._buf[cut:]
            self._buf_start += cut

    def emit_live(self) -> list:
        return self._emit(max(0, self._t_done * self.hop - self.half))

    def _emit(self, upto_signal: int) -> list:
        n = upto_signal - self._emitted
        if n <= 0:
            return [np.zeros(0, np.float32) for _ in range(self.S)]
        a = self._emitted + self.half - self._ola_start
        num = self._ola[:, a: a + n]
        den = self._wss[a: a + n]
        tiny = np.finfo(np.float32).tiny
        out = np.where(den > tiny, num / den, num).astype(np.float32)
        keep_from = self._t_done * self.hop - self._ola_start
        keep_from = max(0, min(keep_from, a + n))
        self._ola = self._ola[:, keep_from:]
        self._wss = self._wss[keep_from:]
        self._ola_start += keep_from
        self._emitted = upto_signal
        return [out[s] for s in range(self.S)]

    def start_close(self) -> int:
        """Append the end reflect padding; returns the total frame count.
        After this, take_chunk(tail=True)/accept until t_done reaches it,
        then finish_close()."""
        if not self._ensure_buf():
            raise ValueError(f"stream too short ({self._n_raw} samples; "
                             f"need more than n_fft/2 = {self.half})")
        total = self._n_raw
        # reflect_pad_center's right side; raw[k] lives at padded k + half
        get = lambda k: self._buf[k + self.half - self._buf_start]
        right = np.asarray([get(total - 2 - i) for i in range(self.half)],
                           np.float32)
        self._buf = np.concatenate([self._buf, right])
        return num_frames(total, self.hop)

    def finish_close(self) -> list:
        return self._emit(istft_output_length(
            num_frames(self._n_raw, self.hop), self.hop))


class _TimeStreamIO:
    """Host-side bookkeeping for ONE time-domain (Conv-TasNet) stream.
    Same interface as :class:`_StreamIO`, radically simpler math: frames
    are raw ``filter_len``-sample windows at stride ``stride`` with no
    center padding; the decoder's frames overlap-add directly with no
    window-sum normalization. Sample s is final once every frame touching
    it (frames k with k*stride <= s) has been accumulated, i.e. once
    t_done*stride > s — so live latency is one encoder window plus the
    chunk granularity. Frame count and tail zero-padding replicate
    models/convtasnet.valid_latent_frames, so concatenated emissions
    equal offline ``separate()`` trimmed to the true sample count."""

    def __init__(self, num_spk: int, chunk_frames: int, filter_len: int,
                 stride: int):
        self.S, self.C = num_spk, chunk_frames
        self.fl, self.st = filter_len, stride
        self._idx = (np.arange(self.C)[:, None] * stride
                     + np.arange(filter_len)[None, :])
        self._buf = np.zeros((0,), np.float32)
        self._buf_start = 0      # stream coordinate of _buf[0]
        self._n_raw = 0          # total samples received
        self._t_done = 0         # frames processed
        self._ola = np.zeros((num_spk, 0), np.float32)
        self._ola_start = 0
        self._emitted = 0
        self.closed = False

    def feed(self, samples) -> None:
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._n_raw += len(samples)
        self._buf = np.concatenate([self._buf, samples])

    def _total_frames(self) -> int:
        """Offline frame count: ceil(n/stride), >= 1 — exactly
        convtasnet.valid_latent_frames for a generously padded batch."""
        return max(1, -(-self._n_raw // self.st))

    def has_chunk(self) -> bool:
        need = (self._t_done + self.C - 1) * self.st + self.fl
        return need <= self._buf_start + len(self._buf)

    def take_chunk(self, tail: bool = False):
        t0 = self._t_done
        n_valid = min(self.C, self._total_frames() - t0) if tail else self.C
        a = t0 * self.st - self._buf_start
        need = (self.C - 1) * self.st + self.fl
        seg = self._buf[a: a + need]
        if len(seg) < need:  # tail frames read zeros past the stream end
            seg = np.pad(seg, (0, need - len(seg)))
        return seg[self._idx], n_valid

    def accept(self, y: np.ndarray, n_valid: int) -> None:
        """OLA ``n_valid`` frames of (S, C, filter_len) program output."""
        y = y[:, :n_valid, :]
        t0 = self._t_done
        upto = (t0 + n_valid - 1) * self.st + self.fl
        need = upto - self._ola_start - self._ola.shape[1]
        if need > 0:
            self._ola = np.pad(self._ola, [(0, 0), (0, need)])
        for j in range(n_valid):
            off = (t0 + j) * self.st - self._ola_start
            self._ola[:, off: off + self.fl] += y[:, j, :]
        self._t_done += n_valid
        cut = self._t_done * self.st - self._buf_start
        cut = max(0, min(cut, len(self._buf)))
        if cut:
            self._buf = self._buf[cut:]
            self._buf_start += cut

    def emit_live(self) -> list:
        return self._emit(min(self._t_done * self.st, self._n_raw))

    def _emit(self, upto: int) -> list:
        n = upto - self._emitted
        if n <= 0:
            return [np.zeros(0, np.float32) for _ in range(self.S)]
        a = self._emitted - self._ola_start
        out = self._ola[:, a: a + n].astype(np.float32)
        keep_from = max(0, min(self._t_done * self.st - self._ola_start,
                               a + n))
        self._ola = self._ola[:, keep_from:]
        self._ola_start += keep_from
        self._emitted = upto
        return [out[s] for s in range(self.S)]

    def start_close(self) -> int:
        if self._n_raw < 1:
            raise ValueError("stream too short (0 samples)")
        return self._total_frames()

    def finish_close(self) -> list:
        return self._emit(self._n_raw)


class _Model:
    """Loaded causal streaming model shared by the streaming surfaces.
    Accepts the causal TCN (spectral masking) or causal Conv-TasNet
    (time-domain); exposes the per-domain chunk program, IO factory, and
    stream-state initializer so the public surfaces stay domain-blind."""

    def __init__(self, model_path, model_kwargs, n_fft, hop):
        self.arch, self.cfg, self.params, _ = load_model(
            model_path, model_kwargs=model_kwargs)
        causal = getattr(self.cfg, "causal", False)
        if self.arch.NAME not in ("TCN", "ConvTasNet") or not causal:
            raise ValueError(
                "streaming needs a causal model — TCN (models/tcn.py) or "
                "ConvTasNet (models/convtasnet.py) with causal=true; got "
                f"arch={self.arch.NAME} causal={causal}")
        self.domain = getattr(self.arch, "DOMAIN", "spectrum")
        if self.domain == "time":
            self.program = _time_chunk_program
            self._io_args = (self.cfg.filter_len, self.cfg.stride)
            self.frame_width = self.cfg.filter_len
        else:
            if self.cfg.feat_dim != n_fft // 2 + 1:
                raise ValueError(f"model feat_dim {self.cfg.feat_dim} does "
                                 f"not match n_fft {n_fft}")
            self.program = _chunk_program
            self._io_args = (n_fft, hop)
            self.frame_width = n_fft

    def init_stream_state(self, batch: int):
        return self.arch.init_stream_state(self.cfg, batch=batch)

    def make_io(self, chunk_frames: int):
        io_cls = _TimeStreamIO if self.domain == "time" else _StreamIO
        return io_cls(self.cfg.num_spk, chunk_frames, *self._io_args)


class StreamingSeparator:
    """Real-time separation of one audio stream (one model, S tracks).

    ``push(samples)`` accepts any number of float32 samples and returns
    the newly-finalized separated samples (S arrays, possibly empty);
    ``close()`` flushes the tail. Output sample s is emitted exactly once,
    in order, and the concatenated output per track equals the offline
    pipeline's tracks (spectral models: hop*(T-1) samples; time-domain
    models: the stream's exact sample count)."""

    def __init__(self, model_path: str, chunk_frames: int = 16,
                 model_kwargs: dict | None = None, n_fft: int = 512,
                 hop: int = 128):
        self._m = m = _Model(model_path, model_kwargs, n_fft, hop)
        self.cfg, self.params = m.cfg, m.params
        self.S = self.cfg.num_spk
        self._state = m.init_stream_state(batch=1)
        self._io = m.make_io(chunk_frames)
        self._adv = jnp.ones((1,), jnp.float32)

    def _run(self, frames, n_valid):
        y, self._state = self._m.program(
            self.cfg, self.params, self._state, jnp.asarray(frames[None]),
            self._adv, self.S)
        self._io.accept(np.asarray(y)[0], n_valid)

    def push(self, samples) -> list:
        if self._io.closed:
            raise RuntimeError("push after close")
        self._io.feed(samples)
        while self._io.has_chunk():
            frames, n_valid = self._io.take_chunk()
            self._run(frames, n_valid)
        return self._io.emit_live()

    def close(self) -> list:
        if self._io.closed:
            raise RuntimeError("close twice")
        self._io.closed = True
        t_total = self._io.start_close()
        while self._io._t_done < t_total:
            frames, n_valid = self._io.take_chunk(tail=True)
            self._run(frames, n_valid)
        return self._io.finish_close()


class StreamingPool:
    """N concurrent live streams batched into ONE chunk program.

    The production shape for many simultaneous calls on one chip: the
    batched program's per-chunk cost is amortized over every active
    slot, and per-row conv state keeps slots fully isolated — a stream's
    output is bit-identical to running it alone (tests/test_streaming.py).

    Slots join (``open``), receive audio (``push``), and leave
    (``close``) independently. ``step()`` runs one batched chunk over
    every slot that has a full chunk buffered; starved or empty slots
    ride along as dead compute with their conv state frozen by the
    advance mask. Typical loop::

        pool = StreamingPool(model, capacity=8)
        a, b = pool.open(), pool.open()
        pool.push(a, blockA); pool.push(b, blockB)
        for slot, tracks in pool.step().items(): ...
        tracks = pool.close(a)       # flush slot a, slot becomes reusable
    """

    def __init__(self, model_path: str, capacity: int = 8,
                 chunk_frames: int = 16, model_kwargs: dict | None = None,
                 n_fft: int = 512, hop: int = 128):
        self._m = m = _Model(model_path, model_kwargs, n_fft, hop)
        self.cfg, self.params = m.cfg, m.params
        self.S = self.cfg.num_spk
        self.B, self.C = capacity, chunk_frames
        self._state = m.init_stream_state(batch=capacity)
        self._io: list = [None] * capacity

    def open(self) -> int:
        """Claim a free slot; its conv state starts zeroed (= a fresh
        stream's left zero-padding). Returns the slot id."""
        for slot in range(self.B):
            if self._io[slot] is None:
                self._io[slot] = self._m.make_io(self.C)
                self._state = [st.at[slot].set(0.0) for st in self._state]
                return slot
        raise RuntimeError(f"pool full ({self.B} slots)")

    def push(self, slot: int, samples) -> None:
        io = self._io[slot]
        if io is None or io.closed:
            raise RuntimeError(f"slot {slot} is not open")
        io.feed(samples)

    def _run_batched(self, per_slot: dict) -> None:
        """per_slot: {slot: (frames, n_valid)} — one batched chunk."""
        frames = np.zeros((self.B, self.C, self._m.frame_width), np.float32)
        adv = np.zeros((self.B,), np.float32)
        for slot, (f, _nv) in per_slot.items():
            frames[slot] = f
            adv[slot] = 1.0
        y, self._state = self._m.program(
            self.cfg, self.params, self._state, jnp.asarray(frames),
            jnp.asarray(adv), self.S)
        y = np.asarray(y)
        for slot, (_f, n_valid) in per_slot.items():
            self._io[slot].accept(y[slot], n_valid)

    def step(self) -> dict:
        """Advance every slot with a full buffered chunk by one chunk.
        Returns {slot: [S arrays of newly-final samples]} for the slots
        that advanced (empty dict if none were ready)."""
        ready = {slot: io.take_chunk()
                 for slot, io in enumerate(self._io)
                 if io is not None and not io.closed and io.has_chunk()}
        if not ready:
            return {}
        self._run_batched(ready)
        return {slot: self._io[slot].emit_live() for slot in ready}

    def close(self, slot: int) -> list:
        """Flush one stream's tail and free its slot. Returns every
        not-yet-emitted sample of the stream (buffered full chunks are
        drained here too — only this slot advances; others stay frozen)."""
        io = self._io[slot]
        if io is None or io.closed:
            raise RuntimeError(f"slot {slot} is not open")
        while io.has_chunk():
            frames, n_valid = io.take_chunk()
            self._run_batched({slot: (frames, n_valid)})
        io.closed = True
        t_total = io.start_close()
        while io._t_done < t_total:
            frames, n_valid = io.take_chunk(tail=True)
            self._run_batched({slot: (frames, n_valid)})
        out = io.finish_close()
        self._io[slot] = None
        return out
