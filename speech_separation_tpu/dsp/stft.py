"""STFT / iSTFT with librosa semantics, as batched XLA programs.

The reference extracts features with ``librosa.core.stft(audio, n_fft=512,
hop_length=128)`` (reference steps/extract_feats.py:76-78,98) and resynthesizes
with ``librosa.core.istft(S, hop_length=128)`` (steps/reconstruct_sources.py:40).
That means, concretely:

- periodic ("fftbins") Hann window of length n_fft;
- center=True: the signal is reflect-padded by n_fft//2 on both sides;
- n_frames = 1 + len(x) // hop;
- istft windows each inverse frame, overlap-adds, divides by the summed
  squared window (guarded against ~0), and trims n_fft//2 from both ends,
  returning hop * (n_frames - 1) samples.

TPU-native design decisions:

1. **No complex dtypes on device.** The TPU backend in this environment has
   no complex support, and complex is a poor fit for the MXU anyway. For the
   small n_fft used in speech (512), the real DFT is expressed as a single
   dense matmul against a precomputed (n_fft, 2*n_bins) matrix with the
   analysis window folded in — so the whole forward STFT is
   ``gather frames -> one MXU matmul`` and the inverse is
   ``one MXU matmul -> overlap-add``. At n_fft=512 the DFT matrix is ~0.5 MB
   and lives in VMEM; the matmul is compute-trivial next to HBM traffic and
   lets XLA fuse the magnitude/mask elementwise ops around it.

2. **Batching over ragged utterances.** Each signal is reflect-padded around
   its *own* end on the host (cheap memory op), then zero-padded to the
   batch length, so boundary frames match per-utterance extraction exactly.
   The batched iSTFT masks frames past each row's true frame count out of
   both the overlap-add and its window-sum-square normalizer, making it
   per-sample exact.

3. The numpy ``stft_np`` / ``istft_np`` implement the same spec with
   np.fft — the golden reference for tests and host-side fallback.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class STFTConfig:
    """Feature-extraction configuration (reference steps/extract_feats.py:23-31)."""
    n_fft: int = 512
    hop: int = 128
    sample_rate: int = 8000

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1


def hann_periodic(n_fft: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window: 0.5 - 0.5*cos(2*pi*n/N), n = 0..N-1.

    Identical to scipy.signal.get_window('hann', N, fftbins=True), which is
    what librosa.stft uses by default.
    """
    n = np.arange(n_fft)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)).astype(dtype)


def num_frames(n_samples: int, hop: int) -> int:
    """Frame count for a center=True STFT: 1 + floor(len / hop)."""
    return 1 + n_samples // hop


def istft_output_length(n_frames: int, hop: int) -> int:
    """Samples returned by a center=True iSTFT: hop * (n_frames - 1)."""
    return hop * (n_frames - 1)


def reflect_pad_center(x: np.ndarray, n_fft: int) -> np.ndarray:
    """Host-side center padding: reflect by n_fft//2 on both sides."""
    return np.pad(x, n_fft // 2, mode="reflect")


# ---------------------------------------------------------------------------
# Real-DFT matrices (window folded in) — the MXU formulation
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _windowed_rdft_matrix(n_fft: int) -> np.ndarray:
    """(n_fft, 2*n_bins) float32 matrix A with the Hann window folded in.

    frames @ A == concat([Re(rfft(frames * w)), Im(rfft(frames * w))], -1)
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w = hann_periodic(n_fft, np.float64)[:, None]
    return np.concatenate([w * np.cos(ang), w * -np.sin(ang)], axis=1).astype(np.float32)


@lru_cache(maxsize=8)
def _windowed_irdft_matrix(n_fft: int) -> np.ndarray:
    """(2*n_bins, n_fft) float32 matrix B with the synthesis window folded in.

    concat([re, im], -1) @ B == irfft(re + i*im, n_fft) * w

    Uses hermitian symmetry: irfft(X)[n] = (1/N) * (X_0 + (-1)^n X_{N/2}
    + 2*sum_{k=1}^{N/2-1} (re_k cos(2 pi k n/N) - im_k sin(2 pi k n/N))).
    """
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    coef = np.full((n_bins, 1), 2.0)
    coef[0, 0] = 1.0
    coef[n_bins - 1, 0] = 1.0
    w = hann_periodic(n_fft, np.float64)[None, :]
    top = coef * np.cos(ang) / n_fft * w      # re rows
    bot = coef * -np.sin(ang) / n_fft * w     # im rows
    return np.concatenate([top, bot], axis=0).astype(np.float32)


# ---------------------------------------------------------------------------
# numpy golden reference (host side; complex is fine here)
# ---------------------------------------------------------------------------

def stft_np(x: np.ndarray, n_fft: int = 512, hop: int = 128) -> np.ndarray:
    """Single-signal STFT, librosa layout (freq, time), complex64."""
    x = np.asarray(x, dtype=np.float32)
    w = hann_periodic(n_fft)
    xp = reflect_pad_center(x, n_fft)
    n_t = num_frames(len(x), hop)
    out = np.empty((n_fft // 2 + 1, n_t), dtype=np.complex64)
    for t in range(n_t):
        frame = xp[t * hop: t * hop + n_fft] * w
        out[:, t] = np.fft.rfft(frame)
    return out


def istft_np(S: np.ndarray, hop: int = 128) -> np.ndarray:
    """Single-signal iSTFT, librosa semantics; returns hop*(T-1) samples."""
    n_bins, n_t = S.shape
    n_fft = 2 * (n_bins - 1)
    w = hann_periodic(n_fft).astype(np.float64)
    total = n_fft + hop * (n_t - 1)
    y = np.zeros(total, dtype=np.float64)
    wss = np.zeros(total, dtype=np.float64)
    for t in range(n_t):
        frame = np.fft.irfft(S[:, t], n=n_fft).real
        y[t * hop: t * hop + n_fft] += frame * w
        wss[t * hop: t * hop + n_fft] += w * w
    safe = wss > np.finfo(np.float32).tiny
    y[safe] /= wss[safe]
    half = n_fft // 2
    return y[half: total - half].astype(np.float32)


# ---------------------------------------------------------------------------
# JAX batched implementations (jit-compiled, static shapes, complex-free)
# ---------------------------------------------------------------------------

def frame_signal(xp: jnp.ndarray, n_fft: int, hop: int, n_t: int) -> jnp.ndarray:
    """Gather overlapping frames: (B, L) -> (B, n_t, n_fft).

    Uses a static gather-index matrix; XLA lowers this to an efficient
    strided gather and fuses the matmul that follows.
    """
    idx = (np.arange(n_t)[:, None] * hop + np.arange(n_fft)[None, :])
    return jnp.take(xp, jnp.asarray(idx), axis=-1)


@partial(jax.jit, static_argnames=("n_fft", "hop", "n_t"))
def stft_centered_batch(xp: jnp.ndarray, n_fft: int, hop: int, n_t: int
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched STFT over already center-padded signals.

    Args:
      xp: (B, Lp) float32, each row reflect-padded around its own signal with
          n_fft//2 on both sides (see reflect_pad_center), then zero-padded
          to the common length Lp >= max_i(len_i + n_fft).
      n_t: number of frames to compute (covers the longest row).

    Returns (re, im), each (B, n_t, n_fft//2+1) float32, time-major. Rows'
    frames past their true frame count are garbage and must be masked or
    trimmed by the caller.
    """
    n_bins = n_fft // 2 + 1
    frames = frame_signal(xp, n_fft, hop, n_t)
    A = jnp.asarray(_windowed_rdft_matrix(n_fft))
    spec = jnp.dot(frames, A, precision=jax.lax.Precision.HIGHEST)
    return spec[..., :n_bins], spec[..., n_bins:]


@partial(jax.jit, static_argnames=("n_fft", "hop", "n_t"))
def stft_magnitude_batch(xp: jnp.ndarray, n_fft: int, hop: int, n_t: int) -> jnp.ndarray:
    """|STFT| directly (the training feature; reference extract_feats.py:76-78)."""
    re, im = stft_centered_batch(xp, n_fft, hop, n_t)
    return jnp.sqrt(re * re + im * im)


@partial(jax.jit, static_argnames=("hop",))
def _overlap_add_divisible(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add for n_fft divisible by hop, with no scatter.

    frames: (B, T, n_fft). Each frame is split into R = n_fft//hop chunks of
    `hop` samples; chunk k of frame t lands at offset (t + k) * hop. Summing
    the R shifted chunk-streams is a pure reshape+pad+add program — ideal
    for XLA (no dynamic indexing at all).
    Output: (B, (T - 1 + R) * hop) = (B, n_fft + hop*(T-1)).
    """
    B, T, n_fft = frames.shape
    R = n_fft // hop
    total = (T - 1 + R) * hop
    chunks = frames.reshape(B, T, R, hop)
    out = jnp.zeros((B, total), frames.dtype)
    for k in range(R):
        stream = chunks[:, :, k, :].reshape(B, T * hop)
        out = out.at[:, k * hop: k * hop + T * hop].add(stream)
    return out


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    B, T, n_fft = frames.shape
    if n_fft % hop == 0:
        return _overlap_add_divisible(frames, hop)
    # general case: scatter-add on flattened positions
    total = n_fft + hop * (T - 1)
    pos = (np.arange(T)[:, None] * hop + np.arange(n_fft)[None, :]).reshape(-1)
    out = jnp.zeros((B, total), frames.dtype)
    return out.at[:, jnp.asarray(pos)].add(frames.reshape(B, -1))


@partial(jax.jit, static_argnames=("hop",))
def istft_batch(re: jnp.ndarray, im: jnp.ndarray, frame_counts: jnp.ndarray,
                hop: int = 128) -> jnp.ndarray:
    """Batched iSTFT with per-sample frame masking.

    Args:
      re, im: (B, T, n_bins) float32, time-major; rows may contain garbage
         frames past their true count.
      frame_counts: (B,) int32 — true frame count per row.

    Returns (B, n_fft + hop*(T-1)) float32 — the *untrimmed* overlap-add.
    Row i's valid output is [n_fft//2 : n_fft//2 + hop*(frame_counts[i]-1)],
    matching librosa.istft's center trim; the caller slices it (host side,
    where ragged lengths live).

    The window-sum-square normalizer is computed per sample over only its
    true frames, so batching shorter rows with longer ones is exact.
    """
    B, T, n_bins = re.shape
    n_fft = 2 * (n_bins - 1)
    Bmat = jnp.asarray(_windowed_irdft_matrix(n_fft))
    mask = (jnp.arange(T)[None, :] < frame_counts[:, None]).astype(re.dtype)

    spec = jnp.concatenate([re, im], axis=-1) * mask[:, :, None]
    frames = jnp.dot(spec, Bmat, precision=jax.lax.Precision.HIGHEST)
    y = _overlap_add(frames, hop)

    w = jnp.asarray(hann_periodic(n_fft))
    w2 = (w * w)[None, None, :] * mask[:, :, None]
    wss = _overlap_add(jnp.broadcast_to(w2, (B, T, n_fft)), hop)
    tiny = np.finfo(np.float32).tiny
    return jnp.where(wss > tiny, y / wss, y)
