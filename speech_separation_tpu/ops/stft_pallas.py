"""Pallas TPU kernel: fused framing + window + real-DFT STFT.

The XLA formulation (dsp/stft.py) materializes the overlapping frames
(a 4x expansion of the audio) in HBM between the gather and the DFT
matmul. This kernel keeps the whole row pipeline in VMEM:

- grid=(B,): each program owns one padded signal row (audio rows are small
  — a 12 s utterance is 400 KB — so the full row sits in VMEM);
- framing is R = n_fft/hop strided *reshapes* of the row (no gather at
  all: chunk k of frame t starts at (t+k)*hop, so frames = concat of R
  contiguous reshaped views — the same algebra the scatter-free
  overlap-add uses, run in reverse);
- the windowed DFT matrix (n_fft, 2*n_bins, window folded in) is VMEM-
  resident across the whole grid, and each frame tile goes straight to the
  MXU; the only HBM writes are the final spectra.

Semantics and numerics are identical to dsp.stft.stft_centered_batch
(tested); magnitude mode fuses |.| for the training-feature path.

Measured verdict (v5e, 64 x 6 s rows): 1.37 ms vs the XLA formulation's
1.11 ms — XLA's own fusion already keeps the frame expansion out of HBM
here, and both run >280k audio-seconds/sec, four orders of magnitude above
the pipeline's needs. The XLA path therefore stays the default; this
kernel is kept as the measured comparison point and as the starting point
if a future configuration (bigger n_fft, fused downstream consumers)
changes the balance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dsp.stft import _windowed_rdft_matrix


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _make_kernel(n_fft: int, hop: int, n_t: int, tile_t: int,
                 magnitude: bool, rows: int):
    R = n_fft // hop
    n_bins = n_fft // 2 + 1
    n_tiles = -(-n_t // tile_t)

    def kernel(xp_ref, A_ref, out_ref):
        for tile in range(n_tiles):  # static unroll (2-4 tiles typically)
            t0 = tile * tile_t
            tt = min(tile_t, n_t - t0)
            # frames[r, t, k*hop:(k+1)*hop] = xp[r, (t0+t+k)*hop : ...] — R
            # contiguous reshapes instead of an overlapping gather,
            # vectorized over the block's rows
            chunks = [
                xp_ref[:, (t0 + k) * hop:(t0 + k + tt) * hop].reshape(rows, tt, hop)
                for k in range(R)
            ]
            frames = jnp.concatenate(chunks, axis=2).reshape(rows * tt, n_fft)
            spec = jnp.dot(frames, A_ref[:],
                           preferred_element_type=jnp.float32)
            if magnitude:
                re = spec[:, :n_bins]
                im = spec[:, n_bins:]
                spec = jnp.sqrt(re * re + im * im)
            out_ref[:, t0:t0 + tt, :] = spec.reshape(rows, tt, -1)

    return kernel


@partial(jax.jit, static_argnames=("n_fft", "hop", "n_t", "magnitude",
                                   "tile_t", "interpret"))
def stft_pallas(xp: jnp.ndarray, n_fft: int, hop: int, n_t: int,
                magnitude: bool = False, tile_t: int = 256,
                interpret: bool | None = None):
    """Fused STFT over center-padded rows (layout of stft_centered_batch).

    Args:
      xp: (B, Lp) float32, Lp >= (n_t-1)*hop + n_fft.
      magnitude: emit |STFT| (B, n_t, n_bins) instead of the (re, im) pair.

    Returns (re, im) each (B, n_t, n_bins), or magnitude (B, n_t, n_bins).
    """
    if interpret is None:
        interpret = _interpret_default()
    assert n_fft % hop == 0, "pallas path assumes hop divides n_fft"
    B, Lp = xp.shape
    need = (n_t - 1) * hop + n_fft
    assert Lp >= need, (Lp, need)
    n_bins = n_fft // 2 + 1
    out_cols = n_bins if magnitude else 2 * n_bins
    A = jnp.asarray(_windowed_rdft_matrix(n_fft))

    # TPU tiling wants >=8 sublanes per block and a 128-aligned lane dim:
    # process 8 rows per grid step (which also batches the frame matmul)
    # and pad rows / row length as needed
    ROWS = 8
    B_pad = -(-B // ROWS) * ROWS
    Lp_pad = -(-Lp // 128) * 128
    if B_pad != B or Lp_pad != Lp:
        xp = jnp.pad(xp, ((0, B_pad - B), (0, Lp_pad - Lp)))

    out = pl.pallas_call(
        _make_kernel(n_fft, hop, n_t, tile_t, magnitude, ROWS),
        grid=(B_pad // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, Lp_pad), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, 2 * n_bins), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, n_t, out_cols), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, n_t, out_cols), jnp.float32),
        interpret=interpret,
    )(xp, A)
    out = out[:B]
    if magnitude:
        return out
    return out[..., :n_bins], out[..., n_bins:]
