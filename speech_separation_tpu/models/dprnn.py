"""DPRNN: dual-path recurrent separation in the learned encoder basis.

A beyond-reference architecture (the reference ships the STFT-mask BLSTMs
only, archs/uPIT.py + archs/RSH.py): Luo, Chen & Yoshioka, "Dual-path RNN:
efficient long sequence modeling for time-domain single-channel speech
separation" (ICASSP 2020). Like Conv-TasNet (models/convtasnet.py) it
masks in a learned convolutional encoder basis and trains with uPIT
negative SI-SNR on waveforms (DOMAIN='time'); the separator replaces the
dilated convs with alternating *dual-path* BLSTMs — the move that let
RNN separation scale to the very long latent sequences a small encoder
stride produces:

  encoder:   overlapping frames (filter_len, stride) -> ReLU linear
             basis, exactly Conv-TasNet's (one MXU matmul)
  segment:   latent sequence (T', H) -> overlapping chunks (C, K, H)
             with 50%% overlap (hop P = K/2), implemented as a pad + two
             reshape views (no gather); merge = averaged overlap-add so
             merge(segment(x)) == x exactly
  separator: `blocks` x [ intra-chunk BLSTM over K, batched over B*C
             -> linear 2h->H -> masked gLN -> residual;
             inter-chunk BLSTM over C, batched over B*K
             -> linear 2h->H -> masked gLN -> residual ]
  head:      PReLU + linear H -> S*N on the chunked map, merge, ReLU
             (the paper's gated Tanh/Sigmoid output conv is simplified
             to the Conv-TasNet head contract; noted divergence)
  decoder:   masked latents -> linear basis -> overlap-add, exactly
             Conv-TasNet's
  loss:      min over speaker permutations of negative SI-SNR
             (convtasnet.pairwise_neg_si_snr + ops/pit.py), identical
             normalization to the other time-domain arch.

Why this is the TPU-sweet-spot formulation of recurrence: a flat BLSTM
over T' latent frames (thousands at stride 8) is a serial chain of T'
small matmuls — latency-bound, the exact pathology documented for the
reference BLSTMs in docs/performance.md. Dual-path runs an intra-chunk
BLSTM of K steps batched over B*C rows and an inter-chunk BLSTM of C
steps batched over B*K rows: O(sqrt(T')) sequential steps per block with
MXU-saturating row batches, riding the existing fused-gate scan / Pallas
kernels (models/blstm.py) unchanged.

Padding invariance (same design property as TCN/Conv-TasNet, tested):
frames past each row's true length are zeroed everywhere, gLN statistics
are masked, and BOTH BLSTM directions consume true per-row lengths
(blstm_forward's packed semantics — the backward direction starts at
each row's/chunk's true last frame, so trailing pad chunks cannot evolve
its state), making an utterance's output bit-identical regardless of the
batch/time padding it shares a program with.

Plugin contract (models/registry.py): DOMAIN='time' — waveform batches
via train/wav_data.audio_to_wave_batch, serving via
``separate(cfg, params, state, wav, sample_lengths)`` through the same
fused pipeline/server as Conv-TasNet. Training requires
``--on-device-features`` (no spectral feature files are involved).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .upit import _coerce_kwargs
from .tcn import _linear_init, _cln_init, _prelu
from .convtasnet import (latent_frames, valid_latent_frames,
                         pairwise_neg_si_snr)
from .blstm import init_blstm_params, blstm_forward
from ..dsp.stft import frame_signal, _overlap_add
from ..ops.mxu import head_dot
from ..ops.pit import permutation_min_loss

NAME = "DPRNN"
DOMAIN = "time"


@dataclasses.dataclass(frozen=True)
class Config:
    num_spk: int = 2
    n_filters: int = 64      # encoder basis size (paper's N)
    filter_len: int = 16     # encoder window in samples (2 ms @ 8 kHz)
    stride: int = 8          # encoder hop (paper uses filter_len // 2)
    channels: int = 64       # dual-path feature width (bottlenecked from N)
    rnn_hidden: int = 128    # BLSTM hidden units per direction (paper's H)
    chunk: int = 100         # intra-chunk length K; hop is chunk // 2
    blocks: int = 6          # dual-path blocks (paper's B)
    mask_act: str = "relu"   # "relu" | "sigmoid"
    compute_dtype: str = "float32"  # "bfloat16" = the MXU perf path
    remat: bool = False

    @classmethod
    def from_kwargs(cls, **kwargs):
        return cls(**_coerce_kwargs(cls, kwargs))

    def __post_init__(self):
        if self.mask_act not in ("relu", "sigmoid"):
            raise ValueError(
                f"mask_act must be relu|sigmoid, got {self.mask_act!r}")
        if self.stride <= 0 or self.filter_len < self.stride:
            raise ValueError("need 0 < stride <= filter_len")
        if self.chunk < 2 or self.chunk % 2:
            raise ValueError(f"chunk must be even and >= 2, got {self.chunk}")

    @property
    def mxu_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def hop(self) -> int:
        """Segmentation hop P = K/2 (50%% chunk overlap)."""
        return self.chunk // 2


def init(key, cfg: Config):
    keys = jax.random.split(key, 4 + 2 * cfg.blocks)
    kb = 1.0 / np.sqrt(cfg.filter_len)
    params = {
        "enc": jax.random.uniform(keys[0], (cfg.filter_len, cfg.n_filters),
                                  jnp.float32, -kb, kb),
        "dec": jax.random.uniform(keys[1], (cfg.n_filters, cfg.filter_len),
                                  jnp.float32, -1.0 / np.sqrt(cfg.n_filters),
                                  1.0 / np.sqrt(cfg.n_filters)),
        "in_ln": _cln_init(cfg.n_filters),
        "bottleneck": _linear_init(keys[2], cfg.n_filters, cfg.channels),
        "head": _linear_init(keys[3], cfg.channels,
                             cfg.n_filters * cfg.num_spk),
        "head_prelu": jnp.full((cfg.channels,), 0.25, jnp.float32),
        "blocks": [],
    }
    for i in range(cfg.blocks):
        k_intra, k_inter = jax.random.split(keys[4 + 2 * i])
        k_ip, k_jp = jax.random.split(keys[5 + 2 * i])
        params["blocks"].append({
            "intra_rnn": init_blstm_params(k_intra, cfg.channels,
                                           cfg.rnn_hidden, num_layers=1),
            "intra_proj": _linear_init(k_ip, 2 * cfg.rnn_hidden,
                                       cfg.channels),
            "intra_ln": _cln_init(cfg.channels),
            "inter_rnn": init_blstm_params(k_inter, cfg.channels,
                                           cfg.rnn_hidden, num_layers=1),
            "inter_proj": _linear_init(k_jp, 2 * cfg.rnn_hidden,
                                       cfg.channels),
            "inter_ln": _cln_init(cfg.channels),
        })
    return params, {}


def _dot(x, lin, dtype, out_dtype=None):
    """Matmul in the MXU dtype, f32 accumulation; ``out_dtype`` sets the
    STORAGE dtype of the result (bf16 on the perf path halves the HBM
    bytes of every downstream elementwise/norm pass)."""
    y = head_dot(x, lin["w"], dtype) + lin["b"]
    return y if out_dtype is None else y.astype(out_dtype)


def _gln_nd(x, p, mask, eps=1e-6):
    """Masked global layer norm over all non-batch axes: one (mu, var) per
    utterance over its true positions x all channels, so statistics (hence
    the whole forward) are independent of batch/time padding. x (B, ...,
    Cdim); mask broadcasts against x with 1.0 at true positions.
    Statistics and normalization in float32 regardless of x's storage
    dtype; the result is stored back in x's dtype."""
    xf = x.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    cnt = jnp.maximum(jnp.sum(mask, axis=axes, keepdims=True)
                      * x.shape[-1] / mask.shape[-1], 1.0)
    mu = jnp.sum(xf * mask, axis=axes, keepdims=True) / cnt
    var = jnp.sum(jnp.square((xf - mu) * mask), axis=axes,
                  keepdims=True) / cnt
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["g"]
            + p["b"]).astype(x.dtype)


def num_chunks(cfg: Config, n_t: int) -> int:
    """Chunks covering a T'-frame latent sequence after the segmentation
    pad (front hop + back pad to a hop multiple): every frame lands in
    exactly two chunks, so averaged merge inverts segmentation exactly."""
    P = cfg.hop
    t_pad = P + n_t + (-(P + n_t) % P) + P
    return t_pad // P - 1


def _segment(x, P: int):
    """(B, T, H) -> (B, C, 2P, H) overlapping chunks, hop P, via one pad
    and two reshape views (no gather). Pads P zeros in front and >= P
    behind so every REAL frame is covered by exactly two chunks."""
    B, T, H = x.shape
    back = (-(P + T) % P) + P
    xp = jnp.pad(x, ((0, 0), (P, back), (0, 0)))
    rows = xp.reshape(B, -1, P, H)                    # (B, t_pad/P, P, H)
    return jnp.concatenate([rows[:, :-1], rows[:, 1:]], axis=2)


def _merge(ch, P: int, T: int):
    """Inverse of _segment: averaged overlap-add of (B, C, 2P, H) chunks
    back to (B, T, H). With the front/back padding every frame has
    coverage exactly 2, so merge(segment(x)) == x (tested)."""
    B, C, _K, H = ch.shape
    first, second = ch[:, :, :P], ch[:, :, P:]
    rows = (jnp.pad(first, ((0, 0), (0, 1), (0, 0), (0, 0)))
            + jnp.pad(second, ((0, 0), (1, 0), (0, 0), (0, 0))))
    out = rows.reshape(B, (C + 1) * P, H) * 0.5
    return out[:, P: P + T]


def _chunk_lengths(cfg: Config, vt, C: int):
    """Per-(row, chunk) count of valid frames inside each chunk: chunk c
    spans latent frames [c*P - P, c*P + P) of the unpadded sequence (the
    front pad shifts by one hop), clipped to [0, K]."""
    P = cfg.hop
    starts = jnp.arange(C) * P - P                    # (C,)
    return jnp.clip(vt[:, None] - starts[None, :], 0, cfg.chunk)


def _dual_path(cfg: Config, params, h, vt, C: int):
    """(B, C, K, H) chunked latents -> same shape, after `blocks`
    alternating intra/inter BLSTM blocks with residuals and masked gLN."""
    B = h.shape[0]
    K, H, hid = cfg.chunk, cfg.channels, cfg.rnn_hidden
    clens = _chunk_lengths(cfg, vt, C)                            # (B, C)
    # validity masks in chunk coordinates (frame k of chunk c is real)
    cmask = (jnp.arange(K)[None, None, :] < clens[:, :, None]
             ).astype(jnp.float32)[..., None]                    # (B,C,K,1)
    n_chunks = jnp.maximum((vt + cfg.hop - 1) // cfg.hop + 1, 1)  # (B,)
    zeros1 = jnp.zeros((1, 2, B * C, hid), jnp.float32)
    zeros2 = jnp.zeros((1, 2, B * K, hid), jnp.float32)
    dt = cfg.mxu_dtype          # MXU input AND activation storage dtype
    cm = cmask.astype(dt)
    h = h.astype(dt)
    ilens = jnp.broadcast_to(n_chunks[:, None], (B, K)
                             ).reshape(B * K).astype(jnp.int32)
    klens = clens.reshape(B * C).astype(jnp.int32)

    # Scan engine: use_pallas=None lets blstm_forward pick — the Pallas
    # full-sequence kernel on TPU in bf16 (weights VMEM-resident, K=1
    # time-blocking keeps the streamed blocks under the VMEM ceiling even
    # at dual-path row counts; measured 1.5-1.75x faster per scan than
    # lax.scan at B*C=2592 / B*K=3200 rows — tools/dprnn_anatomy.py), the
    # lax.scan recurrence on CPU / in float32. Rows too large for the
    # kernel's K=1 VMEM budget fall back to the scan automatically.
    def one_block(blk, h, klens, ilens, cmask):
        # intra-chunk: BLSTM over the K frames of every chunk, batched
        # over B*C rows (the MXU-saturating axis); per-chunk true lengths
        # keep the backward direction's start pinned to each chunk's last
        # real frame (padding invariance)
        x = h.reshape(B * C, K, H)
        y, _ = blstm_forward(blk["intra_rnn"], x, klens,
                             zeros1, zeros1, compute_dtype=dt,
                             use_pallas=None, remat_scan_step=cfg.remat)
        y = _dot(y, blk["intra_proj"], dt, dt).reshape(B, C, K, H)
        h = (h + _gln_nd(y, blk["intra_ln"], cmask)) * cm
        # inter-chunk: BLSTM along the chunk axis for every within-chunk
        # position, batched over B*K rows; per-row true chunk counts keep
        # trailing all-pad chunks out of the backward direction
        x = h.transpose(0, 2, 1, 3).reshape(B * K, C, H)
        y, _ = blstm_forward(blk["inter_rnn"], x, ilens,
                             zeros2, zeros2, compute_dtype=dt,
                             use_pallas=None, remat_scan_step=cfg.remat)
        y = _dot(y, blk["inter_proj"], dt, dt)
        y = y.reshape(B, K, C, H).transpose(0, 2, 1, 3)
        return (h + _gln_nd(y, blk["inter_ln"], cmask)) * cm

    # remat is applied HERE, per dual-path block, not around the whole
    # core: a scan's backward saves per-step gate/carry residuals, so 12
    # unrematted scans at production scale hold tens of GB (measured
    # 57 GB at B=32, 4 s audio — an HBM OOM); a whole-core checkpoint
    # would not shrink that peak (the recomputed forward re-saves every
    # scan's residuals at once). Per-block checkpointing bounds live
    # residuals to ONE block's two scans while the rest of the trunk
    # keeps only its (B, C, K, H) block inputs.
    if cfg.remat:
        one_block = jax.checkpoint(one_block)
    for blk in params["blocks"]:
        h = one_block(blk, h, klens, ilens, cmask)
    return h, cmask


def _separate_core(cfg: Config, params, wav, sample_lengths):
    """(B, L) padded waveforms -> (B, S, L) estimated sources — the full
    fused program: frame -> encoder matmul -> segment -> dual-path blocks
    -> head -> merge -> masked latents -> decoder matmul -> overlap-add.
    Same output contract as convtasnet._separate_core (rows are not
    trimmed to sample_lengths; callers slice or mask)."""
    B, L = wav.shape
    n_t = latent_frames(cfg, L)
    frames = frame_signal(wav, cfg.filter_len, cfg.stride, n_t)
    w = jax.nn.relu(head_dot(frames, params["enc"], cfg.mxu_dtype))
    vt = valid_latent_frames(cfg, sample_lengths, n_t)
    tmask = (jnp.arange(n_t)[None, :] < vt[:, None]
             ).astype(jnp.float32)[:, :, None]
    w = w * tmask

    ad = cfg.mxu_dtype
    h = _dot(_gln_nd(w.astype(ad), params["in_ln"], tmask),
             params["bottleneck"], cfg.mxu_dtype, ad) * tmask.astype(ad)
    C = num_chunks(cfg, n_t)
    h, cmask = _dual_path(cfg, params, _segment(h, cfg.hop), vt, C)

    out = _dot(_prelu(h, params["head_prelu"]), params["head"],
               cfg.mxu_dtype) * cmask                  # (B, C, K, S*N)
    out = _merge(out, cfg.hop, n_t)                    # (B, T', S*N)
    out = out.reshape(B, n_t, cfg.num_spk, cfg.n_filters)
    act = jax.nn.relu if cfg.mask_act == "relu" else jax.nn.sigmoid
    masks = act(out) * tmask[:, :, None, :]

    masked = (w[:, :, None, :] * masks).transpose(0, 2, 1, 3)  # (B,S,T',N)
    S = cfg.num_spk
    dec_frames = head_dot(masked.reshape(B * S, n_t, cfg.n_filters),
                          params["dec"], cfg.mxu_dtype)
    y = _overlap_add(dec_frames, cfg.stride)
    out_len = y.shape[-1]
    if out_len < L:
        y = jnp.pad(y, ((0, 0), (0, L - out_len)))
    return y[:, :L].reshape(B, S, L)


def separate(cfg: Config, params, state, wav, sample_lengths):
    """Serving entry (DOMAIN='time' contract): estimated source waveforms
    for padded mixtures. state/rng-free — deterministic and mode-free."""
    return _separate_core(cfg, params, wav, sample_lengths)


def loss_fn(cfg: Config, params, state, batch, rng, train: bool):
    """uPIT over negative SI-SNR on waveforms — identical objective,
    normalization, and aux contract to convtasnet.loss_fn (norm = #real
    utterances, so epoch means read as mean per-utterance -SI-SNR dB)."""
    mix, srcs = batch["mix_wav"], batch["source_wavs"]
    n, row_mask = batch["sample_lengths"], batch["row_mask"]
    L = mix.shape[-1]
    # cfg.remat acts per dual-path block inside _dual_path (see there) —
    # a whole-core checkpoint would not reduce the scans' residual peak
    est = _separate_core(cfg, params, mix, n)
    smask = (jnp.arange(L)[None, :] < n[:, None]).astype(jnp.float32)
    pair = pairwise_neg_si_snr(est * smask[:, None, :], srcs, smask)
    min_losses, best_perm = permutation_min_loss(pair, cfg.num_spk)
    total = jnp.sum(min_losses * row_mask) / cfg.num_spk
    norm = jnp.sum(row_mask)
    return total / norm, {"norm": norm, "total": total, "new_state": state,
                          "best_perm": best_perm}
