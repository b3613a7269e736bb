"""SepFormer: dual-path attention separation in the learned encoder basis.

A beyond-reference architecture completing the model-family matrix
(Subakan et al., "Attention is all you need in speech separation",
ICASSP 2021): same learned encoder/decoder and 50%-overlap dual-path
chunking as DPRNN (models/dprnn.py — the segmentation, merge, chunk-
length, and masked-gLN machinery is imported from there, one
implementation), but the intra-chunk and inter-chunk processors are
TRANSFORMER layers (pre-LN multi-head self-attention + FFN) instead of
BLSTMs. Zero recurrence anywhere: every FLOP is a batched matmul, the
purest MXU mapping of any arch in the repo — attention over chunk
positions is (B*C, K, K) score matmuls, attention over chunks is
(B*K, C, C), both tiny and dense.

  encoder:   overlapping frames -> ReLU linear basis (convtasnet's)
  segment:   (T', H) -> 50%-overlap chunks (C, K, H)   (dprnn's)
  separator: `blocks` x [ intra transformer layer over K, batched over
             B*C; inter transformer layer over C, batched over B*K ],
             each layer = x + MHA(LN(x)) ; x + FFN(LN(x)) with key
             masking to the true positions, sinusoidal PE added to the
             attention input (PE inside the residual branch only, as in
             SepFormer), masked gLN on block output
  head/decoder/loss: exactly the DPRNN/Conv-TasNet contract
             (PReLU + linear -> merge -> ReLU masks; masked latents ->
             decoder -> OLA; uPIT negative SI-SNR).

The paper's 8-layer-per-path / 2-repeat 26M-param configuration is
scaled to `blocks` dual-path blocks of one layer per path by default;
`d_ff`, `heads`, `blocks` recover larger variants. Divergences from the
paper (documented design choices, not bugs): one layer per path per
block, no final gated output conv (the Conv-TasNet ReLU head), and gLN
instead of post-norm.

Padding invariance (tested, same discipline as DPRNN): attention logits
additively mask invalid KEY positions per row (so softmax weights live
only on true frames/chunks), query rows at pad positions are re-zeroed
by the chunk mask, and gLN statistics are masked — an utterance's
output is independent of the batch/time padding it shares a program
with. DOMAIN='time': waveform batches, `separate()` serving, same CLI/
pipeline/server surfaces.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .upit import _coerce_kwargs
from .tcn import _linear_init, _cln_init, _prelu, _cln
from .convtasnet import (latent_frames, valid_latent_frames,
                         pairwise_neg_si_snr)
from .dprnn import (_gln_nd, _segment, _merge, num_chunks, _chunk_lengths,
                    _dot)
from ..dsp.stft import frame_signal, _overlap_add
from ..ops.mxu import head_dot
from ..ops.pit import permutation_min_loss

NAME = "SepFormer"
DOMAIN = "time"


@dataclasses.dataclass(frozen=True)
class Config:
    num_spk: int = 2
    n_filters: int = 64      # encoder basis size
    filter_len: int = 16     # encoder window in samples (2 ms @ 8 kHz)
    stride: int = 8          # encoder hop
    channels: int = 64       # dual-path model width (d_model)
    heads: int = 4           # attention heads (channels % heads == 0)
    d_ff: int = 256          # FFN inner width
    chunk: int = 100         # intra-chunk length K; hop is chunk // 2
    blocks: int = 4          # dual-path blocks (intra+inter layer each)
    mask_act: str = "relu"   # "relu" | "sigmoid"
    compute_dtype: str = "float32"  # "bfloat16" = the MXU perf path
    remat: bool = False
    # Opt-in fused Pallas attention (ops/attention_pallas.py): exact, and
    # it eliminates the logits' HBM round-trips, but at the default
    # geometry (dh=16, K=100) it MEASURED SLOWER than the XLA einsum path
    # on the chip (161 vs 128 ms full step) — Mosaic serializes the
    # per-row (100,16)@(16,100) matmuls where XLA's batched-matmul
    # pipelining keeps the MXU fed. Kept as a knob for geometries with
    # larger dh/K where the HBM saving wins (docs/performance.md).
    fused_attention: bool = False

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
        if self.channels % self.heads:
            raise ValueError(f"channels ({self.channels}) must divide by "
                             f"heads ({self.heads})")

    @property
    def mxu_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def hop(self) -> int:
        return self.chunk // 2


def _layer_init(key, cfg: Config):
    """One pre-LN transformer layer: MHA (qkv + out) + FFN."""
    H = cfg.channels
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "ln1": _cln_init(H),
        "qkv": _linear_init(k1, H, 3 * H),
        "out": _linear_init(k2, H, H),
        "ln2": _cln_init(H),
        "ff1": _linear_init(k3, H, cfg.d_ff),
        "ff2": _linear_init(k4, cfg.d_ff, H),
    }


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
        "blocks": [{"intra": _layer_init(keys[4 + 2 * i], cfg),
                    "inter": _layer_init(keys[5 + 2 * i], cfg)}
                   for i in range(cfg.blocks)],
    }
    return params, {}


def _sinusoid_pe(T: int, H: int):
    """Standard sinusoidal positional encoding, (T, H) float32."""
    pos = np.arange(T)[:, None]
    div = np.exp(np.arange(0, H, 2) * (-np.log(10000.0) / H))
    pe = np.zeros((T, H), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div[: pe[:, 1::2].shape[1]])
    return jnp.asarray(pe)


def _attention(layer, x, key_mask, cfg: Config):
    """Pre-LN MHA over axis 1. x (R, T, H); key_mask (R, T) 1.0 at true
    KEY positions (invalid keys get -inf logits, so every query's softmax
    is supported on real positions only — pad-row queries produce junk
    that the caller's chunk mask re-zeroes)."""
    R, T, H = x.shape
    ad = x.dtype                 # activation storage dtype (bf16 perf path)
    nh, dh = cfg.heads, H // cfg.heads
    y = _cln(x, layer["ln1"]) + _sinusoid_pe(T, H).astype(ad)
    qkv = _dot(y, layer["qkv"], cfg.mxu_dtype, ad).reshape(R, T, 3, nh, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # (R, T, nh, dh)
    if cfg.fused_attention:
        # fused Pallas attention — QK^T, masking, softmax, AV all
        # VMEM-resident per (row, head); the (R, nh, T, T) logits never
        # touch HBM (ops/attention_pallas.py). Opt-in: measured slower
        # than the einsum path at the default dh=16 geometry (see Config)
        from ..ops.attention_pallas import chunk_attention
        fold = lambda t: t.transpose(0, 2, 1, 3).reshape(R * nh, T, dh)
        km = jnp.broadcast_to(key_mask[:, None, :], (R, nh, T)
                              ).reshape(R * nh, T)
        o = chunk_attention(fold(q), fold(k), fold(v), km)
        o = o.reshape(R, nh, T, dh).transpose(0, 2, 1, 3).reshape(R, T, H)
        o = o.astype(ad)
    else:
        # attention matmuls run at the MXU dtype's rate with f32
        # accumulation; the softmax itself stays f32 (bf16 logits would
        # quantize the distribution and the -1e9 key masking)
        logits = jnp.einsum("rqhd,rkhd->rhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(dh)
        logits = logits + (1.0 - key_mask)[:, None, None, :] * (-1e9)
        w = jax.nn.softmax(logits, axis=-1).astype(ad)
        o = jnp.einsum("rhqk,rkhd->rqhd", w, v,
                       preferred_element_type=jnp.float32
                       ).reshape(R, T, H).astype(ad)
    x = x + _dot(o, layer["out"], cfg.mxu_dtype, ad)
    y = _dot(_cln(x, layer["ln2"]), layer["ff1"], cfg.mxu_dtype, ad)
    return x + _dot(jax.nn.relu(y), layer["ff2"], cfg.mxu_dtype, ad)


def _dual_path(cfg: Config, params, h, vt, C: int):
    """(B, C, K, H) chunked latents -> same shape, after `blocks`
    alternating intra/inter attention blocks with masked gLN."""
    B = h.shape[0]
    K, H = cfg.chunk, cfg.channels
    clens = _chunk_lengths(cfg, vt, C)                           # (B, C)
    cmask = (jnp.arange(K)[None, None, :] < clens[:, :, None]
             ).astype(jnp.float32)[..., None]                    # (B,C,K,1)
    n_chunks = jnp.maximum((vt + cfg.hop - 1) // cfg.hop + 1, 1)  # (B,)
    kmask_intra = cmask[..., 0].reshape(B * C, K)
    kmask_inter = jnp.broadcast_to(
        (jnp.arange(C)[None, :] < n_chunks[:, None]
         ).astype(jnp.float32)[:, None, :], (B, K, C)).reshape(B * K, C)

    # each _attention layer carries its own pre-LN residuals (x + MHA,
    # x + FFN), so the dual-path wrapper only re-masks pad positions —
    # attention of a pad-row query reads real keys (its key mask is
    # support-only) and would otherwise leak nonzero junk into pad slots
    ad = cfg.mxu_dtype          # activation storage dtype in the trunk
    h = h.astype(ad)
    cm = cmask.astype(ad)
    for blk in params["blocks"]:
        x = h.reshape(B * C, K, H)
        y = _attention(blk["intra"], x, kmask_intra, cfg)
        h = y.reshape(B, C, K, H) * cm
        x = h.transpose(0, 2, 1, 3).reshape(B * K, C, H)
        y = _attention(blk["inter"], x, kmask_inter, cfg)
        h = y.reshape(B, K, C, H).transpose(0, 2, 1, 3) * cm
    return h, cmask


def _separate_core(cfg: Config, params, wav, sample_lengths):
    """(B, L) padded waveforms -> (B, S, L) estimated sources; the
    Conv-TasNet/DPRNN fused-program contract (rows not trimmed)."""
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
               cfg.mxu_dtype) * cmask
    out = _merge(out, cfg.hop, n_t)
    out = out.reshape(B, n_t, cfg.num_spk, cfg.n_filters)
    act = jax.nn.relu if cfg.mask_act == "relu" else jax.nn.sigmoid
    masks = act(out) * tmask[:, :, None, :]

    masked = (w[:, :, None, :] * masks).transpose(0, 2, 1, 3)
    S = cfg.num_spk
    dec_frames = head_dot(masked.reshape(B * S, n_t, cfg.n_filters),
                          params["dec"], cfg.mxu_dtype)
    y = _overlap_add(dec_frames, cfg.stride)
    out_len = y.shape[-1]
    if out_len < L:
        y = jnp.pad(y, ((0, 0), (0, L - out_len)))
    return y[:, :L].reshape(B, S, L)


def separate(cfg: Config, params, state, wav, sample_lengths):
    """Serving entry (DOMAIN='time' contract) — deterministic, mode-free."""
    return _separate_core(cfg, params, wav, sample_lengths)


def loss_fn(cfg: Config, params, state, batch, rng, train: bool):
    """uPIT over negative SI-SNR on waveforms (the shared time-domain
    objective — convtasnet.loss_fn semantics and aux contract)."""
    mix, srcs = batch["mix_wav"], batch["source_wavs"]
    n, row_mask = batch["sample_lengths"], batch["row_mask"]
    L = mix.shape[-1]
    sep = _separate_core
    if cfg.remat:
        sep = jax.checkpoint(_separate_core, static_argnums=(0,))
    est = sep(cfg, params, mix, n)
    smask = (jnp.arange(L)[None, :] < n[:, None]).astype(jnp.float32)
    pair = pairwise_neg_si_snr(est * smask[:, None, :], srcs, smask)
    min_losses, best_perm = permutation_min_loss(pair, cfg.num_spk)
    total = jnp.sum(min_losses * row_mask) / cfg.num_spk
    norm = jnp.sum(row_mask)
    return total / norm, {"norm": norm, "total": total, "new_state": state,
                          "best_perm": best_perm}
