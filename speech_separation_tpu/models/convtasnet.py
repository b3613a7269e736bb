"""Conv-TasNet: time-domain separation with a learned encoder/decoder.

A beyond-reference architecture (the reference ships STFT-mask models only,
archs/uPIT.py + archs/RSH.py) representing the post-reference state of the
art: instead of masking a fixed STFT, the model learns a convolutional
encoder basis, masks in that learned latent space, and resynthesizes with a
learned decoder (Luo & Mesgarani, "Conv-TasNet", TASLP 2019). Trained with
utterance-level permutation-invariant negative SI-SNR directly on
waveforms, it typically beats magnitude-mask BLSTMs by a wide margin —
and it is the most TPU-friendly family in the repo: zero recurrence, every
FLOP a batched matmul/conv the MXU tiles freely, and the whole
wav -> separated-wavs program fuses into one XLA executable (no STFT, no
iSTFT, no host round trips).

  encoder: overlapping frames (filter_len window, stride hop) -> ReLU
           linear basis (filter_len -> n_filters)  [one MXU matmul]
  separator: LN -> 1x1 bottleneck -> R repeats of X dilated residual
           blocks (1x1 -> PReLU -> norm -> depthwise dilated conv ->
           PReLU -> norm -> {1x1 residual, 1x1 skip}) -> PReLU ->
           1x1 head -> mask activation, giving num_spk masks over the
           latent space
  decoder: masked latents -> linear basis (n_filters -> filter_len) ->
           overlap-add  [one MXU matmul + the scatter-free OLA from
           dsp/stft]
  loss:    min over speaker permutations of summed negative SI-SNR
           (scale-invariant SNR, zero-mean over each utterance's true
           samples), decomposed pairwise exactly like ops/pit.py — S^2
           pairwise terms, min over S! assignments.

Plugin-contract notes (models/registry.py): this arch declares
``DOMAIN = "time"`` — its ``loss_fn`` consumes WAVEFORM batches
  mix_wav        (B, L)    zero-padded mixtures
  source_wavs    (B, S, L) zero-padded sources
  sample_lengths (B,) int32 true sample counts
  row_mask       (B,) f32  1.0 for real rows
(train/wav_data.audio_to_wave_batch builds these from the same shipped
audio batches the waveform-direct STFT models use), and instead of
``infer_masks`` it exposes ``separate(cfg, params, state, wav,
sample_lengths) -> (B, S, L)`` estimated source waveforms — the serving
pipeline (eval/pipeline.py) branches on DOMAIN. Training requires
``--on-device-features`` (there are no spectral feature files to train
from; that's the point).

Padding invariance is a design property like the TCN's: per-utterance
masked statistics (gLN sums over each row's true frames only; cLN is
per-frame), masked frame chains, and zero batch padding mean an
utterance's separated samples are bit-identical regardless of how much
batch/time padding it shares a batch with (tested).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .upit import _coerce_kwargs
from .tcn import _linear_init, _cln_init, _prelu, _cln
from ..dsp.stft import frame_signal, _overlap_add
from ..ops.mxu import head_dot
from ..ops.pit import permutation_min_loss

NAME = "ConvTasNet"
DOMAIN = "time"


@dataclasses.dataclass(frozen=True)
class Config:
    num_spk: int = 2
    n_filters: int = 256     # encoder basis size (paper's N)
    filter_len: int = 32     # encoder window in samples (L): 4 ms @ 8 kHz
    stride: int = 16         # encoder hop; filter_len//2 is canonical
    channels: int = 128      # bottleneck / residual width (B)
    hidden: int = 512        # block inner width (H)
    kernel: int = 3          # depthwise kernel (P)
    blocks: int = 8          # dilated blocks per repeat (X), dilation 2^i
    repeats: int = 3         # repeats (R)
    norm: str = "gln"        # "gln" (offline, masked global stats) | "cln"
    mask_act: str = "relu"   # "relu" | "sigmoid"
    compute_dtype: str = "float32"  # "bfloat16" = the MXU perf path
    remat: bool = False
    # causal=True left-pads the depthwise convs and forces cLN — the
    # streaming-capable variant (frame t depends only on frames <= t)
    causal: bool = False

    @classmethod
    def from_kwargs(cls, **kwargs):
        return cls(**_coerce_kwargs(cls, kwargs))

    def __post_init__(self):
        if self.causal and self.norm == "gln":
            # gLN reads future frames' statistics; silently keeping it
            # would fake causality
            object.__setattr__(self, "norm", "cln")
        if self.mask_act not in ("relu", "sigmoid"):
            raise ValueError(f"mask_act must be relu|sigmoid, got {self.mask_act!r}")
        if self.norm not in ("gln", "cln"):
            raise ValueError(f"norm must be gln|cln, got {self.norm!r}")
        if self.stride <= 0 or self.filter_len < self.stride:
            raise ValueError("need 0 < stride <= filter_len")

    @property
    def mxu_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def dilations(self) -> list:
        return [2 ** (i % self.blocks)
                for i in range(self.repeats * self.blocks)]

    @property
    def receptive_field(self) -> int:
        """Latent frames of (left, in causal mode) context per output."""
        return 1 + (self.kernel - 1) * sum(self.dilations())


def init(key, cfg: Config):
    keys = jax.random.split(key, 4 + cfg.repeats * cfg.blocks)
    kb = 1.0 / np.sqrt(cfg.filter_len)
    params = {
        # encoder/decoder bases (filter_len <-> n_filters linear maps)
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
    kd = 1.0 / np.sqrt(cfg.kernel)
    for i in range(cfg.repeats * cfg.blocks):
        k1, k2, k3, k4, k5 = jax.random.split(keys[4 + i], 5)
        params["blocks"].append({
            "expand": _linear_init(k1, cfg.channels, cfg.hidden),
            "prelu1": jnp.full((cfg.hidden,), 0.25, jnp.float32),
            "ln1": _cln_init(cfg.hidden),
            "dw": jax.random.uniform(k2, (cfg.kernel, cfg.hidden),
                                     jnp.float32, -kd, kd),
            "dw_b": jax.random.uniform(k3, (cfg.hidden,), jnp.float32,
                                       -kd, kd),
            "prelu2": jnp.full((cfg.hidden,), 0.25, jnp.float32),
            "ln2": _cln_init(cfg.hidden),
            "res": _linear_init(k4, cfg.hidden, cfg.channels),
            "skip": _linear_init(k5, cfg.hidden, cfg.channels),
        })
    return params, {}


def _dot(x, lin, dtype, out_dtype=None):
    y = head_dot(x, lin["w"], dtype) + lin["b"]
    return y if out_dtype is None else y.astype(out_dtype)


def _gln(x, p, tmask, eps=1e-6):
    """Global layer norm with MASKED statistics: one (mu, var) per
    utterance over its true frames x all channels. Masking makes the
    statistics — hence the whole forward — independent of batch/time
    padding, and exactly matches the unpadded computation. Statistics
    and normalization in float32 regardless of x's storage dtype; the
    result is stored back in x's dtype (bf16 on the perf path halves
    the HBM bytes of this two-pass op — tools/convtasnet_anatomy.py)."""
    xf = x.astype(jnp.float32)
    C = x.shape[-1]
    cnt = jnp.maximum(jnp.sum(tmask, axis=(1, 2), keepdims=True) * C, 1.0)
    mu = jnp.sum(xf * tmask, axis=(1, 2), keepdims=True) / cnt
    var = jnp.sum(jnp.square((xf - mu) * tmask), axis=(1, 2),
                  keepdims=True) / cnt
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["g"]
            + p["b"]).astype(x.dtype)


def _norm(x, p, tmask, kind: str):
    return _cln(x, p) if kind == "cln" else _gln(x, p, tmask)


def _depthwise(x, kernel, bias, dilation: int, causal: bool):
    """Depthwise dilated conv over time, run in x's STORAGE dtype (bf16 on
    the perf path — a 3-tap depthwise accumulation loses nothing meaningful
    in bf16, and the grouped conv op is the faster lowering vs shift-and-add
    per the A/B in tools/convtasnet_anatomy.py)."""
    K = kernel.shape[0]
    pad = ((K - 1) * dilation, 0) if causal else ((K - 1) // 2 * dilation,) * 2
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype)[:, None, :], window_strides=(1,),
        padding=[pad], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1])
    return y + bias.astype(x.dtype)


def latent_frames(cfg: Config, total_samples: int) -> int:
    """Encoder frames for a padded signal of ``total_samples``."""
    return (total_samples - cfg.filter_len) // cfg.stride + 1


def valid_latent_frames(cfg: Config, sample_lengths, n_t: int):
    """Per-row count of encoder frames touching real samples: frame k
    (starting at k*stride) carries signal iff k*stride < n."""
    c = (sample_lengths + cfg.stride - 1) // cfg.stride
    return jnp.clip(c, 1, n_t).astype(jnp.int32)


def _mask_logits(cfg: Config, params, w, tmask):
    """Latent mixture representation -> per-speaker masks.

    w: (B, T', N) encoder output (already frame-masked).
    Returns (B, T', S, N) masks in [0, inf) (relu) or (0, 1) (sigmoid).
    """
    ad = cfg.mxu_dtype   # activation STORAGE dtype: bf16 on the perf path
    tm = tmask.astype(ad)
    h = _dot(_norm(w.astype(ad), params["in_ln"], tmask, cfg.norm),
             params["bottleneck"], cfg.mxu_dtype, ad) * tm
    for i, blk in enumerate(params["blocks"]):
        dilation = 2 ** (i % cfg.blocks)
        y = _dot(h, blk["expand"], cfg.mxu_dtype, ad)
        # mask before the conv so pad frames carry zeros, not bias/LN
        # constants, into real frames' conv windows (padding invariance)
        y = _norm(_prelu(y, blk["prelu1"]), blk["ln1"], tmask, cfg.norm) * tm
        y = _depthwise(y, blk["dw"], blk["dw_b"], dilation, cfg.causal)
        y = _norm(_prelu(y, blk["prelu2"]), blk["ln2"], tmask, cfg.norm)
        h = (h + _dot(y, blk["res"], cfg.mxu_dtype, ad)) * tm
        s = _dot(y, blk["skip"], cfg.mxu_dtype, ad) * tm
        skips = s if i == 0 else skips + s
    out = _dot(_prelu(skips, params["head_prelu"]), params["head"],
               cfg.mxu_dtype)   # head logits back in f32
    B, Tl, _ = out.shape
    out = out.reshape(B, Tl, cfg.num_spk, cfg.n_filters)
    act = jax.nn.relu if cfg.mask_act == "relu" else jax.nn.sigmoid
    return act(out) * tmask[:, :, None, :]


def _separate_core(cfg: Config, params, wav, sample_lengths):
    """(B, L) padded waveforms -> (B, S, L) estimated sources.

    The full fused program: frame -> encoder matmul -> TCN masking ->
    masked latents -> decoder matmul -> overlap-add. Output rows are
    zero past stride*(T'-1)+filter_len and are NOT trimmed/masked to
    sample_lengths — callers slice (serving) or mask (loss)."""
    B, L = wav.shape
    n_t = latent_frames(cfg, L)
    frames = frame_signal(wav, cfg.filter_len, cfg.stride, n_t)
    w = jax.nn.relu(head_dot(frames, params["enc"], cfg.mxu_dtype))
    vt = valid_latent_frames(cfg, sample_lengths, n_t)
    tmask = (jnp.arange(n_t)[None, :] < vt[:, None]
             ).astype(jnp.float32)[:, :, None]
    w = w * tmask
    masks = _mask_logits(cfg, params, w, tmask)      # (B, T', S, N)
    masked = (w[:, :, None, :] * masks).transpose(0, 2, 1, 3)  # (B,S,T',N)
    S = cfg.num_spk
    dec_frames = head_dot(masked.reshape(B * S, n_t, cfg.n_filters),
                          params["dec"], cfg.mxu_dtype)
    y = _overlap_add(dec_frames, cfg.stride)          # (B*S, fl+st*(T'-1))
    out_len = y.shape[-1]
    if out_len < L:
        y = jnp.pad(y, ((0, 0), (0, L - out_len)))
    return y[:, :L].reshape(B, S, L)


def separate(cfg: Config, params, state, wav, sample_lengths):
    """Serving entry (DOMAIN='time' contract): estimated source waveforms
    for padded mixtures. state/rng-free — the forward is deterministic and
    mode-free (no batch statistics anywhere)."""
    return _separate_core(cfg, params, wav, sample_lengths)


def pairwise_neg_si_snr(est, ref, smask, eps: float = 1e-8):
    """NEG[b, i, j] = -SI-SNR(est_i, ref_j) over each row's true samples.

    est, ref: (B, S, L); smask (B, L) 1.0 at valid samples. SI-SNR =
    10 log10(||s_t||^2 / ||e_n||^2) with s_t the projection of est onto
    ref and both signals zero-meaned over the valid samples (the standard
    scale-invariant definition). Pairwise decomposition mirrors
    ops/pit.pairwise_mse: S^2 terms, min over S! downstream. Pad rows
    (all-zero) evaluate to the finite constant -10 log10(1) = 0 via the
    eps guards, so row_mask multiplication stays NaN-free."""
    sm = smask[:, None, :]
    cnt = jnp.maximum(jnp.sum(smask, axis=-1), 1.0)[:, None, None]
    est = (est - jnp.sum(est * sm, axis=-1, keepdims=True) / cnt) * sm
    ref = (ref - jnp.sum(ref * sm, axis=-1, keepdims=True) / cnt) * sm
    hi = jax.lax.Precision.HIGHEST
    dot = jnp.einsum("bil,bjl->bij", est, ref, precision=hi)
    ref_pow = jnp.sum(jnp.square(ref), axis=-1)       # (B, S)
    est_pow = jnp.sum(jnp.square(est), axis=-1)       # (B, S)
    s_target = jnp.square(dot) / (ref_pow[:, None, :] + eps)
    e_noise = jnp.maximum(est_pow[:, :, None] - s_target, 0.0)
    si_snr = 10.0 * jnp.log10((s_target + eps) / (e_noise + eps))
    return -si_snr


def init_stream_state(cfg: Config, batch: int = 1):
    """Zeroed per-block depthwise-conv context — (B, (K-1)*d, hidden) per
    block, exactly like tcn.init_stream_state. Zeros reproduce the offline
    causal conv's left zero-padding, so a stream started from this state
    matches the offline forward bit-for-bit."""
    return [jnp.zeros((batch, (cfg.kernel - 1) * d, cfg.hidden), jnp.float32)
            for d in cfg.dilations()]


def streaming_forward(cfg: Config, params, w, conv_state):
    """One chunk of the causal separator with explicit conv context.

    w: (B, C, n_filters) encoder latents (all frames real — streaming has
    no padding, so the causal cLN path needs no tmask); conv_state from
    init_stream_state / a previous call. Returns (masks (B, C, S, N),
    new_conv_state). Equivalent to the offline _mask_logits on the
    concatenated stream: every op except the depthwise conv is per-frame,
    and the conv sees its full left context via the carried state (VALID
    conv over concat(state, y))."""
    assert cfg.causal, "streaming_forward requires a causal config"
    ad = cfg.mxu_dtype   # same activation storage dtype as the offline
    # forward, so streamed output == offline output in EVERY numeric config
    h = _dot(_cln(w.astype(ad), params["in_ln"]), params["bottleneck"],
             cfg.mxu_dtype, ad)
    new_state = []
    for i, blk in enumerate(params["blocks"]):
        dilation = 2 ** (i % cfg.blocks)
        y = _dot(h, blk["expand"], cfg.mxu_dtype, ad)
        y = _cln(_prelu(y, blk["prelu1"]), blk["ln1"])
        ctx = jnp.concatenate([conv_state[i].astype(ad), y], axis=1)
        new_state.append(ctx[:, ctx.shape[1] - conv_state[i].shape[1]:, :])
        y = jax.lax.conv_general_dilated(
            ctx, blk["dw"].astype(ad)[:, None, :], window_strides=(1,),
            padding=[(0, 0)], rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=ctx.shape[-1]) + blk["dw_b"].astype(ad)
        y = _cln(_prelu(y, blk["prelu2"]), blk["ln2"])
        h = h + _dot(y, blk["res"], cfg.mxu_dtype, ad)
        s = _dot(y, blk["skip"], cfg.mxu_dtype, ad)
        skips = s if i == 0 else skips + s
    out = _dot(_prelu(skips, params["head_prelu"]), params["head"],
               cfg.mxu_dtype)
    B, C, _ = out.shape
    out = out.reshape(B, C, cfg.num_spk, cfg.n_filters)
    act = jax.nn.relu if cfg.mask_act == "relu" else jax.nn.sigmoid
    return act(out), new_state


def loss_fn(cfg: Config, params, state, batch, rng, train: bool):
    """uPIT over negative SI-SNR on waveforms. aux mirrors the spectral
    archs' contract: 'total'/'norm' feed the loop's norm-weighted epoch
    means (here norm = #real utterances, so the epoch mean is the mean
    per-utterance negative SI-SNR in dB — directly interpretable),
    'new_state'/'best_perm' as usual."""
    mix, srcs = batch["mix_wav"], batch["source_wavs"]
    n, row_mask = batch["sample_lengths"], batch["row_mask"]
    L = mix.shape[-1]
    sep = _separate_core
    if cfg.remat:
        sep = jax.checkpoint(_separate_core, static_argnums=(0,))
    est = sep(cfg, params, mix, n)                    # (B, S, L)
    smask = (jnp.arange(L)[None, :] < n[:, None]).astype(jnp.float32)
    pair = pairwise_neg_si_snr(est * smask[:, None, :], srcs, smask)
    min_losses, best_perm = permutation_min_loss(pair, cfg.num_spk)
    total = jnp.sum(min_losses * row_mask) / cfg.num_spk
    norm = jnp.sum(row_mask)
    return total / norm, {"norm": norm, "total": total, "new_state": state,
                          "best_perm": best_perm}
