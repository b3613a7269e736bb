"""TCN architecture: dilated temporal-convolution mask estimation.

A beyond-reference third architecture (the reference ships uPIT + RSH,
archs/*.py) demonstrating that the plugin contract (models/registry.py)
is a real extension point — and that this framework's TPU-first design
pays off: unlike the BLSTMs, a TCN has **no serial recurrence**, so every
FLOP is a batched matmul/conv the MXU can tile freely. The separator is
the Conv-TasNet masking stack (Luo & Mesgarani, 2019) applied to STFT
magnitudes, so it drops into the exact uPIT pipeline — same batch layout,
same PIT loss and normalization (ops/pit.py, reference archs/uPIT.py:
157-206 semantics), same (B, T, S*F) sigmoid-mask head contract — and
therefore the same extraction, training, inference, reconstruction,
scoring, serving, and data-parallel paths, unchanged.

  model: 1x1 input projection (F -> channels) -> R repeats of X residual
         blocks (1x1 -> PReLU -> cLN -> depthwise dilated conv, dilation
         2^i -> PReLU -> cLN -> 1x1 residual + 1x1 skip) -> PReLU over the
         summed skips -> 1x1 head (-> S*F) -> sigmoid.
  loss:  identical to uPIT (min over speaker permutations of summed MSE
         between masked mixture and permuted sources, same norm).
  infer: same forward, eval mode == train mode (no batch statistics).

Design properties (deliberate differences from the reference BLSTMs):
- **Padding invariance**: frames past each row's true length are zeroed
  after the input projection and after every block, so outputs for an
  utterance are bit-identical regardless of how much padding its batch
  carries (the BLSTMs' padded BatchNorm is batch-dependent by reference
  fidelity; this arch is new, so it gets the clean semantics). Pinned by
  tests/test_tcn.py.
- **Normalization is per-frame (cLN)**, not batch: no running statistics,
  no train/eval divergence, nothing to carry in ``state``.
- All 1x1 convolutions run as (B*T, C) matmuls in the configured MXU
  dtype with float32 accumulation; the depthwise conv is a cheap VPU op.

Batch layout (device): identical to uPIT —
  mix      (B, T, F)    zero-padded magnitude spectra
  sources  (B, S, T, F) zero-padded source magnitudes
  lengths  (B,) int32   true frame counts
  row_mask (B,) f32     1.0 for real rows, 0.0 for shape-padding dummies
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .upit import _coerce_kwargs
from ..ops.mxu import head_dot

NAME = "TCN"


@dataclasses.dataclass(frozen=True)
class Config:
    feat_dim: int = 257
    num_spk: int = 2
    channels: int = 256      # residual path width (Conv-TasNet B)
    hidden: int = 512        # block inner width (Conv-TasNet H)
    kernel: int = 3          # depthwise kernel size (P)
    blocks: int = 8          # dilated blocks per repeat (X): dilation 2^i
    repeats: int = 4         # repeats (R); defaults land ~13.2M params,
    # matching the reference BLSTM scale for throughput comparability
    compute_dtype: str = "float32"  # "bfloat16" = the MXU perf path
    remat: bool = False
    # causal=True left-pads every depthwise conv so frame t depends only
    # on frames <= t — the streaming-inference variant (eval/streaming.py);
    # the rest of the network (per-frame cLN/PReLU/1x1) is already causal
    causal: bool = False

    @classmethod
    def from_kwargs(cls, **kwargs):
        return cls(**_coerce_kwargs(cls, kwargs))

    @property
    def mxu_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def dilations(self) -> list:
        return [2 ** (i % self.blocks)
                for i in range(self.repeats * self.blocks)]

    @property
    def receptive_field(self) -> int:
        """Frames of (left, in causal mode) context one output depends on."""
        return 1 + (self.kernel - 1) * sum(self.dilations())


def _linear_init(key, n_in, n_out):
    kb = 1.0 / np.sqrt(n_in)
    kw, kbias = jax.random.split(key)
    return {"w": jax.random.uniform(kw, (n_in, n_out), jnp.float32, -kb, kb),
            "b": jax.random.uniform(kbias, (n_out,), jnp.float32, -kb, kb)}


def _cln_init(dim):
    return {"g": jnp.ones((dim,), jnp.float32),
            "b": jnp.zeros((dim,), jnp.float32)}


def init(key, cfg: Config):
    keys = jax.random.split(key, 2 + cfg.repeats * cfg.blocks)
    params = {
        "in_proj": _linear_init(keys[0], cfg.feat_dim, cfg.channels),
        "in_ln": _cln_init(cfg.feat_dim),
        "head": _linear_init(keys[1], cfg.channels,
                             cfg.feat_dim * cfg.num_spk),
        "head_prelu": jnp.full((cfg.channels,), 0.25, jnp.float32),
        "blocks": [],
    }
    for r in range(cfg.repeats):
        for x in range(cfg.blocks):
            k = keys[2 + r * cfg.blocks + x]
            k1, k2, k3, k4, k5 = jax.random.split(k, 5)
            kd = 1.0 / np.sqrt(cfg.kernel)
            params["blocks"].append({
                "expand": _linear_init(k1, cfg.channels, cfg.hidden),
                "prelu1": jnp.full((cfg.hidden,), 0.25, jnp.float32),
                "ln1": _cln_init(cfg.hidden),
                # depthwise kernel: (K, H), centered (non-causal)
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
    """1x1 conv as a batched matmul in the MXU dtype, f32 accumulation.
    ``out_dtype`` (the perf path passes bfloat16) sets the STORAGE dtype
    of the result: on a bandwidth-bound block stack the (B, T, hidden)
    activation tensors dominate HBM traffic, and storing them in bf16
    halves every downstream elementwise/norm pass's bytes (measured 1.66x
    on the Conv-TasNet separator grad — tools/convtasnet_anatomy.py)."""
    y = head_dot(x, lin["w"], dtype) + lin["b"]
    return y if out_dtype is None else y.astype(out_dtype)


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


def _cln(x, p, eps=1e-6):
    """Per-frame (channelwise) layer norm — no batch statistics, so eval
    mode == train mode and padding rows cannot leak into real rows.
    Statistics and normalization in float32 regardless of x's storage
    dtype; the result is stored back in x's dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["g"]
            + p["b"]).astype(x.dtype)


def _depthwise(x, kernel, bias, dilation: int, causal: bool = False):
    """Depthwise dilated conv over time. x (B, T, H), kernel (K, H).
    Centered (SAME, (K-1)//2*d each side) or causal ((K-1)*d left).
    Runs in x's dtype (a 3-tap depthwise accumulation loses nothing
    meaningful in bf16; A/B'd against a shift-and-add formulation, the
    grouped conv op is the faster lowering — tools/convtasnet_anatomy.py)."""
    K = kernel.shape[0]
    if causal:
        pad = ((K - 1) * dilation, 0)
    else:
        pad = ((K - 1) // 2 * dilation,) * 2
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype)[:, None, :],    # (K, 1, H) = (spatial, in/group, out)
        window_strides=(1,), padding=[pad],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1])
    return y + bias.astype(x.dtype)


def forward(cfg: Config, params, state, x, lengths, row_mask, rng,
            train: bool):
    """Returns (masks, state) with masks (B, T, feat_dim*num_spk) — the
    uPIT head contract (source s occupies [s*F:(s+1)*F]). ``rng``/``train``
    are accepted for the plugin contract; the forward is deterministic and
    mode-free."""
    B, T, F = x.shape
    ad = cfg.mxu_dtype   # activation STORAGE dtype: bf16 on the perf path
    tmask = (jnp.arange(T)[None, :] < lengths[:, None]
             ).astype(jnp.float32)[:, :, None]
    tm = tmask.astype(ad)
    h = _dot(_cln(x, params["in_ln"]), params["in_proj"], cfg.mxu_dtype, ad)
    h = h * tm
    for i, blk in enumerate(params["blocks"]):
        dilation = 2 ** (i % cfg.blocks)
        y = _dot(h, blk["expand"], cfg.mxu_dtype, ad)
        # mask before the depthwise conv: pad frames otherwise carry
        # bias/LN constants into real frames' conv windows, which would
        # differ from the conv's own zero padding at the T boundary and
        # break padding invariance
        y = _cln(_prelu(y, blk["prelu1"]), blk["ln1"]) * tm
        y = _depthwise(y, blk["dw"], blk["dw_b"], dilation, cfg.causal)
        y = _cln(_prelu(y, blk["prelu2"]), blk["ln2"])
        # residual continues the trunk; skips accumulate toward the head
        h = (h + _dot(y, blk["res"], cfg.mxu_dtype, ad)) * tm
        s = _dot(y, blk["skip"], cfg.mxu_dtype, ad) * tm
        skips = s if i == 0 else skips + s
    out = _dot(_prelu(skips, params["head_prelu"]), params["head"],
               cfg.mxu_dtype)   # head logits back in f32
    return jax.nn.sigmoid(out) * tmask, state


def init_stream_state(cfg: Config, batch: int = 1):
    """Zeroed per-block depthwise-conv context — (B, (K-1)*d, hidden) per
    block. Zeros reproduce the offline causal conv's left zero-padding, so
    a stream started from this state matches the offline forward exactly."""
    return [jnp.zeros((batch, (cfg.kernel - 1) * d, cfg.hidden), jnp.float32)
            for d in cfg.dilations()]


def streaming_forward(cfg: Config, params, x, conv_state):
    """One chunk of the causal forward with explicit conv context.

    x: (B, C, F) magnitude frames (all real — streaming has no padding);
    conv_state: from init_stream_state / a previous call. Returns
    (masks (B, C, feat_dim*num_spk), new_conv_state). Equivalent to the
    offline causal forward on the concatenated stream: every op except the
    depthwise conv is per-frame, and the conv sees its full left context
    via the carried state (VALID conv over concat(state, y)).
    """
    assert cfg.causal, "streaming_forward requires a causal config"
    ad = cfg.mxu_dtype   # same activation storage dtype as the offline
    # forward, so streamed output == offline output in EVERY numeric config
    h = _dot(_cln(x, params["in_ln"]), params["in_proj"], cfg.mxu_dtype, ad)
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
    return jax.nn.sigmoid(out), new_state


def loss_fn(cfg: Config, params, state, batch, rng, train: bool):
    """The shared uPIT-contract objective (upit.contract_loss) — one
    implementation, so the 'identical loss/normalization to uPIT' claim
    behind every cross-arch comparison holds by construction."""
    from .upit import contract_loss
    return contract_loss(forward, cfg, params, state, batch, rng, train)


def infer_masks(cfg: Config, params, state, batch, rng):
    from .upit import contract_infer
    return contract_infer(forward, cfg, params, state, batch, rng)
