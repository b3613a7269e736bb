"""RSH architecture: recurrent selective hearing — iterative one-speaker-at-
a-time extraction with a residual attention channel.

Functional reimplementation of the reference arch plugin (archs/RSH.py):

  input:  combo = concat(mix magnitude, attention mask) along frequency,
          attention initialized to ones (archs/RSH.py:108-109,134-135);
  model:  BLSTM(2*feat_dim -> 600x2, 2 layers) -> padded BatchNorm ->
          Linear(1200 -> feat_dim) -> sigmoid — ONE mask per forward pass
          (archs/RSH.py:155-184);
  loss:   num_spk sequential passes per sub-batch of like speaker count.
          Each pass estimates one mask, computes its MSE against every
          source, excludes sources already claimed by that sample (+Inf),
          takes the per-sample greedy argmin, then subtracts the mask from
          the attention channel. The residual-update rule is a property of
          the CODE PATH, not of the train flag: compute_loss always applies
          relu(combo - [0, mask]) (archs/RSH.py:254-257) — including when
          invoked for CV under model.eval() via compute_cv_loss
          (archs/RSH.py:190-194, steps/train_qsub.py:131) — while
          compute_masks subtracts without relu (archs/RSH.py:278-281).
          Here loss_fn therefore relus unconditionally and only BN obeys
          the train flag; infer_masks never relus;
  state:  the LSTM hidden state carries over BETWEEN passes — the reference
          initializes self.hidden once per sub-batch (archs/RSH.py:212) and
          each forward reuses and overwrites it (archs/RSH.py:172). BN
          running stats likewise update once per pass in train mode.

Speaker-count grouping: the reference collator splits each batch into
sub-batches by speaker count (archs/RSH.py:50-69). On TPU that becomes a
host-side batching decision — the data pipeline groups utterances by
num_spk so each device batch has a single static S (SURVEY.md §7 hard
part 4); this module is jit-compiled once per distinct S.

Batch layout: like upit — mix (B,T,F), sources (B,S,T,F), lengths, row_mask.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .blstm import init_blstm_params, blstm_forward, random_hidden
from ..ops.batchnorm import init_batchnorm, batchnorm_apply
from ..ops.mxu import head_dot

NAME = "RSH"


@dataclasses.dataclass(frozen=True)
class Config:
    feat_dim: int = 257
    hidden: int = 600
    num_layers: int = 2
    zero_init_hidden: bool = False
    # num_spk is per-batch (variable) for RSH, not a model property;
    # kept for interface compatibility with key=value model configs.
    num_spk: int = 2
    compute_dtype: str = "float32"  # see upit.Config
    remat: bool = False             # see upit.Config

    @classmethod
    def from_kwargs(cls, **kwargs):
        from .upit import _coerce_kwargs
        return cls(**_coerce_kwargs(cls, kwargs))

    @property
    def input_dim(self) -> int:
        return 2 * self.feat_dim

    @property
    def mxu_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def init(key, cfg: Config):
    k1, k2, k3 = jax.random.split(key, 3)
    out_dim = 2 * cfg.hidden
    kb = 1.0 / np.sqrt(out_dim)
    bn_params, bn_state = init_batchnorm(out_dim)
    params = {
        "blstm": init_blstm_params(k1, cfg.input_dim, cfg.hidden, cfg.num_layers),
        "bn": bn_params,
        "lin": {
            "w": jax.random.uniform(k2, (out_dim, cfg.feat_dim), jnp.float32, -kb, kb),
            "b": jax.random.uniform(k3, (cfg.feat_dim,), jnp.float32, -kb, kb),
        },
    }
    return params, {"bn": bn_state}


def _forward_pass(cfg: Config, params, bn_state, combo, lengths, row_mask,
                  hidden, train: bool):
    """One extraction pass. Returns (mask (B,T,F), new_bn_state, new_hidden)."""
    h0, c0 = hidden
    y, hidden_out = blstm_forward(params["blstm"], combo, lengths, h0, c0,
                                  compute_dtype=cfg.mxu_dtype,
                                  save_activations=train)
    y, bn_state = batchnorm_apply(params["bn"], bn_state, y, row_mask, train)
    # head matmul: bf16 gradients too in bfloat16 mode (ops/mxu.py)
    y = head_dot(y, params["lin"]["w"], cfg.mxu_dtype) + params["lin"]["b"]
    return jax.nn.sigmoid(y), bn_state, hidden_out


def _init_hidden(cfg: Config, rng, B: int):
    if cfg.zero_init_hidden:
        shape = (cfg.num_layers, 2, B, cfg.hidden)
        return jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)
    return random_hidden(rng, cfg.num_layers, B, cfg.hidden)


def _make_combo(mix, lengths):
    """concat(mix, ones-within-length) along freq (archs/RSH.py:108-109)."""
    B, T, F = mix.shape
    atten = (jnp.arange(T)[None, :] < lengths[:, None]).astype(mix.dtype)
    return jnp.concatenate([mix, jnp.broadcast_to(atten[:, :, None], (B, T, F))], axis=-1)


def loss_fn(cfg: Config, params, state, batch, rng, train: bool):
    """num_spk greedy-assignment extraction passes over one sub-batch.

    The speaker count S is taken from batch['sources'].shape[1] (static
    under jit — the host groups utterances by speaker count).
    Scalar = (sum over passes of per-sample greedy-min MSE / S) /
             (S * sum(lengths) * feat_dim), matching archs/RSH.py:240-241.
    """
    mix, sources = batch["mix"], batch["sources"]
    lengths, row_mask = batch["lengths"], batch["row_mask"]
    B, T, F = mix.shape
    S = sources.shape[1]

    combo = _make_combo(mix, lengths)
    hidden = _init_hidden(cfg, rng, B)
    bn_state = state["bn"]

    fwd_pass = _forward_pass
    if cfg.remat:
        # args: (cfg, params, bn_state, combo, lengths, row_mask, hidden, train)
        fwd_pass = jax.checkpoint(_forward_pass, static_argnums=(0, 7))

    used = jnp.zeros((B, S), bool)
    total = 0.0
    assignments = []
    masks = []
    for _ in range(S):
        mask, bn_state, hidden = fwd_pass(
            cfg, params, bn_state, combo, lengths, row_mask, hidden, train)
        masked = mask * mix
        # per-source error: (B, S)
        err = jnp.sum(jnp.square(masked[:, None, :, :] - sources), axis=(2, 3))
        err = jnp.where(used, jnp.inf, err)
        idx = jnp.argmin(err, axis=1)
        min_losses = jnp.min(err, axis=1)
        used = used | jax.nn.one_hot(idx, S, dtype=bool)
        total = total + jnp.sum(min_losses * row_mask) / S
        assignments.append(idx)
        masks.append(mask)

        # residual attention update: the loss path ALWAYS relus the
        # subtracted residual (archs/RSH.py:256 runs unconditionally in
        # compute_loss, CV included); only infer_masks skips the relu
        # (archs/RSH.py:280). The train flag governs BN alone.
        update = jnp.concatenate([jnp.zeros_like(mask), mask], axis=-1)
        combo = jax.nn.relu(combo - update)

    norm = S * jnp.sum(lengths.astype(jnp.float32) * row_mask) * cfg.feat_dim
    return total / norm, {"norm": norm, "total": total,
                          "new_state": {"bn": bn_state},
                          "assignments": jnp.stack(assignments, axis=1),
                          "masks": jnp.stack(masks, axis=1)}


def infer_masks(cfg: Config, params, state, batch, rng, num_spk: int):
    """Test pass: num_spk extraction passes, returning (B, num_spk, T, F)
    masks in pass order (saved as s1..sN, archs/RSH.py:283-287)."""
    mix, lengths = batch["mix"], batch["lengths"]
    row_mask = batch["row_mask"]
    B = mix.shape[0]

    combo = _make_combo(mix, lengths)
    hidden = _init_hidden(cfg, rng, B)
    bn_state = state["bn"]

    masks = []
    for _ in range(num_spk):
        mask, bn_state, hidden = _forward_pass(
            cfg, params, bn_state, combo, lengths, row_mask, hidden, train=False)
        masks.append(mask)
        update = jnp.concatenate([jnp.zeros_like(mask), mask], axis=-1)
        combo = combo - update  # no relu at test (archs/RSH.py:280)

    return jnp.stack(masks, axis=1)
