"""uPIT architecture: BLSTM mask estimation with utterance-level
permutation-invariant training.

Functional reimplementation of the reference arch plugin (archs/uPIT.py):

  model:  2-layer bidirectional LSTM (600/dir) over mixture magnitude
          spectra -> BatchNorm1d(1200) on the padded output (padding frames
          included in the statistics — archs/uPIT.py:138) -> Linear(1200 ->
          feat_dim*num_spk) -> sigmoid, giving num_spk masks stacked along
          the frequency axis (archs/uPIT.py:115-147).
  loss:   min over speaker permutations of the summed elementwise MSE
          between mask * mixture and the permuted source magnitudes;
          scalar = (sum_b min_perm / num_spk) / (sum lengths * feat_dim)
          (archs/uPIT.py:157-206).
  infer:  same forward; per-source masks are the feat_dim-sized slices of
          the output (archs/uPIT.py:209-225).

Quirks preserved (config-gated where noted):
- the initial LSTM hidden state is drawn from N(0,1) per batch
  (archs/uPIT.py:121-127); set ``zero_init_hidden=True`` for the
  deterministic variant.
- BatchNorm statistics include padding frames of real rows.

Batch layout (device): a dict with
  mix      (B, T, F)    zero-padded magnitude spectra, time-major
  sources  (B, S, T, F) zero-padded source magnitudes
  lengths  (B,) int32   true frame counts
  row_mask (B,) f32     1.0 for real rows, 0.0 for shape-padding dummies
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .blstm import init_blstm_params, blstm_forward, random_hidden
from ..ops.batchnorm import init_batchnorm, batchnorm_apply
from ..ops.mxu import head_dot
from ..ops.pit import pairwise_mse, permutation_min_loss

NAME = "uPIT"


@dataclasses.dataclass(frozen=True)
class Config:
    feat_dim: int = 257
    num_spk: int = 2
    hidden: int = 600
    num_layers: int = 2
    zero_init_hidden: bool = False
    # MXU input dtype: "bfloat16" feeds the systolic array at full rate
    # (float32 accumulation; gate/cell math stays float32). "float32" is
    # the bit-faithful default.
    compute_dtype: str = "float32"
    # rematerialize the forward in the backward pass — trades ~1.3x compute
    # for O(T) activation memory; for very long utterances / large batches
    remat: bool = False

    @classmethod
    def from_kwargs(cls, **kwargs):
        """Accept the reference's key=value model-config strings
        (train_qsub.py:87-91 passes everything as str)."""
        return cls(**_coerce_kwargs(cls, kwargs))

    @property
    def input_dim(self) -> int:
        return self.feat_dim

    @property
    def mxu_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def _coerce_kwargs(cls, kwargs: dict) -> dict:
    """Coerce the reference's all-string key=value config values onto the
    dataclass field types."""
    fields = {f.name: str(f.type) for f in dataclasses.fields(cls)}
    clean = {}
    for k, v in kwargs.items():
        if k not in fields:
            continue
        t = fields[k]
        if "bool" in t:
            clean[k] = str(v).lower() in ("1", "true", "yes")
        elif "int" in t:
            clean[k] = int(v)
        else:
            clean[k] = str(v)
    return clean


def init(key, cfg: Config):
    k1, k2, k3 = jax.random.split(key, 3)
    out_dim = 2 * cfg.hidden
    kb = 1.0 / np.sqrt(out_dim)
    bn_params, bn_state = init_batchnorm(out_dim)
    params = {
        "blstm": init_blstm_params(k1, cfg.input_dim, cfg.hidden, cfg.num_layers),
        "bn": bn_params,
        "lin": {
            "w": jax.random.uniform(k2, (out_dim, cfg.feat_dim * cfg.num_spk),
                                    jnp.float32, -kb, kb),
            "b": jax.random.uniform(k3, (cfg.feat_dim * cfg.num_spk,),
                                    jnp.float32, -kb, kb),
        },
    }
    state = {"bn": bn_state}
    return params, state


def forward(cfg: Config, params, state, x, lengths, row_mask, rng, train: bool):
    """BLSTM -> padded BN -> linear -> sigmoid. Returns (masks, new_state).

    masks: (B, T, feat_dim * num_spk), source s occupies
    [s*feat_dim : (s+1)*feat_dim] (reference slicing, archs/uPIT.py:220-225).
    """
    B = x.shape[0]
    if cfg.zero_init_hidden:
        shape = (cfg.num_layers, 2, B, cfg.hidden)
        h0 = jnp.zeros(shape, jnp.float32)
        c0 = jnp.zeros(shape, jnp.float32)
    else:
        h0, c0 = random_hidden(rng, cfg.num_layers, B, cfg.hidden)
    y, _ = blstm_forward(params["blstm"], x, lengths, h0, c0,
                         compute_dtype=cfg.mxu_dtype,
                         save_activations=train)
    y, bn_state = batchnorm_apply(params["bn"], state["bn"], y, row_mask, train)
    # head matmul: bf16 gradients too in bfloat16 mode (ops/mxu.py)
    y = head_dot(y, params["lin"]["w"], cfg.mxu_dtype) + params["lin"]["b"]
    return jax.nn.sigmoid(y), {"bn": bn_state}


def contract_loss(forward_fn, cfg, params, state, batch, rng, train: bool):
    """The uPIT-contract objective, shared by every arch with a
    (B, T, feat_dim*num_spk) sigmoid-mask forward (uPIT, TCN): min over
    speaker permutations of the summed masked-mixture MSE, scalar =
    total/norm exactly as the reference backprops (archs/uPIT.py:157-206).
    aux carries norm for the weighted epoch average (train_qsub.py:
    118-119), the updated state, and the chosen permutation/masked
    estimates the plot hooks consume. One implementation so cross-arch
    loss comparisons can never silently desynchronize."""
    mix, sources = batch["mix"], batch["sources"]
    lengths, row_mask = batch["lengths"], batch["row_mask"]
    B, T, F = mix.shape

    fwd = forward_fn
    if cfg.remat:
        # args: (cfg, params, state, x, lengths, row_mask, rng, train)
        fwd = jax.checkpoint(forward_fn, static_argnums=(0, 7))
    masks, new_state = fwd(cfg, params, state, mix, lengths, row_mask, rng, train)
    masked = masks.reshape(B, T, cfg.num_spk, F) * mix[:, :, None, :]
    pair = pairwise_mse(masked, sources)
    min_losses, best_perm = permutation_min_loss(pair, cfg.num_spk)

    total = jnp.sum(min_losses * row_mask) / cfg.num_spk
    norm = jnp.sum(lengths.astype(jnp.float32) * row_mask) * cfg.feat_dim
    return total / norm, {"norm": norm, "total": total,
                          "new_state": new_state, "best_perm": best_perm,
                          "masked": masked}


def contract_infer(forward_fn, cfg, params, state, batch, rng):
    """Eval-mode masks for a uPIT-contract arch. Returns
    (B, T, feat_dim*num_spk); trimming to true length and the
    (freq, time) npz layout happen host-side."""
    masks, _ = forward_fn(cfg, params, state, batch["mix"],
                          batch["lengths"], batch["row_mask"], rng,
                          train=False)
    return masks


def loss_fn(cfg: Config, params, state, batch, rng, train: bool):
    return contract_loss(forward, cfg, params, state, batch, rng, train)


def infer_masks(cfg: Config, params, state, batch, rng):
    return contract_infer(forward, cfg, params, state, batch, rng)
