"""Bidirectional multi-layer LSTM as a jit-compiled lax.scan program.

Replaces the reference's cuDNN LSTM (``torch.nn.LSTM(feat_dim, 600,
num_layers=2, bidirectional=True)``, reference archs/uPIT.py:115 and
archs/RSH.py:155) with a TPU-native formulation:

- **Fused gate matmuls.** The input projection ``x @ W_ih + b`` for all
  timesteps is one large (B*T, in) x (in, 4H) MXU matmul hoisted out of the
  recurrence; the scan body only does the (B, H) x (H, 4H) hidden matmul
  plus elementwise gate math. This is the key to LSTM throughput on TPU —
  the sequential part touches 4H*H weights per step instead of 4H*(in+H).

- **Packed-sequence semantics via masking.** XLA has no ragged tensors, so
  variable lengths are reproduced exactly: at padded steps the carry (h, c)
  passes through unchanged and the output is zeroed — identical to what
  torch's PackedSequence + pad_packed_sequence produce. The backward
  direction runs on the time-FLIPPED input with a suffix validity mask
  (valid once t >= T - length): each row's padding is consumed first with
  the state passing through h0 untouched, then its frames in true reverse
  order — exactly the packed cuDNN backward direction, starting from each
  utterance's true last frame. A plain flip (cheap strided copy, cheap to
  differentiate) replaces the earlier per-row reversal gather, whose
  autodiff scatter cost multiple ms per layer at reference scale.

- Gate order is (i, f, g, o) and the initial hidden state is caller-provided
  (the reference draws it from randn per batch — archs/uPIT.py:121-127 — a
  quirk preserved by ``random_hidden``).

Weight init matches torch.nn.LSTM's default U(-k, k), k = 1/sqrt(hidden);
the two torch bias vectors (b_ih, b_hh) are algebraically one bias, stored
summed (initialized as a sum of two uniforms to keep the init distribution).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_blstm_params(key, input_dim: int, hidden: int, num_layers: int = 2):
    """Parameter pytree: tuple over layers of {'fwd': d, 'bwd': d} with
    d = {'w_ih': (in, 4H), 'w_hh': (H, 4H), 'b': (4H,)}."""
    k = 1.0 / np.sqrt(hidden)
    layers = []
    for layer in range(num_layers):
        in_dim = input_dim if layer == 0 else 2 * hidden
        directions = {}
        for direction in ("fwd", "bwd"):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            directions[direction] = {
                "w_ih": _uniform(k1, (in_dim, 4 * hidden), k),
                "w_hh": _uniform(k2, (hidden, 4 * hidden), k),
                # sum of the two torch bias draws
                "b": _uniform(k3, (4 * hidden,), k) + _uniform(k4, (4 * hidden,), k),
            }
        layers.append(directions)
    return tuple(layers)


def random_hidden(key, num_layers: int, batch: int, hidden: int):
    """Reference quirk: initial (h0, c0) ~ N(0, 1) per batch
    (archs/uPIT.py:121-127). Shapes: (num_layers, 2, B, H) each."""
    kh, kc = jax.random.split(key)
    shape = (num_layers, 2, batch, hidden)
    return jax.random.normal(kh, shape), jax.random.normal(kc, shape)


def _lstm_scan(xw: jnp.ndarray, mask: jnp.ndarray, w_hh: jnp.ndarray,
               h0: jnp.ndarray, c0: jnp.ndarray, compute_dtype=jnp.float32,
               remat_step: bool = False):
    """Run one direction's recurrence.

    xw:   (T, D, B, 4H) precomputed x @ W_ih + b (direction-stacked)
    mask: (T, D, B, 1) — 1.0 at valid steps, per direction (prefix mask for
          the forward direction, suffix mask for the flipped reverse one)
    compute_dtype: matmul input dtype. bfloat16 feeds the MXU at full rate
    (accumulation stays float32 via preferred_element_type); the cell state
    and gate nonlinearities always run in float32 so the recurrence does
    not accumulate rounding error step over step.

    Returns (outputs (T, B, H) with zeros at masked steps,
             (h_final, c_final)) — because the carry passes through masked
    steps, the final carry equals the state at each row's true last step,
    matching torch's packed-LSTM h_n/c_n.
    """
    w_hh_c = w_hh.astype(compute_dtype)

    def step(carry, inp):
        h, c = carry
        xw_t, m = inp
        # (..., B, H) x (..., H, 4H): both directions ride one batched
        # matmul when w_hh carries a leading direction axis. xw streams
        # from HBM in compute_dtype (half the bytes in bf16 — the scan is
        # partly bound on streaming the precomputed gate inputs).
        gates = xw_t.astype(jnp.float32) + jnp.matmul(
            h.astype(compute_dtype), w_hh_c, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        # packed semantics: carry passes through at padded steps
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        return (h, c), m * h_new

    if remat_step:
        # save only the (h, c) carries per step; the backward recomputes
        # the gate math (and the hidden matmul) instead of materializing
        # (T, D, B, 4H) gate residuals — the memory lever for scans over
        # very large row batches (DPRNN's B*C / B*K rows: the unrematted
        # residuals measure in GB per scan at production scale)
        step = jax.checkpoint(step)
    final, ys = jax.lax.scan(step, (h0, c0), (xw, mask), unroll=8)
    return ys, final




def pallas_rows_feasible(rows: int, hidden: int) -> bool:
    """Whether the Pallas LSTM kernel's K=1 (minimum) time-blocking fits
    the scoped-VMEM ceiling at this row batch. Double-buffered per-step
    grid blocks (bf16 xw gates in, ys/cs/gates saves out) plus the
    resident weights/state margin must stay under the probed ceiling —
    very large row batches (dual-path archs fold chunks into the row
    axis) fall back to the lax.scan path instead of failing compilation."""
    from ..ops.lstm_pallas import _VMEM_CEILING, _VMEM_MARGIN
    step_bytes = (2 * rows * 4 * hidden * 2      # xw (D=2, bf16)
                  + 2 * 2 * rows * hidden * 2    # ys + cs saves
                  + 2 * rows * 4 * hidden * 2)   # gates saves
    return 2 * step_bytes + _VMEM_MARGIN <= _VMEM_CEILING


def blstm_forward(params, x: jnp.ndarray, lengths: jnp.ndarray,
                  h0: jnp.ndarray, c0: jnp.ndarray,
                  compute_dtype=jnp.float32,
                  use_pallas: bool | None = None,
                  save_activations: bool = True,
                  remat_scan_step: bool = False) -> jnp.ndarray:
    """Multi-layer bidirectional LSTM.

    Args:
      params: pytree from init_blstm_params.
      x: (B, T, in) float32, zero-padded past each row's length.
      lengths: (B,) int32.
      h0, c0: (num_layers, 2, B, H) initial states
              (direction index 0 = fwd, 1 = bwd, matching torch's layout).
      compute_dtype: dtype fed to the MXU (see _lstm_scan); outputs and
              states are float32 either way.
      use_pallas: run the recurrence as the Pallas full-sequence kernel
              (ops/lstm_pallas.py — weights VMEM-resident across all steps,
              auto-pipelined xw streaming, hand-written VJP). Default: on
              when compute_dtype is bfloat16 and the backend is TPU; the
              lax.scan path remains the float32 / CPU implementation.

    Returns (out, (h_n, c_n)):
      out: (B, T, 2H) with zeros at padded steps (pad_packed semantics);
      h_n, c_n: (num_layers, 2, B, H) final states per layer/direction —
      for the fwd direction the state at each row's true last step, for the
      bwd direction the state at step 0 (it runs reversed), matching torch.
    """
    B, T = x.shape[0], x.shape[1]
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)
    mask_tb = mask.T[:, :, None]  # (T, B, 1)

    if use_pallas is None:
        use_pallas = (compute_dtype == jnp.bfloat16
                      and jax.default_backend() == "tpu"
                      and pallas_rows_feasible(B, h0.shape[-1]))

    out = x
    h_finals, c_finals = [], []
    # per-direction masks: prefix for fwd, suffix (= flipped prefix) for the
    # bwd direction running on time-flipped input
    mask_scan = jnp.stack([mask_tb, jnp.flip(mask_tb, axis=0)], axis=1)
    for layer_idx, layer in enumerate(params):
        out_c = out.astype(compute_dtype)
        pf, pb = layer["fwd"], layer["bwd"]

        # both directions share ONE scan: stack them on a leading axis and
        # let the per-step hidden projection be a single batched matmul.
        # This halves the number of sequential scan steps per layer — the
        # recurrence is latency-bound on TPU, not FLOP-bound.
        x_rev = jnp.flip(out_c, axis=1)
        if compute_dtype == jnp.bfloat16:
            # fused path: one direction-batched einsum writes the gate
            # inputs directly in (T, 2, B, 4H) bf16 — no float32
            # stack/transpose intermediates (those cost ~1 GB of HBM
            # traffic per layer at reference scale)
            x_pair = jnp.stack([out_c, x_rev])                 # (2, B, T, Fin)
            w_pair = jnp.stack([pf["w_ih"], pb["w_ih"]]).astype(compute_dtype)
            b_pair = jnp.stack([pf["b"], pb["b"]]).astype(compute_dtype)
            xw = jnp.einsum("dbtf,dfg->tdbg", x_pair, w_pair,
                            preferred_element_type=compute_dtype)
            xw = xw + b_pair[None, :, None, :]
        else:
            # bit-faithful float32 path (torch-parity-tested)
            xw_f = jnp.dot(out_c, pf["w_ih"],
                           preferred_element_type=jnp.float32) + pf["b"]
            xw_b = jnp.dot(x_rev, pb["w_ih"],
                           preferred_element_type=jnp.float32) + pb["b"]
            # (T, 2, B, 4H), streamed through the recurrence
            xw = jnp.stack([xw_f, xw_b], axis=0).transpose(2, 0, 1, 3)
        w_hh = jnp.stack([pf["w_hh"], pb["w_hh"]])  # (2, H, 4H)

        if use_pallas:
            from ..ops.lstm_pallas import lstm_seq, lstm_seq_infer
            # saved-activation (and ys) precision follows the compute dtype:
            # bf16 on the perf path, f32 when running bit-faithful
            save_dt = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                       else jnp.float32)
            if save_activations:
                ys, (hf, hb), (cf, cb) = lstm_seq(
                    xw, w_hh.astype(compute_dtype), h0[layer_idx],
                    c0[layer_idx], lengths, save_dt, (False, True))
            else:  # inference: no backward residuals, less HBM traffic
                ys, (hf, hb), (cf, cb) = lstm_seq_infer(
                    xw, w_hh.astype(compute_dtype), h0[layer_idx],
                    c0[layer_idx], lengths, suffix_dirs=(False, True))
        else:
            ys, ((hf, hb), (cf, cb)) = _lstm_scan(
                xw, mask_scan, w_hh, h0[layer_idx], c0[layer_idx],
                compute_dtype, remat_step=remat_scan_step)
        y_fwd = ys[:, 0].transpose(1, 0, 2)
        # outputs at suffix-masked (flipped-padding) steps are already zero,
        # so flipping back restores zeros past each row's length — no mask
        # multiply needed
        y_bwd = jnp.flip(ys[:, 1].transpose(1, 0, 2), axis=1)

        out = jnp.concatenate([y_fwd, y_bwd], axis=-1)
        h_finals.append(jnp.stack([hf, hb]))
        c_finals.append(jnp.stack([cf, cb]))
    return out, (jnp.stack(h_finals), jnp.stack(c_finals))
