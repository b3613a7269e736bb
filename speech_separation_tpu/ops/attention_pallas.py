"""Pallas TPU kernel: fused masked chunk attention with custom VJP.

Why a kernel: SepFormer's dual-path attention (models/sepformer.py) is the
furthest-from-roofline step in the repo (tools/roofline_time.py: measured
3.03x the analytic floor, ~3% MFU). The XLA path materializes the
(R, heads, T, T) float32 logits in HBM between the QK^T einsum and the
softmax, then the bf16 weights again before AV — at the bench shape
(R=2560 chunk rows, T=100, 4 heads) that is ~1.2 GB of HBM traffic per
layer forward and ~3x that in backward, across 8 layers. The sequences
are CHUNKS: T ~= 100, so a whole sequence's scores are ~40 KB/head — the
entire attention fits in VMEM. No flash-attention streaming is needed;
one grid step computes complete rows:

- grid over blocks of RB (sequence, head) rows (heads folded into the
  row axis — each head is an independent attention problem);
- per grid step: QK^T, additive key masking, numerically-stable softmax,
  and AV run back-to-back in VMEM; only Q/K/V stream in and O streams
  out (bf16). The logits NEVER touch HBM.
- backward recomputes scores/weights in-kernel from the same Q/K/V
  blocks (recompute costs one extra QK^T — far cheaper than round-
  tripping the (T, T) weights through HBM) and emits dQ/dK/dV.

Numerics match models/sepformer.py's XLA path exactly in f32 and to bf16
rounding on the perf path: logits and softmax are float32; the attention
weights are cast to the value dtype for AV (the same cast the einsum path
applies); masked keys get -1e9 logits (fully-masked pad rows produce a
uniform distribution — callers re-zero pad rows, same contract).

dh=16 lanes pad 8x on the MXU — that inefficiency is architectural (the
head dim), shared with the XLA path, and documented in
docs/performance.md; this kernel removes the HBM wall, which is the
binding constraint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _pad8(n: int) -> int:
    return 8 * ((n + 7) // 8)


def _pad128(n: int) -> int:
    return 128 * ((n + 127) // 128)


def _row_bytes(T: int, dh: int) -> int:
    """Worst-case (backward) VMEM bytes per row at Mosaic's (8, 128) tile
    padding — dh < 128 pads the lane dim all the way to 128, which is the
    dominant cost at SepFormer's dh=16. Counts double-buffered in/out
    blocks (q, k, v, mask, do in; dq, dk, dv out) plus the in-kernel
    (T, T) score/weight intermediates."""
    vec = _pad8(T) * _pad128(dh)          # one (T, dh) tensor's padded elems
    sq = _pad8(T) * _pad128(T)            # one (T, T) tensor's padded elems
    blocks = 2 * (5 * vec * 2 + _pad128(T) * 4 + 3 * vec * 2)
    inter = 4 * sq * 4 + 2 * sq * 2       # s, e, w32, dw/ds f32 + bf16 pair
    return blocks + inter


def _pick_rb(n_rows: int, T: int, dh: int) -> int:
    """Rows per grid step under a ~40 MB working budget (the raised VMEM
    limit below leaves headroom over the 16 MB default scoped limit; the
    v5e accepts ~112 MB, probed in ops/lstm_pallas.py)."""
    budget = 80 * 1024 * 1024
    rb = max(8, min(256, budget // _row_bytes(T, dh)))
    # round down to a power of two for clean padding arithmetic
    rb = 1 << (rb.bit_length() - 1)
    return max(8, rb)


def _fwd_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale):
    q = q_ref[...].astype(jnp.float32)          # (RB, T, dh)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...]
    m = m_ref[...]                               # (RB, T) f32, 1=valid key
    dn = (((2,), (2,)), ((0,), (0,)))            # batched over rows
    s = jax.lax.dot_general(q, k, dn, preferred_element_type=jnp.float32)
    s = s * scale + (1.0 - m)[:, None, :] * (-1e9)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    w = w.astype(v.dtype)                        # the XLA path's cast
    dn_av = (((2,), (1,)), ((0,), (0,)))
    o = jax.lax.dot_general(w, v, dn_av, preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, m_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...]
    m = m_ref[...]
    do = do_ref[...].astype(jnp.float32)
    dn = (((2,), (2,)), ((0,), (0,)))
    # recompute the forward's weights (identical arithmetic)
    s = jax.lax.dot_general(q, k, dn, preferred_element_type=jnp.float32)
    s = s * scale + (1.0 - m)[:, None, :] * (-1e9)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    w32 = e / jnp.sum(e, axis=-1, keepdims=True)
    wv = w32.astype(v.dtype)                     # forward's AV operand
    # dV = W^T dO : contract the query axis
    dn_qT = (((1,), (1,)), ((0,), (0,)))
    dv = jax.lax.dot_general(wv.astype(jnp.float32), do, dn_qT,
                             preferred_element_type=jnp.float32)
    # dW = dO V^T : contract dh
    vf = v.astype(jnp.float32)
    dw = jax.lax.dot_general(do, vf, dn, preferred_element_type=jnp.float32)
    # softmax VJP (w.r.t. the f32 weights; the bf16 cast is rounding)
    ds = w32 * (dw - jnp.sum(dw * w32, axis=-1, keepdims=True))
    ds = ds * scale
    # dQ = dS K ; dK = dS^T Q
    dn_k = (((2,), (1,)), ((0,), (0,)))
    dq = jax.lax.dot_general(ds, k, dn_k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, dn_qT, preferred_element_type=jnp.float32)
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _pad_rows(x, rb):
    n = x.shape[0]
    pad = (-n) % rb
    if pad:
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    return x, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def chunk_attention(q, k, v, key_mask, scale=None, interpret=None):
    """Fused masked attention over full chunk sequences.

    q, k, v: (N, T, dh) — N independent (sequence, head) rows.
    key_mask: (N, T) float32, 1.0 at valid KEY positions.
    Returns (N, T, dh) in q's dtype. scale defaults to 1/sqrt(dh).
    """
    o, _ = _chunk_attention_fwd(q, k, v, key_mask, scale, interpret)
    return o


def _call(kernel, n_out, q, k, v, extras, scale, interpret):
    if interpret is None:
        interpret = _interpret_default()
    N, T, dh = q.shape
    if scale is None:
        scale = 1.0 / np.sqrt(dh)
    rb = _pick_rb(N, T, dh)
    args = [q, k, v, *extras]
    padded = [_pad_rows(a, rb)[0] for a in args]
    n_pad = padded[0].shape[0]
    grid = (n_pad // rb,)

    def spec(a):
        blk = (rb,) + a.shape[1:]
        return pl.BlockSpec(blk, lambda i: (i,) + (0,) * (a.ndim - 1))

    out_shapes = [jax.ShapeDtypeStruct((n_pad, T, dh), q.dtype)
                  for _ in range(n_out)]
    limit = min(rb * _row_bytes(T, dh) + 16 * 1024 * 1024,
                100 * 1024 * 1024)
    outs = pl.pallas_call(
        functools.partial(kernel, scale=float(scale)),
        grid=grid,
        in_specs=[spec(a) for a in padded],
        out_specs=[spec(o) for o in out_shapes],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        interpret=interpret,
    )(*padded)
    outs = outs if isinstance(outs, (list, tuple)) else [outs]
    return [o[:N] for o in outs]


def _chunk_attention_fwd(q, k, v, key_mask, scale, interpret):
    (o,) = _call(_fwd_kernel, 1, q, k, v, [key_mask], scale, interpret)
    return o, (q, k, v, key_mask)


def _chunk_attention_bwd(scale, interpret, res, do):
    q, k, v, key_mask = res
    dq, dk, dv = _call(_bwd_kernel, 3, q, k, v, [key_mask, do], scale,
                       interpret)
    return dq, dk, dv, jnp.zeros_like(key_mask)


chunk_attention.defvjp(_chunk_attention_fwd, _chunk_attention_bwd)
