"""Pallas TPU kernel: full-sequence LSTM recurrence with custom VJP.

Why a kernel: the lax.scan recurrence is the training hot spot (SURVEY.md §7
hard part 3). Under XLA's while-loop, every step re-streams the recurrent
weights and the precomputed gate inputs HBM->VMEM with no cross-step
residency, and the (B, H) x (H, 4H) per-step matmul runs far below the
large-matmul roofline. This kernel runs the whole T-step recurrence as ONE
pallas_call with grid=(T,):

- the recurrent weights sit in VMEM for the entire sequence (constant
  index map — loaded once, ~5.8 MB in bf16 for both directions);
- the per-step gate inputs xw stream through the automatic grid pipeline
  (double-buffered DMA overlapped with compute), in bf16;
- the hidden/cell state lives in VMEM scratch, float32, persisting across
  grid steps — it never touches HBM until the final step;
- both directions are processed in one kernel (leading axis D), each with
  its own weights, so one pallas_call per layer covers the whole BLSTM
  recurrence.

Masking reproduces packed-sequence semantics exactly like the scan path
(models/blstm.py): at masked steps the state passes through and the output
is zero. Each direction has its own mask rule (``suffix_dirs``): prefix
masks (valid while t < length) for the forward direction, and SUFFIX masks
(valid while t >= T - length) for the reverse direction running on
time-flipped input. The flip formulation processes each row's padding
FIRST (state passes through h0 unchanged) and then its frames in reverse
order — identical numbers to gathering each row's frames into reversed
order, but the gather (and its scatter transpose in autodiff) never
happens. That gather was measured as a multi-ms cost per layer at
reference scale (see docs/performance.md).

The backward pass is a second kernel running the time grid in reverse,
streaming the forward's saved activations (post-activation gates in bf16,
cell states in f32) and producing pre-activation gate gradients dxw; the
weight gradients dW_hh = sum_t h_{t-1}^T dgates_t and everything upstream
of xw are large one-shot XLA matmuls outside the kernel, where the MXU is
already at its roofline.

Numerics: matmuls take bf16 inputs with float32 accumulation; state and
gate nonlinearities are float32. This is the compute_dtype='bfloat16'
execution path; float32 mode keeps the lax.scan implementation.
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


_VMEM_MARGIN = 32 * 1024 * 1024   # resident weights/state/scratch allowance
# (32 MB: under jax.checkpoint the recompute context stacks a few extra MB
# of operands on the kernel's scoped allocation — 24 MB measured 320 KB
# short at dual-path inter-scan shapes, B=3200 rows)
_VMEM_CEILING = 100 * 1024 * 1024  # under the ~112 MB the hw accepts (probed)

_warned: set[str] = set()


def _warn_once(msg: str) -> None:
    if msg not in _warned:
        _warned.add(msg)
        import sys
        print(f"warning: {msg}", file=sys.stderr)


def _time_block(T: int, step_bytes: int) -> int:
    """Timesteps per grid step. Larger blocks amortize the per-grid-step
    overhead (DMA issue + grid bookkeeping were measured at ~3-5 us of the
    ~15 us step, docs/performance.md); the VMEM cost is K x the per-step
    blocks, within the chip's measured ~112 MB usable VMEM (the 16 MB
    figure is only the default scoped limit). ``step_bytes`` is the sum of
    the per-timestep grid-block bytes: K is reduced until the
    double-buffered blocks fit the ceiling, so an oversized
    SEPSEP_LSTM_BLOCK (the tuning knob; 1 recovers the unblocked kernel)
    degrades instead of failing compilation."""
    import os
    raw = os.environ.get("SEPSEP_LSTM_BLOCK", "8")
    try:
        pref = int(raw)
    except ValueError:
        _warn_once(f"SEPSEP_LSTM_BLOCK={raw!r} is not an integer; using 8")
        pref = 8
    for k in (16, 8, 4, 2):
        if (k <= pref and T % k == 0
                and 2 * k * step_bytes + _VMEM_MARGIN <= _VMEM_CEILING):
            return k
    if pref > 1:
        # diagnosable perf cliff: e.g. odd T at inference without time
        # padding quietly loses the entire blocking speedup
        _warn_once(f"LSTM time-blocking fell back to K=1 for T={T} "
                   f"(no divisor of T in (2,4,8,16) fits VMEM/pref); "
                   "pad T (time_pad_multiple) to restore the blocked kernel")
    return 1


def _vmem_limit(*block_bytes: int) -> int:
    """Kernel VMEM budget: double-buffered grid blocks + a fixed margin for
    the resident weights/state/scratch. Clamped under the ~112 MB that the
    hardware actually accepts (probed on v5 lite); _time_block guarantees
    the blocks fit under this."""
    total = 2 * sum(block_bytes) + _VMEM_MARGIN
    return min(max(total, 32 * 1024 * 1024), _VMEM_CEILING)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _dir_mask(lengths_ref, t, T, suffix: bool):
    """Per-direction validity mask (B, 1) float32. Prefix: t < length.
    Suffix (flipped-input reverse direction): t >= T - length, i.e. the
    row's padding is consumed first with the state passing through."""
    if suffix:
        return (lengths_ref[:] > (T - 1 - t)).astype(jnp.float32)
    return (lengths_ref[:] > t).astype(jnp.float32)


def _fwd_kernel(lengths_ref, h0_ref, c0_ref, xw_ref, w_ref,
                ys_ref, cs_ref, gates_ref, hlast_ref, clast_ref,
                h_scr, c_scr, *, suffix_dirs, K):
    Tb = pl.num_programs(0)
    b = pl.program_id(0)
    T = Tb * K
    D, B, H = h_scr.shape

    @pl.when(b == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    for kk in range(K):  # static unroll over the block's timesteps
        t = b * K + kk
        # issue both directions' recurrent matmuls before either VPU gate
        # chain: the d=1 matmul has no dependence on d=0's outputs, so the
        # MXU can run it while the VPU chews through d=0's nonlinearities
        pre = []
        for d in range(D):
            pre.append(xw_ref[kk, d].astype(jnp.float32) + jnp.dot(
                h_scr[d].astype(w_ref.dtype), w_ref[d],
                preferred_element_type=jnp.float32))  # (B, 4H)
        for d in range(D):  # static unroll over directions
            m = _dir_mask(lengths_ref, t, T, suffix_dirs[d])  # (B, 1)
            h_prev = h_scr[d]
            c_prev = c_scr[d]
            gates = pre[d]
            ia = jax.nn.sigmoid(gates[:, :H])
            fa = jax.nn.sigmoid(gates[:, H:2 * H])
            ga = jnp.tanh(gates[:, 2 * H:3 * H])
            oa = jax.nn.sigmoid(gates[:, 3 * H:])
            c_new = fa * c_prev + ia * ga
            h_new = oa * jnp.tanh(c_new)

            h_scr[d] = m * h_new + (1.0 - m) * h_prev
            c_scr[d] = m * c_new + (1.0 - m) * c_prev
            ys_ref[kk, d] = (m * h_new).astype(ys_ref.dtype)
            cs_ref[kk, d] = c_scr[d].astype(cs_ref.dtype)
            gates_ref[kk, d] = jnp.concatenate([ia, fa, ga, oa], axis=1
                                               ).astype(gates_ref.dtype)

    @pl.when(b == Tb - 1)
    def _():
        hlast_ref[:] = h_scr[:]
        clast_ref[:] = c_scr[:]


def lstm_seq_fwd(xw, w_hh, h0, c0, lengths, interpret=None,
                 save_dtype=jnp.bfloat16, suffix_dirs=None):
    """Run the full LSTM recurrence.

    Args:
      xw: (T, D, B, 4H) gate inputs (x @ W_ih + b), any float dtype
          (streamed in its dtype — pass bf16 to halve HBM traffic).
      w_hh: (D, H, 4H) recurrent weights (bf16 recommended).
      h0, c0: (D, B, H) float32.
      lengths: (B,) int32.

    Returns (ys, cs, gates, h_last, c_last):
      ys   (T, D, B, H) save_dtype — masked hidden outputs (bf16 halves
           the kernel's dominant write stream and all downstream reads;
           the consumer matmuls take bf16 anyway)
      cs   (T, D, B, H) f32 — cell state sequence (saved for backward)
      gates (T, D, B, 4H) save_dtype — post-activation (i, f, tanh g, o);
            bf16 halves the backward's streaming bytes at ~1e-3 relative
            gradient error, f32 is exact
      h_last, c_last (D, B, H) f32
    """
    if interpret is None:
        interpret = _interpret_default()
    T, D, B, G = xw.shape
    H = G // 4
    if suffix_dirs is None:
        suffix_dirs = (False,) * D
    lengths2 = lengths.reshape(B, 1).astype(jnp.int32)

    save_b = jnp.dtype(save_dtype).itemsize
    step_bytes = (D * B * G * xw.dtype.itemsize          # xw
                  + 2 * D * B * H * save_b               # ys + cs
                  + D * B * G * save_b)                  # gates
    K = _time_block(T, step_bytes)
    grid = (T // K,)
    out_shapes = (
        jax.ShapeDtypeStruct((T, D, B, H), save_dtype),    # ys
        jax.ShapeDtypeStruct((T, D, B, H), save_dtype),    # cs
        jax.ShapeDtypeStruct((T, D, B, G), save_dtype),    # gates
        jax.ShapeDtypeStruct((D, B, H), jnp.float32),      # h_last
        jax.ShapeDtypeStruct((D, B, H), jnp.float32),      # c_last
    )
    step_block = lambda i: (i, 0, 0, 0)
    const3 = lambda i: (0, 0, 0)
    limit = _vmem_limit(K * step_bytes)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, suffix_dirs=tuple(suffix_dirs), K=K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D, B, G), step_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H, G), const3, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((K, D, B, H), step_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D, B, H), step_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D, B, G), step_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), const3, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        interpret=interpret,
    )(lengths2, h0, c0, xw, w_hh)


def _fwd_infer_kernel(lengths_ref, h0_ref, c0_ref, xw_ref, w_ref,
                      ys_ref, hlast_ref, clast_ref, h_scr, c_scr,
                      *, suffix_dirs, K):
    """Forward without saved activations — the serving path (writes only
    the hidden outputs; ~2.5x less HBM write traffic than the training
    forward)."""
    Tb = pl.num_programs(0)
    b = pl.program_id(0)
    T = Tb * K
    D, B, H = h_scr.shape

    @pl.when(b == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    for kk in range(K):
        t = b * K + kk
        for d in range(D):
            m = _dir_mask(lengths_ref, t, T, suffix_dirs[d])
            h_prev = h_scr[d]
            c_prev = c_scr[d]
            gates = xw_ref[kk, d].astype(jnp.float32) + jnp.dot(
                h_prev.astype(w_ref.dtype), w_ref[d],
                preferred_element_type=jnp.float32)
            ia = jax.nn.sigmoid(gates[:, :H])
            fa = jax.nn.sigmoid(gates[:, H:2 * H])
            ga = jnp.tanh(gates[:, 2 * H:3 * H])
            oa = jax.nn.sigmoid(gates[:, 3 * H:])
            c_new = fa * c_prev + ia * ga
            h_new = oa * jnp.tanh(c_new)
            h_scr[d] = m * h_new + (1.0 - m) * h_prev
            c_scr[d] = m * c_new + (1.0 - m) * c_prev
            ys_ref[kk, d] = m * h_new

    @pl.when(b == Tb - 1)
    def _():
        hlast_ref[:] = h_scr[:]
        clast_ref[:] = c_scr[:]


def lstm_seq_infer(xw, w_hh, h0, c0, lengths, interpret=None,
                   suffix_dirs=None):
    """Inference-only recurrence: returns (ys, h_last, c_last), no VJP."""
    if interpret is None:
        interpret = _interpret_default()
    T, D, B, G = xw.shape
    H = G // 4
    if suffix_dirs is None:
        suffix_dirs = (False,) * D
    lengths2 = lengths.reshape(B, 1).astype(jnp.int32)
    step_bytes = D * B * G * xw.dtype.itemsize + D * B * H * 4
    K = _time_block(T, step_bytes)
    step_block = lambda i: (i, 0, 0, 0)
    const3 = lambda i: (0, 0, 0)
    limit = _vmem_limit(K * step_bytes)
    return pl.pallas_call(
        functools.partial(_fwd_infer_kernel, suffix_dirs=tuple(suffix_dirs),
                          K=K),
        grid=(T // K,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D, B, G), step_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H, G), const3, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((K, D, B, H), step_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), const3, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, D, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        interpret=interpret,
    )(lengths2, h0, c0, xw, w_hh)


# ---------------------------------------------------------------------------
# backward kernel (time grid reversed)
# ---------------------------------------------------------------------------

def _bwd_kernel(lengths_ref, c0_ref, dhlast_ref, dclast_ref,
                dys_ref, gates_ref, cs_ref, cs_prev_ref, wT_ref,
                dxw_ref, dh0_ref, dc0_ref,
                dh_scr, dc_scr, *, suffix_dirs, K):
    Tb = pl.num_programs(0)
    kb = pl.program_id(0)
    b = Tb - 1 - kb        # block index in original time order
    T = Tb * K
    D, B, H = dh_scr.shape

    @pl.when(kb == 0)
    def _():
        dh_scr[:] = dhlast_ref[:]
        dc_scr[:] = dclast_ref[:]

    for kk in range(K - 1, -1, -1):  # reverse time within the block
        t = b * K + kk
        for d in range(D):
            m = _dir_mask(lengths_ref, t, T, suffix_dirs[d])  # (B, 1)
            dh = dh_scr[d]
            dc = dc_scr[d]
            g = gates_ref[kk, d].astype(jnp.float32)
            ia, fa, ga, oa = (g[:, :H], g[:, H:2 * H], g[:, 2 * H:3 * H],
                              g[:, 3 * H:])
            c_t = cs_ref[kk, d].astype(jnp.float32)
            # c_{t-1}: within the block it is the previous saved state; at
            # the block boundary it comes from the previous block (or c0 at
            # the very first step)
            if kk > 0:
                c_prev = cs_ref[kk - 1, d].astype(jnp.float32)
            else:
                c_prev = jnp.where(b == 0, c0_ref[d],
                                   cs_prev_ref[K - 1, d].astype(jnp.float32))

            # forward: y_t = m*h_new; h_t = m*h_new + (1-m)*h_{t-1}
            dh_new = m * (dh + dys_ref[kk, d])
            tanh_c = jnp.tanh(c_t)  # == tanh(c_new) wherever m == 1
            dc_new = m * dc + dh_new * oa * (1.0 - tanh_c * tanh_c)

            di = dc_new * ga
            df = dc_new * c_prev
            dg = dc_new * ia
            do = dh_new * tanh_c
            # pre-activation gradients
            dgates = jnp.concatenate([
                di * ia * (1.0 - ia),
                df * fa * (1.0 - fa),
                dg * (1.0 - ga * ga),
                do * oa * (1.0 - oa),
            ], axis=1)  # (B, 4H) — zero at masked steps (dh_new/dc_new are)

            dxw_ref[kk, d] = dgates.astype(dxw_ref.dtype)
            dh_scr[d] = (1.0 - m) * dh + jnp.dot(
                dgates.astype(wT_ref.dtype), wT_ref[d],
                preferred_element_type=jnp.float32)
            dc_scr[d] = (1.0 - m) * dc + dc_new * fa

    @pl.when(kb == Tb - 1)
    def _():
        dh0_ref[:] = dh_scr[:]
        dc0_ref[:] = dc_scr[:]


def lstm_seq_bwd(w_hh, c0, lengths, cs, gates, dys, dh_last, dc_last,
                 interpret=None, save_dtype=jnp.bfloat16, suffix_dirs=None):
    """Reverse-time gradient kernel.
    Returns (dxw (T,D,B,4H) save_dtype, dh0, dc0)."""
    if interpret is None:
        interpret = _interpret_default()
    T, D, B, G = gates.shape
    H = G // 4
    if suffix_dirs is None:
        suffix_dirs = (False,) * D
    lengths2 = lengths.reshape(B, 1).astype(jnp.int32)
    wT = jnp.swapaxes(w_hh, 1, 2)  # (D, 4H, H)

    save_b = jnp.dtype(save_dtype).itemsize
    step_bytes = (D * B * H * dys.dtype.itemsize           # dys
                  + D * B * G * gates.dtype.itemsize       # gates
                  + 2 * D * B * H * cs.dtype.itemsize      # cs + prev
                  + D * B * G * save_b)                    # dxw
    K = _time_block(T, step_bytes)
    Tb = T // K
    rev = lambda k: (Tb - 1 - k, 0, 0, 0)
    # c_{t-1} boundary block: the previous time block, clamped at 0; the
    # kernel switches to c0 at the very first step
    rev_prev = lambda k: (jnp.maximum(Tb - 2 - k, 0), 0, 0, 0)
    const3 = lambda k: (0, 0, 0)

    limit = _vmem_limit(K * step_bytes)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, suffix_dirs=tuple(suffix_dirs), K=K),
        grid=(Tb,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D, B, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, G, H), const3, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((K, D, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, B, H), const3, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, D, B, G), save_dtype),
            jax.ShapeDtypeStruct((D, B, H), jnp.float32),
            jax.ShapeDtypeStruct((D, B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((D, B, H), jnp.float32),
            pltpu.VMEM((D, B, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        interpret=interpret,
    )(lengths2, c0, dh_last, dc_last, dys, gates, cs, cs, wT)


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def lstm_seq(xw, w_hh, h0, c0, lengths, save_dtype=jnp.bfloat16,
             suffix_dirs=None):
    """Differentiable full-sequence LSTM recurrence (Pallas).

    Returns (ys (T,D,B,H) save_dtype, h_last (D,B,H), c_last (D,B,H)).
    Gradients flow to xw, w_hh, h0, c0 (not lengths). save_dtype controls
    the saved-activation precision (and thus the backward's exactness).
    suffix_dirs marks flipped-input directions (see module docstring);
    it must be hashable (a tuple) — None means all-prefix.
    """
    ys, cs, gates, h_last, c_last = lstm_seq_fwd(xw, w_hh, h0, c0, lengths,
                                                 save_dtype=save_dtype,
                                                 suffix_dirs=suffix_dirs)
    return ys, h_last, c_last


def _lstm_seq_fwd_rule(xw, w_hh, h0, c0, lengths, save_dtype, suffix_dirs):
    ys, cs, gates, h_last, c_last = lstm_seq_fwd(xw, w_hh, h0, c0, lengths,
                                                 save_dtype=save_dtype,
                                                 suffix_dirs=suffix_dirs)
    # zero-size carrier records xw's dtype for the cotangent cast
    xw_dtype_probe = jnp.zeros((0,), xw.dtype)
    return (ys, h_last, c_last), (xw_dtype_probe, w_hh, h0, c0, lengths, ys, cs, gates)


def _lstm_seq_bwd_rule(save_dtype, suffix_dirs, res, cotangents):
    xw_dtype_probe, w_hh, h0, c0, lengths, ys, cs, gates = res
    xw_dtype = xw_dtype_probe.dtype
    dys, dh_last, dc_last = cotangents
    dxw, dh0, dc0 = lstm_seq_bwd(w_hh, c0, lengths, cs, gates,
                                 dys, dh_last, dc_last,
                                 save_dtype=save_dtype,
                                 suffix_dirs=suffix_dirs)
    # dW_hh = sum_t h_{t-1}^T dgates_t. ys stores m*h_new which differs from
    # the true carried h_{t-1} only at masked steps — where dgates is zero —
    # so the shifted ys is a valid h_{t-1} sequence once the initial state
    # is patched in: for prefix directions that is t=0; for suffix
    # directions the carried state is still h0 at every step up to and
    # including the first valid one (t0 = T - length), where shifted ys
    # reads 0.
    T, D = ys.shape[0], ys.shape[1]
    if suffix_dirs is None:
        suffix_dirs = (False,) * D
    ys_shift = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
    h_prev_dirs = []
    for d in range(D):
        if suffix_dirs[d]:
            in_h0_zone = (jnp.arange(T)[:, None]
                          <= (T - lengths)[None, :])  # (T, B)
            h_prev_d = jnp.where(in_h0_zone[:, :, None], h0[d][None],
                                 ys_shift[:, d])
        else:
            h_prev_d = jnp.concatenate([h0[None, d], ys[:-1, d]], axis=0)
        h_prev_dirs.append(h_prev_d)
    h_prev = jnp.stack(h_prev_dirs, axis=1)  # (T, D, B, H)
    dw_hh = jnp.einsum("tdbh,tdbg->dhg",
                       h_prev.astype(save_dtype),
                       dxw.astype(save_dtype),
                       preferred_element_type=jnp.float32).astype(w_hh.dtype)
    return dxw.astype(xw_dtype), dw_hh, dh0, dc0, None


lstm_seq.defvjp(_lstm_seq_fwd_rule, _lstm_seq_bwd_rule)
