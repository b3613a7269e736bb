#!/usr/bin/env python3
"""Conv-TasNet step-time anatomy: the bench-config train step (B=32, 4 s
audio, full-size defaults, bf16, remat off) runs at ~15 TFLOP/s — under
10% of the chip's bf16 peak — so the step is NOT compute-bound. Where
does the time go, and which of the two candidate levers pays?

  1. full train step                      — the shipped number
  2. forward only (separate(), jit)       — fwd vs bwd split
  3. separator-stack (mask_logits) fwd+grad A/B over
       dw_impl: XLA conv_general_dilated(feature_group_count=H)
                vs a static shift-and-add formulation (K fused
                multiply-adds over statically padded slices — pure
                elementwise, no conv op for XLA to schedule apart)
       acts:    float32 between-op activations (matmul outputs)
                vs bfloat16-stored activations (halves the HBM bytes of
                every elementwise/norm pass; statistics still f32)

The block tensors are (B, ~2000, 512) f32 = 131 MB each and every block
touches several — on a bandwidth-bound program the bytes, not the
FLOPs, decide. Prints one JSON dict (incrementally). Run from the repo
root on the chip:
  PYTHONPATH=.:/root/.axon_site python tools/convtasnet_anatomy.py
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import convtasnet as ct
from speech_separation_tpu.models.tcn import _prelu
from speech_separation_tpu.train.loop import (TrainLoopConfig, make_optimizer,
                                              make_update_step)
from speech_separation_tpu.utils.compile_cache import enable_compilation_cache


def wave_batch(B, n_sec, num_spk=2, seed=0):
    rng = np.random.default_rng(seed)
    L = int(n_sec * 8000)
    srcs = (0.1 * rng.standard_normal((B, num_spk, L))).astype(np.float32)
    return {
        "mix_wav": jnp.asarray(srcs.sum(axis=1)),
        "source_wavs": jnp.asarray(srcs),
        "sample_lengths": jnp.asarray(np.full(B, L, np.int32)),
        "row_mask": jnp.asarray(np.ones(B, np.float32)),
    }


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def train_step_ms(cfg, B, n_sec, iters=10):
    params, state = ct.init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(TrainLoopConfig())
    opt_state = opt.init(params)
    step = make_update_step(ct, cfg, opt)
    batch = wave_batch(B, n_sec)
    key = jax.random.PRNGKey(1)
    params, state, opt_state, loss, norm = step(params, state, opt_state,
                                                batch, key)
    float(loss)
    t0 = time.time()
    for _ in range(iters):
        params, state, opt_state, loss, norm = step(params, state, opt_state,
                                                    batch, key)
    float(loss)
    return (time.time() - t0) / iters * 1e3


def forward_ms(cfg, B, n_sec, iters=10):
    params, _ = ct.init(jax.random.PRNGKey(0), cfg)
    batch = wave_batch(B, n_sec)

    @jax.jit
    def fwd(p, wav, n):
        return jnp.sum(ct._separate_core(cfg, p, wav, n))

    args = (params, batch["mix_wav"], batch["sample_lengths"])
    float(fwd(*args))
    return timeit(fwd, *args, iters=iters)


# ---------------------------------------------------------------------------
# experimental separator-stack variants (the A/B axes)
# ---------------------------------------------------------------------------

def _depthwise_shift(x, kernel, bias, dilation: int, causal: bool):
    """Shift-and-add depthwise conv: y[t] = sum_k w[k] * x[t + off_k].
    Static offsets -> statically padded slices -> K fused multiply-adds."""
    K = kernel.shape[0]
    base = -((K - 1) * dilation) if causal else -((K - 1) // 2 * dilation)
    y = None
    for k in range(K):
        off = base + k * dilation          # source index offset for tap k
        if off == 0:
            xs = x
        elif off > 0:                       # read from the future: shift left
            xs = jnp.pad(x[:, off:], ((0, 0), (0, off), (0, 0)))
        else:                               # read from the past: shift right
            xs = jnp.pad(x[:, :off], ((0, 0), (-off, 0), (0, 0)))
        term = xs * kernel[k]
        y = term if y is None else y + term
    return y + bias


def _gln_stats_f32(x, p, tmask, eps=1e-6):
    """gLN with f32 statistics regardless of x's storage dtype."""
    xf = x.astype(jnp.float32)
    C = x.shape[-1]
    cnt = jnp.maximum(jnp.sum(tmask, axis=(1, 2), keepdims=True) * C, 1.0)
    mu = jnp.sum(xf * tmask, axis=(1, 2), keepdims=True) / cnt
    var = jnp.sum(jnp.square((xf - mu) * tmask), axis=(1, 2),
                  keepdims=True) / cnt
    scale = jax.lax.rsqrt(var + eps)
    return (((xf - mu) * scale) * p["g"] + p["b"]).astype(x.dtype)


def _mask_logits_variant(cfg, params, w, tmask, dw_impl, act_dtype):
    from speech_separation_tpu.ops.mxu import head_dot
    dw = ct._depthwise if dw_impl == "conv" else _depthwise_shift
    ad = jnp.bfloat16 if act_dtype == "bf16" else jnp.float32

    def dot(x, lin):
        return (head_dot(x, lin["w"], cfg.mxu_dtype) + lin["b"]).astype(ad)

    tm = tmask.astype(ad)
    h = dot(_gln_stats_f32(w.astype(ad), params["in_ln"], tmask),
            params["bottleneck"]) * tm
    for i, blk in enumerate(params["blocks"]):
        dilation = 2 ** (i % cfg.blocks)
        y = dot(h, blk["expand"])
        y = _gln_stats_f32(_prelu(y, blk["prelu1"].astype(ad)),
                           blk["ln1"], tmask) * tm
        y = dw(y, blk["dw"].astype(ad), blk["dw_b"].astype(ad),
               dilation, cfg.causal)
        y = _gln_stats_f32(_prelu(y, blk["prelu2"].astype(ad)),
                           blk["ln2"], tmask)
        h = (h + dot(y, blk["res"])) * tm
        s = dot(y, blk["skip"]) * tm
        skips = s if i == 0 else skips + s
    out = head_dot(_prelu(skips, params["head_prelu"].astype(ad)),
                   params["head"]["w"], cfg.mxu_dtype) + params["head"]["b"]
    B, Tl, _ = out.shape
    out = out.reshape(B, Tl, cfg.num_spk, cfg.n_filters)
    return jax.nn.relu(out) * tmask[:, :, None, :]


def stack_ab(cfg, B, n_sec, iters=10):
    """mask_logits fwd + grad over the four (dw_impl, acts) variants, plus
    max |Δ| of the forward vs the shipped implementation."""
    params, _ = ct.init(jax.random.PRNGKey(0), cfg)
    L = int(n_sec * 8000)
    n_t = ct.latent_frames(cfg, L)
    rng = np.random.default_rng(3)
    w = jnp.asarray(np.abs(rng.standard_normal(
        (B, n_t, cfg.n_filters))).astype(np.float32))
    lens = jnp.full((B,), L, jnp.int32)
    vt = ct.valid_latent_frames(cfg, lens, n_t)
    tmask = (jnp.arange(n_t)[None, :] < vt[:, None]
             ).astype(jnp.float32)[:, :, None]

    @jax.jit
    def ref_fwd(p, w):
        return ct._mask_logits(cfg, p, w, tmask)

    ref = ref_fwd(params, w)
    res = {}
    for dw_impl in ("conv", "shift"):
        for acts in ("f32", "bf16"):
            tag = f"{dw_impl}_{acts}"
            f = functools.partial(_mask_logits_variant, cfg,
                                  dw_impl=dw_impl, act_dtype=acts)

            @jax.jit
            def fwd(p, w, f=f):
                return f(p, w=w, tmask=tmask)

            @jax.jit
            def grad(p, w, f=f):
                v, g = jax.value_and_grad(
                    lambda p: jnp.sum(f(p, w=w, tmask=tmask)
                                      .astype(jnp.float32)))(p)
                return v + sum(jnp.sum(jnp.abs(l).astype(jnp.float32))
                               for l in jax.tree_util.tree_leaves(g))

            out = fwd(params, w)
            res[f"{tag}_fwd_ms"] = round(timeit(fwd, params, w,
                                                iters=iters), 2)
            res[f"{tag}_grad_ms"] = round(timeit(grad, params, w,
                                                 iters=iters), 2)
            res[f"{tag}_max_abs_diff"] = float(
                jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    return res


def main():
    enable_compilation_cache()
    cfg = ct.Config(compute_dtype="bfloat16", remat=False)
    B, n_sec = 32, 4.0
    n_t = ct.latent_frames(cfg, int(n_sec * 8000))
    out = {"config": {"B": B, "n_sec": n_sec, "n_t": n_t,
                      "hidden": cfg.hidden, "channels": cfg.channels,
                      "blocks": cfg.repeats * cfg.blocks}}
    out["train_step_ms"] = round(train_step_ms(cfg, B, n_sec), 1)
    out["forward_only_ms"] = round(forward_ms(cfg, B, n_sec), 1)
    print(json.dumps(out), flush=True)
    out["stack_ab"] = stack_ab(cfg, B, n_sec)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
