#!/usr/bin/env python3
"""DPRNN step-time anatomy (VERDICT round-3 item 3): where do the 465 ms
of the bench-config train step (B=32, 4 s audio, full-size defaults, bf16,
remat) go, and does the Pallas LSTM kernel help at dual-path shapes?

Measures, at the exact bench configuration:
  1. full train step (remat on)            — the shipped number
  2. full train step (remat off, B=8 x4)   — remat's recompute overhead
  3. forward only (separate(), jit)        — fwd vs bwd split
  4. isolated intra/inter BLSTM scans, lax.scan vs Pallas kernel
     (forward and grad) — the scan engine A/B at (B*C, K) / (B*K, C)
     row/step shapes

Prints one JSON dict. Run from the repo root on the chip:
  PYTHONPATH=.:/root/.axon_site python tools/dprnn_anatomy.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import dprnn
from speech_separation_tpu.models.blstm import blstm_forward
from speech_separation_tpu.train.loop import (TrainLoopConfig, make_optimizer,
                                              make_update_step)
from speech_separation_tpu.utils.compile_cache import enable_compilation_cache


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    return (time.time() - t0) / iters * 1e3  # ms


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


def train_step_ms(cfg, B, n_sec, iters=10):
    params, state = dprnn.init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(TrainLoopConfig())
    opt_state = opt.init(params)
    step = make_update_step(dprnn, cfg, opt)
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
    params, _state = dprnn.init(jax.random.PRNGKey(0), cfg)
    batch = wave_batch(B, n_sec)

    @jax.jit
    def fwd(p, wav, n):
        return jnp.sum(dprnn._separate_core(cfg, p, wav, n))

    args = (params, batch["mix_wav"], batch["sample_lengths"])
    float(fwd(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fwd(*args)
    float(out)
    return (time.time() - t0) / iters * 1e3


def scan_ab(rows, steps, channels, hidden, iters=10):
    """One dual-path BLSTM scan at (rows, steps) — lax.scan vs the Pallas
    kernel, forward and value_and_grad."""
    from speech_separation_tpu.models.blstm import init_blstm_params
    key = jax.random.PRNGKey(0)
    params = init_blstm_params(key, channels, hidden, num_layers=1)
    x = (0.1 * np.random.default_rng(0).standard_normal(
        (rows, steps, channels))).astype(np.float32)
    x = jnp.asarray(x)
    lens = jnp.full((rows,), steps, jnp.int32)
    zeros = jnp.zeros((1, 2, rows, hidden), jnp.float32)

    res = {}
    for tag, use_pallas in (("scan", False), ("pallas", True)):
        @jax.jit
        def fwd(p, x):
            y, _ = blstm_forward(p, x, lens, zeros, zeros,
                                 compute_dtype=jnp.bfloat16,
                                 use_pallas=use_pallas)
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def grad(p, x):
            # return value + a grad leaf so the gradient computation stays
            # live (returning only the value lets XLA DCE the whole VJP)
            v, g = jax.value_and_grad(lambda p: fwd(p, x))(p)
            return v + sum(jnp.sum(jnp.abs(l))
                           for l in jax.tree_util.tree_leaves(g))

        try:
            res[f"{tag}_fwd_ms"] = round(timeit(fwd, params, x, iters=iters), 2)
            res[f"{tag}_grad_ms"] = round(timeit(grad, params, x,
                                                 iters=iters), 2)
        except Exception as e:  # VMEM overflow etc: report, keep going
            res[f"{tag}_error"] = str(e)[:200]
    return res


def main():
    enable_compilation_cache()
    cfg = dprnn.Config(compute_dtype="bfloat16", remat=True)
    B, n_sec = 32, 4.0
    L = int(n_sec * 8000)
    from speech_separation_tpu.models.convtasnet import latent_frames
    n_t = latent_frames(cfg, L)
    C = dprnn.num_chunks(cfg, n_t)
    out = {
        "config": {"B": B, "n_sec": n_sec, "n_t": n_t, "C": C,
                   "K": cfg.chunk, "blocks": cfg.blocks,
                   "intra_rows": B * C, "inter_rows": B * cfg.chunk},
        "train_step_remat_ms": round(train_step_ms(cfg, B, n_sec), 1),
        "forward_only_ms": round(forward_ms(cfg, B, n_sec), 1),
    }
    print(json.dumps(out), flush=True)

    # remat overhead: B=8 fits unrematted
    cfg_nr = dprnn.Config(compute_dtype="bfloat16", remat=False)
    cfg_r8 = dprnn.Config(compute_dtype="bfloat16", remat=True)
    try:
        out["train_step_B8_noremat_ms"] = round(
            train_step_ms(cfg_nr, 8, n_sec), 1)
    except Exception as e:
        out["train_step_B8_noremat_ms"] = f"OOM: {str(e)[:120]}"
    out["train_step_B8_remat_ms"] = round(train_step_ms(cfg_r8, 8, n_sec), 1)
    print(json.dumps(out), flush=True)

    # scan engine A/B at the two dual-path shapes
    out["intra_scan"] = scan_ab(B * C, cfg.chunk, cfg.channels,
                                cfg.rnn_hidden)
    print(json.dumps(out), flush=True)
    out["inter_scan"] = scan_ab(B * cfg.chunk, C, cfg.channels,
                                cfg.rnn_hidden)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
