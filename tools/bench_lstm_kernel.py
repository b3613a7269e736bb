#!/usr/bin/env python3
"""Micro-benchmark the Pallas LSTM kernels at reference scale on the TPU.

Times forward (training + inference variants) and backward kernels in
isolation, plus the full lstm_seq value_and_grad, at B=100 T=384 H=600 D=2.
Sync is by value transfer (axon block_until_ready is unreliable).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from speech_separation_tpu.utils.compile_cache import enable_compilation_cache
from speech_separation_tpu.ops import lstm_pallas as lp

enable_compilation_cache()


def timeit(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.time() - t0) / iters * 1e3  # ms


def main():
    T, D, B, H = 384, 2, 100, 600
    G = 4 * H
    rng = np.random.default_rng(0)
    xw = jnp.asarray(rng.standard_normal((T, D, B, G)).astype(np.float32) * 0.3
                     ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((D, H, G)).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)
    h0 = jnp.zeros((D, B, H), jnp.float32)
    c0 = jnp.zeros((D, B, H), jnp.float32)
    lengths = jnp.asarray(np.full(B, T, np.int32))

    fwd = jax.jit(lambda *a: lp.lstm_seq_fwd(*a))
    print(f"fwd(train): {timeit(fwd, xw, w, h0, c0, lengths):.2f} ms")

    inf = jax.jit(lambda *a: lp.lstm_seq_infer(*a))
    print(f"fwd(infer): {timeit(inf, xw, w, h0, c0, lengths):.2f} ms")

    def loss(xw_, w_):
        ys, hl, cl = lp.lstm_seq(xw_, w_, h0, c0, lengths)
        return (jnp.sum(ys.astype(jnp.float32) ** 2)
                + jnp.sum(hl ** 2) + jnp.sum(cl ** 2))

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    print(f"fwd+bwd (value_and_grad): {timeit(vg, xw, w):.2f} ms")

    # isolate the backward kernel
    res = fwd(xw, w, h0, c0, lengths)
    ys, cs, gates, hl, cl = res
    dys = jnp.ones_like(ys)
    dhl = jnp.ones_like(hl)
    dcl = jnp.ones_like(cl)
    bwd = jax.jit(lambda *a: lp.lstm_seq_bwd(*a))
    print(f"bwd kernel: {timeit(bwd, w, c0, lengths, cs, gates, dys, dhl, dcl):.2f} ms")

    # HBM traffic estimate for context
    step_bytes_f = (xw.dtype.itemsize * D * B * G          # xw in
                    + ys.dtype.itemsize * D * B * H        # ys out
                    + cs.dtype.itemsize * D * B * H        # cs out
                    + gates.dtype.itemsize * D * B * G)    # gates out
    print(f"fwd stream bytes/step: {step_bytes_f / 1e6:.2f} MB "
          f"(x{T} = {step_bytes_f * T / 1e9:.2f} GB)")


if __name__ == "__main__":
    main()
