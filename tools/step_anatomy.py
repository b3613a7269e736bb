#!/usr/bin/env python3
"""Train-step time decomposition at reference scale (VERDICT round-2 #7).

Times, at B=100 / T=384 / 2x600 bf16+Pallas:
  - the full update step (forward + PIT loss + backward + clip + Adam),
  - forward+loss only,
  - value_and_grad only (no optimizer).

Compare against the analytic machine lower bound: tools/roofline.py.

Prints one JSON line; feeds docs/performance.md's anatomy table.
Usage: python tools/step_anatomy.py [--iters 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def _batch(B, T, F, S):
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    return {
        "mix": jnp.asarray(np.abs(rng.standard_normal((B, T, F))).astype(np.float32)),
        "sources": jnp.asarray(np.abs(rng.standard_normal((B, S, T, F))).astype(np.float32)),
        "lengths": jnp.asarray(np.full(B, T, np.int32)),
        "row_mask": jnp.asarray(np.ones(B, np.float32)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--B", type=int, default=100)
    ap.add_argument("--T", type=int, default=384)
    args = ap.parse_args()

    from speech_separation_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from speech_separation_tpu.models import upit
    from speech_separation_tpu.train.loop import (TrainLoopConfig,
                                                  make_optimizer,
                                                  make_update_step)

    cfg = upit.Config(compute_dtype="bfloat16")
    params0, state0 = upit.init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(TrainLoopConfig())
    batch = _batch(args.B, args.T, cfg.feat_dim, cfg.num_spk)
    key = jax.random.PRNGKey(1)
    out = {"B": args.B, "T": args.T}

    def timed(tag, fn, *fargs):
        """fn(*fargs) -> scalar loss; sync-by-transfer (axon-reliable)."""
        t0 = time.time()
        float(fn(*fargs))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            r = fn(*fargs)
        float(r)
        ms = (time.time() - t0) / args.iters * 1e3
        out[tag] = {"ms": round(ms, 2), "compile_s": round(compile_s, 1)}
        print(f"# {tag}: {ms:.2f} ms (compile {compile_s:.0f}s)",
              file=sys.stderr, flush=True)

    # 1. full step
    step = make_update_step(upit, cfg, optimizer)
    p, s = jax.tree_util.tree_map(jnp.copy, (params0, state0))
    o = optimizer.init(p)
    state_box = {"v": (p, s, o)}

    def full(batch, key):
        p, s, o = state_box["v"]
        p, s, o, loss, norm = step(p, s, o, batch, key)
        state_box["v"] = (p, s, o)
        return loss

    timed("full_step", full, batch, key)

    # 2. forward + loss only
    @jax.jit
    def fwd(params, state, batch, key):
        loss, aux = upit.loss_fn(cfg, params, state, batch, key, True)
        return loss

    timed("forward_loss", lambda b, k: fwd(params0, state0, b, k), batch, key)

    # 3. value_and_grad, no optimizer.  The returned scalar must DEPEND on
    # every gradient leaf or XLA dead-code-eliminates the whole backward
    # pass (first version of this probe measured "backward" == forward).
    @jax.jit
    def vgrad(params, state, batch, key):
        def lossf(p):
            loss, aux = upit.loss_fn(cfg, p, state, batch, key, True)
            return loss
        loss, grads = jax.value_and_grad(lossf)(params)
        gnorm = sum(jnp.vdot(g, g) for g in jax.tree_util.tree_leaves(grads))
        return loss + 1e-30 * gnorm

    timed("forward_backward", lambda b, k: vgrad(params0, state0, b, k),
          batch, key)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
