#!/usr/bin/env python3
"""Measure tensor-parallel overhead of the gate-dim sharding (VERDICT
round-1 weak #2): compile the full update step under dp-only and dp x tp,
count the collectives inside the scan body (a hardware-independent cost
statement), and time steps on the virtual mesh (relative only — the 8
'devices' share one CPU).

Usage: python tools/measure_tp_overhead.py
"""

import os
import re
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def build(mesh, cfg, batch_np, step, optimizer, lstm_gates=False):
    from speech_separation_tpu.models import upit
    from speech_separation_tpu.parallel.mesh import (replicate_tree,
                                                     shard_batch,
                                                     shard_params)

    p, s = upit.init(jax.random.PRNGKey(0), cfg)
    o = optimizer.init(p)
    p = shard_params(p, mesh, lstm_gates=lstm_gates)
    s = replicate_tree(s, mesh)
    o = replicate_tree(o, mesh)
    batch = shard_batch(batch_np, mesh)
    return p, s, o, batch


def collective_counts(text):
    """Collectives total and inside while bodies (per-scan-step cost)."""
    total = {op: len(re.findall(rf"\b{op}", text))
             for op in ("all-reduce", "all-gather", "collective-permute",
                        "reduce-scatter", "all-to-all")}
    # while-body regions: crude but effective — fusion computations named
    # like while_body contain the scan step
    body_ops = 0
    in_body = False
    for line in text.splitlines():
        if re.match(r"%?\S*(while_body|body)\S*\s*\(", line.strip()):
            in_body = True
        elif line.strip().startswith("}") and in_body:
            in_body = False
        elif in_body and re.search(r"all-reduce|all-gather|collective-permute",
                                   line):
            body_ops += 1
    return total, body_ops


def main():
    from speech_separation_tpu.models import upit
    from speech_separation_tpu.parallel.mesh import make_mesh
    from speech_separation_tpu.train.loop import (TrainLoopConfig,
                                                  make_optimizer,
                                                  make_update_step)

    cfg = upit.Config(feat_dim=64, hidden=64, num_layers=2, num_spk=2,
                      zero_init_hidden=True)
    optimizer = make_optimizer(TrainLoopConfig())
    step = make_update_step(upit, cfg, optimizer)

    B, T = 8, 128
    rng = np.random.default_rng(0)
    batch_np = {
        "mix": np.abs(rng.standard_normal((B, T, cfg.feat_dim))).astype(np.float32),
        "sources": np.abs(rng.standard_normal((B, cfg.num_spk, T, cfg.feat_dim))).astype(np.float32),
        "lengths": np.full(B, T, np.int32),
        "row_mask": np.ones(B, np.float32),
    }
    key = jax.random.PRNGKey(1)

    results = {}
    for name, (dp, tp, gates) in (("dp8", (8, 1, False)),
                                  ("dp4xtp2-head", (4, 2, False)),
                                  ("dp4xtp2-gates", (4, 2, True))):
        mesh = make_mesh(data=dp, model=tp)
        with mesh:
            p, s, o, batch = build(mesh, cfg, batch_np, step, optimizer,
                                   lstm_gates=gates)
            lowered = jax.jit(step.__wrapped__).lower(p, s, o, batch, key)
            text = lowered.compile().as_text()
            total, body = collective_counts(text)
            # timing (relative; virtual devices share one CPU)
            p, s, o, batch = build(mesh, cfg, batch_np, step, optimizer,
                                   lstm_gates=gates)
            r = step(p, s, o, batch, key)
            float(r[3])
            p, s, o = r[0], r[1], r[2]  # originals were donated
            t0 = time.time()
            for _ in range(10):
                p, s, o, loss, _ = step(p, s, o, batch, key)
            float(loss)
            dt = (time.time() - t0) / 10
        results[name] = (total, body, dt)
        print(f"{name}: collectives={total} in-scan-body={body} "
              f"step={dt * 1e3:.1f} ms")

    d8 = results["dp8"][2]
    for name in ("dp4xtp2-head", "dp4xtp2-gates"):
        dtp = results[name][2]
        print(f"{name} vs dp8 on the virtual mesh: {dtp / d8:.2f}x "
              f"({d8 * 1e3:.1f} ms -> {dtp * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
