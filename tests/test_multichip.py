"""Multi-device sharding tests on the 8-device virtual CPU mesh
(the TPU-world fake backend, SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.parallel.mesh import (make_mesh, shard_batch,
                                                 replicate_tree, shard_params)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_entrypoints():
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 256, 257 * 2)
    assert bool(jnp.all((out >= 0) & (out <= 1)))

    mod.dryrun_multichip(8)  # dp=4 x tp=2
    mod.dryrun_multichip(2)  # dp=2


def test_data_parallel_loss_matches_single_device():
    """The sharded training step must compute the same loss as single-device
    execution (determinism of the dp/tp decomposition)."""
    from speech_separation_tpu.models import upit
    from speech_separation_tpu.train.loop import (TrainLoopConfig,
                                                  make_optimizer,
                                                  make_update_step)

    cfg = upit.Config(feat_dim=16, hidden=8, num_layers=1, num_spk=2,
                      zero_init_hidden=True)
    params, state = upit.init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer(TrainLoopConfig())
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    B, T, F, S = 8, 32, 16, 2
    lengths = rng.integers(16, T + 1, size=B).astype(np.int32)
    mix = np.abs(rng.standard_normal((B, T, F))).astype(np.float32)
    sources = np.abs(rng.standard_normal((B, S, T, F))).astype(np.float32)
    for b in range(B):
        mix[b, lengths[b]:] = 0.0
        sources[b, :, lengths[b]:] = 0.0
    batch_np = {"mix": mix, "sources": sources, "lengths": lengths,
                "row_mask": np.ones((B,), np.float32)}

    step = make_update_step(upit, cfg, optimizer)
    key = jax.random.PRNGKey(1)

    # the update step donates its params/state/opt buffers, so each path
    # gets its own identically-initialized copies
    def fresh():
        p, s = upit.init(jax.random.PRNGKey(0), cfg)
        return p, s, optimizer.init(p)

    # single device
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    p, s, o = fresh()
    p1, s1, o1, loss1, norm1 = step(p, s, o, batch1, key)

    # 8-device data parallel
    mesh = make_mesh()
    batch8 = shard_batch(batch_np, mesh)
    p, s, o = fresh()
    p8 = replicate_tree(p, mesh)
    s8 = replicate_tree(s, mesh)
    o8 = replicate_tree(o, mesh)
    with mesh:
        p8, s8, o8, loss8, norm8 = step(p8, s8, o8, batch8, key)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    np.testing.assert_allclose(float(norm1), float(norm8), rtol=1e-6)
    # updated parameters agree too
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tensor_parallel_placement():
    from speech_separation_tpu.models import upit

    cfg = upit.Config(feat_dim=16, hidden=8, num_layers=1)
    params, _ = upit.init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh)
    w = sharded["lin"]["w"]
    # output dim split over 2 model shards
    assert len({d for d in w.sharding.device_set}) == 8
    spec = w.sharding.spec
    assert spec == jax.sharding.PartitionSpec(None, "model")


@pytest.mark.parametrize("lstm_gates", [False, True])
def test_dp_tp_loss_and_params_match_single_device(lstm_gates):
    """dp=4 x tp=2: the full update step (loss, grads, clip, Adam) under
    combined batch + tensor-parallel sharding reproduces single-device
    results — GSPMD's collectives are numerically invisible
    (VERDICT round-1 missing #4: TP had placement-only coverage).
    Both placements: head-only TP (default) and gate-dim LSTM TP."""
    from speech_separation_tpu.models import upit
    from speech_separation_tpu.train.loop import (TrainLoopConfig,
                                                  make_optimizer,
                                                  make_update_step)

    cfg = upit.Config(feat_dim=16, hidden=8, num_layers=2, num_spk=2,
                      zero_init_hidden=True)
    optimizer = make_optimizer(TrainLoopConfig())
    step = make_update_step(upit, cfg, optimizer)
    key = jax.random.PRNGKey(1)

    rng = np.random.default_rng(3)
    B, T, F, S = 8, 32, 16, 2
    lengths = rng.integers(16, T + 1, size=B).astype(np.int32)
    mix = np.abs(rng.standard_normal((B, T, F))).astype(np.float32)
    sources = np.abs(rng.standard_normal((B, S, T, F))).astype(np.float32)
    for b in range(B):
        mix[b, lengths[b]:] = 0.0
        sources[b, :, lengths[b]:] = 0.0
    batch_np = {"mix": mix, "sources": sources, "lengths": lengths,
                "row_mask": np.ones((B,), np.float32)}

    def fresh():
        p, s = upit.init(jax.random.PRNGKey(0), cfg)
        return p, s, optimizer.init(p)

    # single device
    p, s, o = fresh()
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    p1, s1, o1, loss1, norm1 = step(p, s, o, batch1, key)

    # dp=4 x tp=2: batch over 'data', gate/head weights over 'model'
    mesh = make_mesh(data=4, model=2)
    p, s, o = fresh()
    p_tp = shard_params(p, mesh, lstm_gates=lstm_gates)
    s_tp = replicate_tree(s, mesh)
    o_tp = replicate_tree(o, mesh)
    with mesh:
        batch_tp = shard_batch(batch_np, mesh)
        p2, s2, o2, loss2, norm2 = step(p_tp, s_tp, o_tp, batch_tp, key)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(float(norm1), float(norm2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # BN state (running stats) must agree as well
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
