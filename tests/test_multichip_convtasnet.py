"""ConvTasNet under the device mesh: DP and dp x tp (Megatron-style block
sharding, parallel/mesh.py shard_params_convtasnet) must reproduce
single-device training exactly (VERDICT r04 #5: the multichip matrix was
missing its best-scoring arch, and only uPIT exercised the model axis)."""

import numpy as np

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import convtasnet
from speech_separation_tpu.parallel.mesh import (make_mesh, replicate_tree,
                                                 shard_batch,
                                                 shard_params_convtasnet)
from speech_separation_tpu.train.loop import (TrainLoopConfig, make_optimizer,
                                              make_update_step)

CFG = convtasnet.Config(n_filters=16, filter_len=16, stride=8, channels=8,
                        hidden=12, kernel=3, blocks=2, repeats=2, num_spk=2)


def _wave_batch(B=8, L=512, seed=0):
    rng = np.random.default_rng(seed)
    srcs = (0.1 * rng.standard_normal((B, CFG.num_spk, L))).astype(np.float32)
    return {"mix_wav": srcs.sum(axis=1), "source_wavs": srcs,
            "sample_lengths": np.full(B, L, np.int32),
            "row_mask": np.ones(B, np.float32)}


def _single_device_step(batch_np, key):
    optimizer = make_optimizer(TrainLoopConfig())
    params, state = convtasnet.init(jax.random.PRNGKey(0), CFG)
    opt_state = optimizer.init(params)
    step = make_update_step(convtasnet, CFG, optimizer)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    return step(params, state, opt_state, batch, key)


def test_tp_placement_specs():
    params, _ = convtasnet.init(jax.random.PRNGKey(0), CFG)
    mesh = make_mesh(data=4, model=2)
    sh = shard_params_convtasnet(params, mesh)
    P = jax.sharding.PartitionSpec
    assert sh["blocks"][0]["expand"]["w"].sharding.spec == P(None, "model")
    assert sh["blocks"][0]["dw"].sharding.spec == P(None, "model")
    assert sh["blocks"][0]["prelu1"].sharding.spec == P("model")
    # row-parallel: input dim sharded, bias replicated (added post-psum)
    assert sh["blocks"][0]["res"]["w"].sharding.spec == P("model", None)
    assert sh["blocks"][0]["res"]["b"].sharding.spec == P()
    assert sh["head"]["w"].sharding.spec == P(None, "model")
    assert sh["head_prelu"].sharding.spec == P()
    assert sh["enc"].sharding.spec == P()
    assert sh["dec"].sharding.spec == P()


def test_dp_tp_step_matches_single_device():
    """dp=4 x tp=2 full update step (SI-SNR PIT loss, grads, clip, Adam)
    == single device: GSPMD's block all-reduces are numerically invisible."""
    batch_np = _wave_batch()
    key = jax.random.PRNGKey(1)
    p1, s1, o1, loss1, norm1 = _single_device_step(batch_np, key)

    mesh = make_mesh(data=4, model=2)
    optimizer = make_optimizer(TrainLoopConfig())
    params, state = convtasnet.init(jax.random.PRNGKey(0), CFG)
    opt_state = optimizer.init(params)
    params = shard_params_convtasnet(params, mesh)
    state = replicate_tree(state, mesh)
    opt_state = replicate_tree(opt_state, mesh)
    step = make_update_step(convtasnet, CFG, optimizer)
    with mesh:
        batch = shard_batch(batch_np, mesh)
        p8, s8, o8, loss8, norm8 = step(params, state, opt_state, batch, key)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=2e-4)
    np.testing.assert_allclose(float(norm1), float(norm8), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dp_step_matches_single_device():
    """Pure data parallel (the production posture for 2-9M-param
    time-domain archs, docs/design.md) == single device."""
    batch_np = _wave_batch(seed=5)
    key = jax.random.PRNGKey(2)
    p1, s1, o1, loss1, norm1 = _single_device_step(batch_np, key)

    mesh = make_mesh()  # all 8 on data
    optimizer = make_optimizer(TrainLoopConfig())
    params, state = convtasnet.init(jax.random.PRNGKey(0), CFG)
    opt_state = optimizer.init(params)
    params = replicate_tree(params, mesh)
    state = replicate_tree(state, mesh)
    opt_state = replicate_tree(opt_state, mesh)
    step = make_update_step(convtasnet, CFG, optimizer)
    with mesh:
        batch = shard_batch(batch_np, mesh)
        p8, s8, o8, loss8, norm8 = step(params, state, opt_state, batch, key)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
