"""TCN architecture plugin (models/tcn.py): contract, padding invariance,
learning, and the full pipeline (train loop -> masks -> fused serving).

The TCN is a beyond-reference arch sharing uPIT's loss/head contract, so
most machinery is covered by the uPIT tests; what is pinned here is (a)
the properties the TCN claims that the BLSTMs do NOT have (exact padding
invariance, mode-free forward), and (b) that the duck-typed plugin wiring
really accepts a third arch end-to-end (registry -> train() -> checkpoint
meta -> SeparationPipeline)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import tcn
from speech_separation_tpu.models.registry import get_arch

CFG = tcn.Config(feat_dim=33, num_spk=2, channels=16, hidden=24, blocks=3,
                 repeats=2)


def _batch(B=3, T=40, F=33, seed=0, lengths=(40, 30, 17)):
    rng = np.random.default_rng(seed)
    return {
        "mix": jnp.asarray(np.abs(rng.standard_normal((B, T, F))).astype(np.float32)),
        "sources": jnp.asarray(np.abs(rng.standard_normal((B, 2, T, F))).astype(np.float32)),
        "lengths": jnp.asarray(lengths, np.int32),
        "row_mask": jnp.ones((B,), np.float32),
    }


def test_registry_and_config_coercion():
    assert get_arch("TCN") is tcn
    cfg = tcn.Config.from_kwargs(channels="24", repeats="2", remat="true",
                                 compute_dtype="bfloat16", bogus="ignored")
    assert cfg.channels == 24 and cfg.repeats == 2 and cfg.remat is True
    assert cfg.mxu_dtype == jnp.bfloat16


def test_mask_contract_and_mode_free_forward():
    params, state = tcn.init(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    masks = tcn.infer_masks(CFG, params, state, batch, jax.random.PRNGKey(1))
    assert masks.shape == (3, 40, 33 * 2)
    assert float(masks.min()) >= 0.0 and float(masks.max()) <= 1.0
    # no batch statistics => train-mode forward is identical to eval
    train_masks, new_state = tcn.forward(
        CFG, params, state, batch["mix"], batch["lengths"],
        batch["row_mask"], jax.random.PRNGKey(1), train=True)
    np.testing.assert_array_equal(np.asarray(masks), np.asarray(train_masks))
    assert new_state == {}


def test_padding_invariance_exact():
    """Outputs must be bit-identical however much time padding the batch
    carries — the clean semantics the reference BLSTMs (padded BN) lack."""
    params, state = tcn.init(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    masks = tcn.infer_masks(CFG, params, state, batch, jax.random.PRNGKey(1))
    mix2 = jnp.zeros((3, 64, 33)).at[:, :40, :].set(batch["mix"])
    m2 = tcn.infer_masks(CFG, params, state, dict(batch, mix=mix2),
                         jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(m2[:, :40, :]),
                                  np.asarray(masks))
    # frames past each row's true length are exactly zero
    m = np.asarray(masks)
    for b, L in enumerate((40, 30, 17)):
        assert np.all(m[b, L:] == 0.0)


def test_loss_decreases_and_remat_matches():
    import optax
    params, state = tcn.init(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(p, o):
        (l, _aux), g = jax.value_and_grad(
            lambda pp: tcn.loss_fn(CFG, pp, state, batch,
                                   jax.random.PRNGKey(1), True),
            has_aux=True)(p)
        u, o = opt.update(g, o)
        return optax.apply_updates(p, u), o, l

    losses = []
    for _ in range(40):
        params, ost, l = step(params, ost)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.9, losses[::10]

    # remat computes the identical loss/gradients, just cheaper in memory
    cfg_r = tcn.Config(**{**CFG.__dict__, "remat": True})
    p0, s0 = tcn.init(jax.random.PRNGKey(0), CFG)
    l_plain, _ = tcn.loss_fn(CFG, p0, s0, batch, jax.random.PRNGKey(1), True)
    l_remat, _ = tcn.loss_fn(cfg_r, p0, s0, batch, jax.random.PRNGKey(1), True)
    np.testing.assert_allclose(float(l_plain), float(l_remat), rtol=1e-6)


@pytest.mark.parametrize("num_spk", [3])
def test_three_speaker_masks(num_spk):
    cfg = tcn.Config(feat_dim=17, num_spk=num_spk, channels=8, hidden=12,
                     blocks=2, repeats=1)
    params, state = tcn.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    B, T, F = 2, 20, 17
    batch = {
        "mix": jnp.asarray(np.abs(rng.standard_normal((B, T, F))).astype(np.float32)),
        "sources": jnp.asarray(np.abs(rng.standard_normal((B, num_spk, T, F))).astype(np.float32)),
        "lengths": jnp.asarray([20, 13], np.int32),
        "row_mask": jnp.ones((B,), np.float32),
    }
    loss, aux = tcn.loss_fn(cfg, params, state, batch, jax.random.PRNGKey(1), True)
    assert np.isfinite(float(loss))
    assert tcn.infer_masks(cfg, params, state, batch,
                           jax.random.PRNGKey(1)).shape == (B, T, F * num_spk)


def test_train_loop_to_pipeline(tmp_path):
    """Third-arch wiring end-to-end: train() -> checkpoint meta carries
    arch=TCN -> SeparationPipeline reconstructs it and separates."""
    from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
    from speech_separation_tpu.dsp import STFTConfig
    from speech_separation_tpu.dsp.extract import extract_features
    from speech_separation_tpu.eval.pipeline import SeparationPipeline
    from speech_separation_tpu.train.loop import TrainLoopConfig, train
    from speech_separation_tpu.utils.synthetic import (make_synthetic_corpus,
                                                       write_id_list)

    root = tmp_path
    ids = make_synthetic_corpus(str(root / "corpus"), 4, seed=0)
    write_id_list(str(root / "id_lists"), "toy", ids)
    reg = DatasetRegistry({"toy": str(root / "corpus")})
    d = prepare_data_dir("toy", reg, data_root=str(root / "data"),
                         id_lists_dir=str(root / "id_lists"))
    extract_features(d, "train", str(root / "feats"), STFTConfig())

    exp = str(root / "exp")
    kwargs = {"channels": "12", "hidden": "16", "blocks": "2", "repeats": "1"}
    train(d, exp, TrainLoopConfig(arch="TCN", batch_size=4, num_epochs=2,
                                  time_pad_multiple=64, make_plots=True,
                                  cv_every=1),
          cv_data_dir=d, model_kwargs=kwargs)
    assert os.path.isfile(os.path.join(exp, "final.mdl"))
    with open(os.path.join(exp, "train_stats", "train_loss.txt")) as f:
        losses = [float(line.split()[1]) for line in f]
    assert len(losses) == 2 and all(np.isfinite(losses))
    # plots took the uPIT-contract branch (Masked_Mixture etc.), not RSH's
    plotdir = os.path.join(exp, "train_stats", "plots", "epoch001")
    assert os.path.isfile(os.path.join(plotdir, "Masked_Mixture.png"))

    pipe = SeparationPipeline(os.path.join(exp, "final.mdl"),
                              batch_size=2, length_quantum=4096)
    rng = np.random.default_rng(3)
    tracks = pipe.separate([
        (0.05 * rng.standard_normal(7000)).astype(np.float32)])[0]
    assert len(tracks) == 2 and all(np.all(np.isfinite(t)) for t in tracks)


def test_depthwise_matches_numpy_reference():
    """The grouped-conv dimension numbers are easy to get wrong; pin the
    depthwise dilated conv against a literal per-channel cross-correlation."""
    from speech_separation_tpu.models.tcn import _depthwise
    rng = np.random.default_rng(0)
    B, T, H, K, d = 2, 12, 3, 3, 2
    x = rng.standard_normal((B, T, H)).astype(np.float32)
    k = rng.standard_normal((K, H)).astype(np.float32)
    b = rng.standard_normal((H,)).astype(np.float32)
    y = np.asarray(_depthwise(jnp.asarray(x), jnp.asarray(k),
                              jnp.asarray(b), d))
    pad = (K - 1) // 2 * d
    ref = np.zeros_like(x)
    xp = np.pad(x, ((0, 0), (pad, pad), (0, 0)))
    for t in range(T):
        for j in range(K):
            ref[:, t, :] += xp[:, t + j * d, :] * k[j]
    ref += b
    np.testing.assert_allclose(y, ref, atol=1e-5)
