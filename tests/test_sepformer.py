"""SepFormer dual-path attention architecture (models/sepformer.py):
masked-attention correctness, padding invariance, learning, remat, and
the DOMAIN='time' plumbing (train() -> pipeline). The shared dual-path
segmentation machinery is pinned by tests/test_dprnn.py (one
implementation, imported)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import sepformer as sf
from speech_separation_tpu.models.registry import get_arch, domain

TINY = dict(n_filters=16, filter_len=16, stride=8, channels=16, heads=2,
            d_ff=24, chunk=8, blocks=2)
CFG = sf.Config(num_spk=2, **TINY)


def _wav_batch(B=3, S=2, L=400, lengths=(400, 333, 200), seed=0):
    rng = np.random.default_rng(seed)
    srcs = rng.standard_normal((B, S, L)).astype(np.float32) * 0.1
    for b, n in enumerate(lengths):
        srcs[b, :, n:] = 0.0
    return {
        "mix_wav": jnp.asarray(srcs.sum(axis=1)),
        "source_wavs": jnp.asarray(srcs),
        "sample_lengths": jnp.asarray(lengths, np.int32),
        "row_mask": jnp.ones((B,), np.float32),
    }


def test_registry_domain_and_config():
    arch = get_arch("SepFormer")
    assert arch is sf and domain(arch) == "time"
    cfg = sf.Config.from_kwargs(channels="32", heads="4", chunk="50",
                                compute_dtype="bfloat16", bogus="dropped")
    assert cfg.channels == 32 and cfg.heads == 4 and cfg.hop == 25
    with pytest.raises(ValueError):
        sf.Config(channels=30, heads=4)  # not divisible
    with pytest.raises(ValueError):
        sf.Config(chunk=7)
    with pytest.raises(ValueError):
        sf.Config(mask_act="tanh")


def test_attention_key_masking():
    """A query's output must be identical whether masked-out key positions
    hold zeros or garbage — the -inf logits remove them from the softmax
    support entirely."""
    rng = np.random.default_rng(2)
    params, _ = sf.init(jax.random.PRNGKey(0), CFG)
    layer = params["blocks"][0]["intra"]
    R, T, H = 3, 8, CFG.channels
    x = rng.standard_normal((R, T, H)).astype(np.float32)
    kmask = np.ones((R, T), np.float32)
    kmask[:, 5:] = 0.0
    x_garbage = x.copy()
    x_garbage[:, 5:] = 1e3 * rng.standard_normal((R, 3, H))
    a = np.asarray(sf._attention(layer, jnp.asarray(x),
                                 jnp.asarray(kmask), CFG))
    b = np.asarray(sf._attention(layer, jnp.asarray(x_garbage),
                                 jnp.asarray(kmask), CFG))
    # valid QUERY rows agree exactly (their keys are the same 5 positions;
    # the garbage keys are softmax-excluded); garbage query rows differ
    # (they flow through residuals) but the dual-path wrapper re-masks them
    np.testing.assert_allclose(a[:, :5], b[:, :5], atol=1e-4, rtol=1e-4)


def test_separate_shapes_and_padding_invariance():
    params, state = sf.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(1)
    sig = rng.standard_normal(300).astype(np.float32) * 0.1

    wav1 = jnp.asarray(np.pad(sig, (0, 84))[None, :])
    out1 = np.asarray(sf.separate(CFG, params, state, wav1,
                                  jnp.asarray([300], np.int32)))
    assert out1.shape == (1, 2, 384) and np.all(np.isfinite(out1))

    big = np.zeros((3, 768), np.float32)
    big[1, :300] = sig
    out2 = np.asarray(sf.separate(CFG, params, state, jnp.asarray(big),
                                  jnp.asarray([17, 300, 1], np.int32)))
    np.testing.assert_allclose(out2[1, :, :300], out1[0, :, :300],
                               atol=2e-5, rtol=1e-4)


def test_loss_decreases_and_remat_matches():
    import optax
    params, state = sf.init(jax.random.PRNGKey(0), CFG)
    batch = _wav_batch(seed=5)
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(p, o):
        (l, _aux), g = jax.value_and_grad(
            lambda pp: sf.loss_fn(CFG, pp, state, batch,
                                  jax.random.PRNGKey(1), True),
            has_aux=True)(p)
        u, o = opt.update(g, o)
        return optax.apply_updates(p, u), o, l

    losses = []
    for _ in range(60):
        params, ost, l = step(params, ost)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 3.0, losses[::15]

    cfg_r = sf.Config(**{**CFG.__dict__, "remat": True})
    p0, s0 = sf.init(jax.random.PRNGKey(0), CFG)
    l_plain, _ = sf.loss_fn(CFG, p0, s0, batch, jax.random.PRNGKey(1), True)
    l_remat, _ = sf.loss_fn(cfg_r, p0, s0, batch, jax.random.PRNGKey(1), True)
    np.testing.assert_allclose(float(l_plain), float(l_remat), rtol=1e-6)


def test_pad_rows_keep_loss_finite():
    batch = _wav_batch()
    batch["row_mask"] = jnp.asarray([1.0, 1.0, 0.0])
    z = np.asarray(batch["source_wavs"]).copy()
    z[2] = 0.0
    batch["source_wavs"] = jnp.asarray(z)
    m = np.asarray(batch["mix_wav"]).copy()
    m[2] = 0.0
    batch["mix_wav"] = jnp.asarray(m)
    batch["sample_lengths"] = jnp.asarray([400, 333, 0], np.int32)
    params, state = sf.init(jax.random.PRNGKey(0), CFG)
    loss, _aux = sf.loss_fn(CFG, params, state, batch, jax.random.PRNGKey(1),
                            True)
    assert np.isfinite(float(loss))
    from jax.flatten_util import ravel_pytree
    g = jax.grad(lambda p: sf.loss_fn(CFG, p, state, batch,
                                      jax.random.PRNGKey(1), True)[0])(params)
    flat, _ = ravel_pytree(g)
    assert bool(jnp.all(jnp.isfinite(flat)))


def test_train_to_pipeline_end_to_end(tmp_path):
    from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
    from speech_separation_tpu.eval.pipeline import SeparationPipeline
    from speech_separation_tpu.train.loop import TrainLoopConfig, train
    from speech_separation_tpu.utils.synthetic import (make_synthetic_corpus,
                                                       write_id_list)

    ids = make_synthetic_corpus(str(tmp_path / "corpus"), 4, seed=0)
    write_id_list(str(tmp_path / "id_lists"), "toy", ids)
    reg = DatasetRegistry({"toy": str(tmp_path / "corpus")})
    d = prepare_data_dir("toy", reg, data_root=str(tmp_path / "data"),
                         id_lists_dir=str(tmp_path / "id_lists"))

    exp = str(tmp_path / "exp")
    kwargs = {k: str(v) for k, v in TINY.items()}
    train(d, exp, TrainLoopConfig(arch="SepFormer", batch_size=4,
                                  num_epochs=2, cv_every=1,
                                  on_device_features=True),
          cv_data_dir=d, model_kwargs=kwargs)
    assert os.path.isfile(os.path.join(exp, "final.mdl"))

    pipe = SeparationPipeline(os.path.join(exp, "final.mdl"),
                              batch_size=2, length_quantum=1024)
    assert pipe.domain == "time"
    rng = np.random.default_rng(3)
    sigs = [(0.05 * rng.standard_normal(n)).astype(np.float32)
            for n in (3000, 1700)]
    outs = pipe.separate(sigs)
    for sig, tracks in zip(sigs, outs):
        assert len(tracks) == 2
        for t in tracks:
            assert len(t) == len(sig) and np.all(np.isfinite(t))
