"""DPRNN dual-path time-domain architecture (models/dprnn.py): exact
segment/merge inversion, chunk-length bookkeeping, padding invariance
(masked gLN + true-length BLSTMs in both paths), learning, remat, and the
DOMAIN='time' plumbing end-to-end (train() -> checkpoint meta ->
SeparationPipeline)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import dprnn as dp
from speech_separation_tpu.models.registry import get_arch, domain

TINY = dict(n_filters=16, filter_len=16, stride=8, channels=12,
            rnn_hidden=10, chunk=8, blocks=2)
CFG = dp.Config(num_spk=2, **TINY)


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
    arch = get_arch("DPRNN")
    assert arch is dp and domain(arch) == "time"
    cfg = dp.Config.from_kwargs(n_filters="32", chunk="50",
                                compute_dtype="bfloat16", bogus="dropped")
    assert cfg.n_filters == 32 and cfg.chunk == 50 and cfg.hop == 25
    assert cfg.mxu_dtype == jnp.bfloat16
    with pytest.raises(ValueError):
        dp.Config(mask_act="tanh")
    with pytest.raises(ValueError):
        dp.Config(chunk=7)  # odd chunk has no 50% hop
    with pytest.raises(ValueError):
        dp.Config(filter_len=8, stride=16)


def test_segment_merge_is_exact_inverse():
    """merge(segment(x)) == x bit-for-bit: the front/back hop padding puts
    every real frame in exactly two chunks, so the averaged overlap-add
    inverts segmentation with no edge cases."""
    rng = np.random.default_rng(0)
    for T in (1, 3, 4, 7, 8, 37, 64):
        x = jnp.asarray(rng.standard_normal((2, T, 5)).astype(np.float32))
        ch = dp._segment(x, 4)
        assert ch.shape[2] == 8
        back = dp._merge(ch, 4, T)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_chunk_length_bookkeeping():
    """_chunk_lengths marks exactly the positions _segment filled with real
    frames, and chunks are 'real' (length > 0) exactly up to the per-row
    chunk count the inter-path masks with."""
    cfg = dp.Config(num_spk=2, **TINY)
    P = cfg.hop
    n_t = 23
    C = dp.num_chunks(cfg, n_t)
    for vt_val in (1, 3, P, P + 1, n_t):
        vt = jnp.asarray([vt_val], np.int32)
        clens = np.asarray(dp._chunk_lengths(cfg, vt, C))[0]
        # rebuild the expected mask by segmenting an indicator signal
        ind = jnp.asarray((np.arange(n_t) < vt_val
                           ).astype(np.float32)[None, :, None])
        seg = np.asarray(dp._segment(ind, P))[0, :, :, 0]     # (C', K)
        assert seg.shape[0] == C
        for c in range(C):
            got = (np.arange(cfg.chunk) < clens[c]).astype(np.float32)
            # valid-prefix mask must cover every real frame and no frame
            # beyond the last real one (front-pad zeros inside the prefix
            # are structural and allowed)
            on = np.nonzero(seg[c])[0]
            if len(on):
                assert clens[c] == on[-1] + 1
            else:
                assert clens[c] == max(0, min(cfg.chunk, P * (1 - c) + vt_val))
        n_real = int(np.sum(clens > 0))
        assert n_real == int(-(-vt_val // P)) + 1


def test_separate_shapes_and_padding_invariance():
    """An utterance's separated samples must not depend on the batch/time
    padding it shares a program with: gLN statistics are masked and both
    BLSTM paths consume true lengths (the backward directions start at the
    true last frame/chunk, so pad frames and pad chunks cannot evolve
    their state)."""
    params, state = dp.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(1)
    sig = rng.standard_normal(300).astype(np.float32) * 0.1

    wav1 = jnp.asarray(np.pad(sig, (0, 84))[None, :])          # (1, 384)
    out1 = np.asarray(dp.separate(CFG, params, state, wav1,
                                  jnp.asarray([300], np.int32)))
    assert out1.shape == (1, 2, 384)
    assert np.all(np.isfinite(out1))

    big = np.zeros((3, 768), np.float32)                        # extra rows
    big[1, :300] = sig                                          # + longer pad
    out2 = np.asarray(dp.separate(CFG, params, state, jnp.asarray(big),
                                  jnp.asarray([17, 300, 1], np.int32)))
    np.testing.assert_allclose(out2[1, :, :300], out1[0, :, :300],
                               atol=2e-5, rtol=1e-4)


def test_loss_decreases_and_remat_matches():
    import optax
    params, state = dp.init(jax.random.PRNGKey(0), CFG)
    batch = _wav_batch(seed=5)
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(p, o):
        (l, _aux), g = jax.value_and_grad(
            lambda pp: dp.loss_fn(CFG, pp, state, batch,
                                  jax.random.PRNGKey(1), True),
            has_aux=True)(p)
        u, o = opt.update(g, o)
        return optax.apply_updates(p, u), o, l

    losses = []
    for _ in range(60):
        params, ost, l = step(params, ost)
        losses.append(float(l))
    # loss is mean negative SI-SNR in dB; demand a >= 3 dB improvement
    assert losses[-1] < losses[0] - 3.0, losses[::15]

    cfg_r = dp.Config(**{**CFG.__dict__, "remat": True})
    p0, s0 = dp.init(jax.random.PRNGKey(0), CFG)
    l_plain, _ = dp.loss_fn(CFG, p0, s0, batch, jax.random.PRNGKey(1), True)
    l_remat, _ = dp.loss_fn(cfg_r, p0, s0, batch, jax.random.PRNGKey(1), True)
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
    params, state = dp.init(jax.random.PRNGKey(0), CFG)
    loss, _aux = dp.loss_fn(CFG, params, state, batch, jax.random.PRNGKey(1),
                            True)
    assert np.isfinite(float(loss))
    from jax.flatten_util import ravel_pytree
    g = jax.grad(lambda p: dp.loss_fn(CFG, p, state, batch,
                                      jax.random.PRNGKey(1), True)[0])(params)
    flat, _ = ravel_pytree(g)
    assert bool(jnp.all(jnp.isfinite(flat)))


def test_train_to_pipeline_end_to_end(tmp_path):
    """DOMAIN='time' plumbing: waveform-direct train() -> checkpoint meta ->
    SeparationPipeline time branch, exact output lengths."""
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
    train(d, exp, TrainLoopConfig(arch="DPRNN", batch_size=4,
                                  num_epochs=2, cv_every=1,
                                  on_device_features=True),
          cv_data_dir=d, model_kwargs=kwargs)
    assert os.path.isfile(os.path.join(exp, "final.mdl"))
    with open(os.path.join(exp, "train_stats", "train_loss.txt")) as f:
        losses = [float(line.split()[1]) for line in f]
    assert len(losses) == 2 and all(np.isfinite(losses))

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
