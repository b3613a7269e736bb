"""Conv-TasNet time-domain architecture (models/convtasnet.py): the SI-SNR
uPIT objective against a literal numpy transcription, padding invariance,
permutation selection, learning, and the DOMAIN='time' plumbing end-to-end
(waveform batches -> train() -> checkpoint meta -> SeparationPipeline)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.models import convtasnet as ct
from speech_separation_tpu.models.registry import get_arch, domain
from speech_separation_tpu.ops.pit import make_permutations

TINY = dict(n_filters=32, filter_len=16, stride=8, channels=16, hidden=24,
            kernel=3, blocks=3, repeats=2)
CFG = ct.Config(num_spk=2, **TINY)


def _np_si_snr(est: np.ndarray, ref: np.ndarray) -> float:
    """Textbook scalar SI-SNR (zero-mean, project, ratio) on 1-D signals."""
    est = est.astype(np.float64) - est.mean()
    ref = ref.astype(np.float64) - ref.mean()
    s_t = (np.dot(est, ref) / np.dot(ref, ref)) * ref
    e_n = est - s_t
    return 10.0 * np.log10(np.sum(s_t ** 2) / np.sum(e_n ** 2))


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
    arch = get_arch("ConvTasNet")
    assert arch is ct and domain(arch) == "time"
    cfg = ct.Config.from_kwargs(n_filters="64", causal="true", norm="gln",
                                compute_dtype="bfloat16", bogus="dropped")
    assert cfg.n_filters == 64 and cfg.causal is True
    assert cfg.norm == "cln"  # causal forces causal-safe normalization
    assert cfg.mxu_dtype == jnp.bfloat16
    with pytest.raises(ValueError):
        ct.Config(mask_act="tanh")
    with pytest.raises(ValueError):
        ct.Config(filter_len=8, stride=16)


def test_pairwise_si_snr_matches_numpy():
    """Every (i, j) entry of the device pairwise matrix must equal the
    textbook SI-SNR of (est_i, ref_j) over the row's true samples."""
    batch = _wav_batch(seed=3)
    rng = np.random.default_rng(4)
    est = rng.standard_normal((3, 2, 400)).astype(np.float32) * 0.1
    lengths = (400, 333, 200)
    for b, n in enumerate(lengths):
        est[b, :, n:] = 0.0
    smask = np.zeros((3, 400), np.float32)
    for b, n in enumerate(lengths):
        smask[b, :n] = 1.0
    neg = np.asarray(ct.pairwise_neg_si_snr(
        jnp.asarray(est), batch["source_wavs"], jnp.asarray(smask)))
    refs = np.asarray(batch["source_wavs"])
    for b, n in enumerate(lengths):
        for i in range(2):
            for j in range(2):
                want = _np_si_snr(est[b, i, :n], refs[b, j, :n])
                # f32 device math vs f64 numpy: deep-negative pairs
                # (independent noise, ~-50 dB) wobble by a few millidB;
                # any formula error would shift whole dB
                np.testing.assert_allclose(-neg[b, i, j], want, atol=5e-3)


def test_loss_selects_best_permutation():
    """Estimates that are (noisy) swapped copies of the sources must select
    the swap permutation and score the matched SI-SNR."""
    B, S, L = 2, 2, 512
    rng = np.random.default_rng(0)
    srcs = rng.standard_normal((B, S, L)).astype(np.float32)
    est = srcs[:, ::-1, :] + 0.01 * rng.standard_normal((B, S, L)).astype(np.float32)
    smask = np.ones((B, L), np.float32)
    neg = ct.pairwise_neg_si_snr(jnp.asarray(est), jnp.asarray(srcs),
                                 jnp.asarray(smask))
    from speech_separation_tpu.ops.pit import permutation_min_loss
    min_losses, best = permutation_min_loss(neg, S)
    perms = make_permutations(S)
    for b in range(B):
        assert tuple(perms[int(best[b])]) == (1, 0)
        # matched pairs are ~40 dB; the min loss is their (negated) sum
        assert float(min_losses[b]) < -2 * 30.0


def test_separate_shapes_and_padding_invariance():
    """An utterance's separated samples must not depend on how much batch
    or time padding it shares a batch with (masked gLN statistics)."""
    params, state = ct.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(1)
    sig = rng.standard_normal(300).astype(np.float32) * 0.1

    wav1 = jnp.asarray(np.pad(sig, (0, 84))[None, :])          # (1, 384)
    out1 = np.asarray(ct.separate(CFG, params, state, wav1,
                                  jnp.asarray([300], np.int32)))
    assert out1.shape == (1, 2, 384)

    big = np.zeros((3, 768), np.float32)                        # extra rows
    big[1, :300] = sig                                          # + longer pad
    wav2 = jnp.asarray(big)
    out2 = np.asarray(ct.separate(CFG, params, state, wav2,
                                  jnp.asarray([1, 300, 1], np.int32)))
    np.testing.assert_allclose(out2[1, :, :300], out1[0, :, :300],
                               atol=2e-5, rtol=1e-4)


def test_cln_variant_and_causal_receptive_field():
    cfg = ct.Config(num_spk=2, causal=True, **TINY)
    assert cfg.norm == "cln"
    params, state = ct.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32) * 0.1)
    n = jnp.asarray([256], np.int32)
    base = np.asarray(ct.separate(cfg, params, state, wav, n))
    # causality at the latent-frame level: perturbing the LAST encoder
    # frame's samples must not change earlier frames' decoded output
    # region (frames before the perturbed frame's start)
    pert = np.asarray(wav).copy()
    pert[0, -cfg.stride:] += 1.0
    out = np.asarray(ct.separate(cfg, params, state, jnp.asarray(pert), n))
    # frames 0..T'-3 are untouched; their decode region ends at
    # (T'-3)*stride + filter_len
    n_t = ct.latent_frames(cfg, 256)
    safe = (n_t - 3) * cfg.stride + cfg.filter_len - cfg.filter_len
    np.testing.assert_allclose(out[:, :, :safe], base[:, :, :safe],
                               atol=1e-6)
    assert cfg.receptive_field > 1


def test_loss_decreases_and_remat_matches():
    import optax
    params, state = ct.init(jax.random.PRNGKey(0), CFG)
    batch = _wav_batch(seed=5)
    opt = optax.adam(3e-3)
    ost = opt.init(params)

    @jax.jit
    def step(p, o):
        (l, _aux), g = jax.value_and_grad(
            lambda pp: ct.loss_fn(CFG, pp, state, batch,
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

    cfg_r = ct.Config(**{**CFG.__dict__, "remat": True})
    p0, s0 = ct.init(jax.random.PRNGKey(0), CFG)
    l_plain, _ = ct.loss_fn(CFG, p0, s0, batch, jax.random.PRNGKey(1), True)
    l_remat, _ = ct.loss_fn(cfg_r, p0, s0, batch, jax.random.PRNGKey(1), True)
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
    params, state = ct.init(jax.random.PRNGKey(0), CFG)
    loss, aux = ct.loss_fn(CFG, params, state, batch, jax.random.PRNGKey(1),
                           True)
    assert np.isfinite(float(loss))
    from jax.flatten_util import ravel_pytree
    g = jax.grad(lambda p: ct.loss_fn(CFG, p, state, batch,
                                      jax.random.PRNGKey(1), True)[0])(params)
    flat, _ = ravel_pytree(g)
    assert bool(jnp.all(jnp.isfinite(flat)))


def test_audio_to_wave_batch_strips_reflect_padding(tmp_path):
    """The shipped audio batch carries reflect-padded rows for the STFT
    models; the wave batch must recover the raw samples exactly."""
    from speech_separation_tpu.dsp import STFTConfig
    from speech_separation_tpu.train.wav_data import (WavDataset,
                                                      collate_wav_batch,
                                                      audio_to_wave_batch)
    from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
    from speech_separation_tpu.utils.synthetic import (make_synthetic_corpus,
                                                       write_id_list)
    from speech_separation_tpu.utils.audio import load_wav

    ids = make_synthetic_corpus(str(tmp_path / "corpus"), 3, seed=0)
    write_id_list(str(tmp_path / "id_lists"), "toy", ids)
    reg = DatasetRegistry({"toy": str(tmp_path / "corpus")})
    d = prepare_data_dir("toy", reg, data_root=str(tmp_path / "data"),
                         id_lists_dir=str(tmp_path / "id_lists"))
    cfg = STFTConfig()
    ds = WavDataset(d, cfg)
    raw = collate_wav_batch(ds, [0, 1, 2], batch_size=3)
    wb = audio_to_wave_batch({k: (jnp.asarray(v) if isinstance(v, np.ndarray)
                                  else v) for k, v in raw.items()}, cfg)
    mix = np.asarray(wb["mix_wav"])
    srcs = np.asarray(wb["source_wavs"])
    assert srcs.shape[1] == 2
    for r in range(3):
        utt, path = ds.entries[r]
        want, _ = load_wav(path, sr=cfg.sample_rate)
        n = int(wb["sample_lengths"][r])
        assert n == len(want)
        np.testing.assert_allclose(mix[r, :n], want, atol=1.0 / 32768)
        assert np.all(mix[r, n:] == 0.0) and np.all(srcs[r, :, n:] == 0.0)


def test_train_requires_waveform_direct(tmp_path):
    from speech_separation_tpu.train.loop import TrainLoopConfig, train
    with pytest.raises(ValueError, match="time-domain"):
        train(str(tmp_path / "nodata"), str(tmp_path / "exp"),
              TrainLoopConfig(arch="ConvTasNet", on_device_features=False))


def test_generate_masks_rejects_time_domain(tmp_path):
    from speech_separation_tpu.train.checkpoint import save_checkpoint
    from speech_separation_tpu.eval.infer import generate_masks
    params, state = ct.init(jax.random.PRNGKey(0), CFG)
    mdl = str(tmp_path / "m.mdl")
    save_checkpoint(mdl, params=params, state=state, opt_state=None,
                    rng=None, epoch=0,
                    meta={"arch": "ConvTasNet",
                          "model_kwargs": {k: str(v) for k, v in TINY.items()}})
    with pytest.raises(ValueError, match="time-domain"):
        generate_masks(mdl, "unused", str(tmp_path / "masks"))


def test_train_to_pipeline_end_to_end(tmp_path):
    """DOMAIN='time' plumbing: waveform-direct train() -> checkpoint meta ->
    SeparationPipeline time branch; stream equality and exact lengths."""
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
    train(d, exp, TrainLoopConfig(arch="ConvTasNet", batch_size=4,
                                  num_epochs=2, cv_every=1,
                                  on_device_features=True, make_plots=True),
          cv_data_dir=d, model_kwargs=kwargs)
    assert os.path.isfile(os.path.join(exp, "final.mdl"))
    with open(os.path.join(exp, "train_stats", "train_loss.txt")) as f:
        losses = [float(line.split()[1]) for line in f]
    assert len(losses) == 2 and all(np.isfinite(losses))
    with open(os.path.join(exp, "train_stats", "cv_loss.txt")) as f:
        assert len(f.readlines()) == 2

    pipe = SeparationPipeline(os.path.join(exp, "final.mdl"),
                              batch_size=2, length_quantum=1024)
    assert pipe.domain == "time"
    rng = np.random.default_rng(3)
    sigs = [(0.05 * rng.standard_normal(n)).astype(np.float32)
            for n in (3000, 1700, 2450)]
    outs = pipe.separate(sigs)
    for sig, tracks in zip(sigs, outs):
        assert len(tracks) == 2
        for t in tracks:
            assert len(t) == len(sig) and np.all(np.isfinite(t))

    # separate() output equals the direct arch call (same padding rules)
    from speech_separation_tpu.eval.infer import load_model
    arch, cfg, params, state = load_model(os.path.join(exp, "final.mdl"))
    L = 1024 * 3  # pipeline pads 3000 -> 3072
    wav = np.zeros((1, L), np.float32)
    wav[0, :3000] = sigs[0]
    direct = np.asarray(arch.separate(cfg, params, state, jnp.asarray(wav),
                                      jnp.asarray([3000], np.int32)))
    np.testing.assert_allclose(outs[0][0], direct[0, 0, :3000], atol=1e-5)
