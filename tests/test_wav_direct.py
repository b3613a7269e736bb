"""Waveform-direct training (on-device features): numerical equivalence
with the precomputed-feature path and an end-to-end training run with no
feature files at all."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
from speech_separation_tpu.dsp import STFTConfig
from speech_separation_tpu.dsp.extract import extract_features
from speech_separation_tpu.utils.synthetic import make_synthetic_corpus, write_id_list


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("wavdirect")
    corpus_dir = str(root / "corpus")
    ids = make_synthetic_corpus(corpus_dir, 6, seed=0)
    id_lists = str(root / "id_lists")
    write_id_list(id_lists, "toy", ids)
    reg = DatasetRegistry({"toy": corpus_dir})
    d = prepare_data_dir("toy", reg, data_root=str(root / "data"),
                         id_lists_dir=id_lists)
    return {"root": root, "data_dir": d, "ids": ids}


def test_audio_batch_matches_precomputed_features(corpus):
    """audio_to_feature_batch produces the same mix/source magnitudes as the
    extraction pipeline's npz files (same STFT program on both paths)."""
    from speech_separation_tpu.train.wav_data import (WavDataset,
                                                      collate_wav_batch,
                                                      audio_to_feature_batch)
    from speech_separation_tpu.train.data import FeatureDataset

    d = corpus["data_dir"]
    cfg = STFTConfig()
    extract_features(d, "train", str(corpus["root"] / "feats"), cfg)

    wav_ds = WavDataset(d, cfg)
    feat_ds = FeatureDataset(d, "train")
    idxs = [0, 1, 2]
    batch = collate_wav_batch(wav_ds, idxs, batch_size=3,
                              sample_pad_multiple=1024)
    fb = audio_to_feature_batch({k: jnp.asarray(v) for k, v in batch.items()
                                 if isinstance(v, np.ndarray)}, cfg)
    mix = np.asarray(fb["mix"])
    sources = np.asarray(fb["sources"])

    for row, i in enumerate(idxs):
        sample = feat_ds.load(i)
        T_i = sample["mix"].shape[0]
        np.testing.assert_allclose(mix[row, :T_i], sample["mix"], atol=3e-4)
        np.testing.assert_allclose(sources[row, :, :T_i], sample["sources"],
                                   atol=3e-4)
        # padded frames are exactly zero, like the feature path
        assert np.all(mix[row, T_i:] == 0.0)


def test_wav_direct_training_runs(corpus, tmp_path):
    """Full training from wav.scp only — no feats_train.scp involved."""
    from speech_separation_tpu.train.loop import TrainLoopConfig, train

    exp = str(tmp_path / "exp")
    out = train(corpus["data_dir"], exp,
                TrainLoopConfig(arch="uPIT", batch_size=3, num_epochs=2,
                                on_device_features=True, make_plots=False,
                                cv_every=1),
                cv_data_dir=corpus["data_dir"],
                model_kwargs={"hidden": 8, "num_layers": 1})
    with open(os.path.join(exp, "train_stats", "train_loss.txt")) as f:
        lines = f.read().splitlines()
    assert len(lines) == 2
    losses = [float(l.split()[1]) for l in lines]
    assert all(np.isfinite(losses))
    assert losses[1] < losses[0]
    # utt2num_samples cache written for fast re-runs
    assert os.path.isfile(os.path.join(corpus["data_dir"], "utt2num_samples"))


def test_wav_direct_training_runs_rsh(corpus, tmp_path):
    """RSH + waveform-direct: the iterative-extraction arch trains from
    wav.scp only (the combo input is built inside loss_fn from the
    device-computed mix magnitudes — models/rsh.py:_make_combo), exactly
    the configuration demo/run_demo_rsh_fullsize.py runs on the TPU."""
    from speech_separation_tpu.train.loop import TrainLoopConfig, train

    exp = str(tmp_path / "exp_rsh")
    out = train(corpus["data_dir"], exp,
                TrainLoopConfig(arch="RSH", batch_size=3, num_epochs=4,
                                on_device_features=True, make_plots=False,
                                cv_every=2),
                cv_data_dir=corpus["data_dir"],
                model_kwargs={"hidden": 8, "num_layers": 1})
    with open(os.path.join(exp, "train_stats", "train_loss.txt")) as f:
        losses = [float(l.split()[1]) for l in f.read().splitlines()]
    assert len(losses) == 4 and all(np.isfinite(losses))
    # a 8-unit model on 6 utts is noisy epoch-to-epoch (random hidden
    # init per batch); require net learning over the run, not monotonicity
    assert losses[-1] < losses[0]
    assert os.path.isfile(os.path.join(exp, "final.mdl"))
