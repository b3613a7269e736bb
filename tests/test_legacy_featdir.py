"""Compatibility with reference-produced feature dirs: npz files written
the way steps/extract_feats.py writes them (float32 (freq,time) magnitudes /
complex64 mix), with NO utt2num_frames sidecar — the pipeline must fall
back to the Python loader and still train/infer."""

import os

import numpy as np
import pytest

from speech_separation_tpu.datadir.scp import write_scp, write_utt2num_spk
from speech_separation_tpu.dsp import stft_np


def _make_reference_style_dir(root, n=4, seed=0):
    """Emulate the reference extractor's outputs byte-for-byte in kind:
    compressed npz, keys mix/s1/s2, (freq, time) layout, no sidecars
    beyond utt2num_spk."""
    rng = np.random.default_rng(seed)
    data_dir = os.path.join(root, "data")
    feat_dir = os.path.join(root, "feats")
    os.makedirs(feat_dir, exist_ok=True)
    train_entries, test_entries, spk = [], [], []
    for i in range(n):
        utt = f"legacy{i:02d}"
        L = int(rng.integers(4000, 9000))
        s1 = rng.standard_normal(L).astype(np.float32) * 0.1
        s2 = rng.standard_normal(L).astype(np.float32) * 0.1
        mix = s1 + s2
        tr_path = os.path.join(feat_dir, utt + ".npz")
        np.savez_compressed(tr_path, mix=np.abs(stft_np(mix)),
                            s1=np.abs(stft_np(s1)), s2=np.abs(stft_np(s2)))
        tt_path = os.path.join(feat_dir, utt + "_tt.npz")
        np.savez_compressed(tt_path, mix=stft_np(mix))
        train_entries.append((utt, tr_path))
        test_entries.append((utt, tt_path))
        spk.append((utt, 2))
    write_scp(os.path.join(data_dir, "feats_train.scp"), train_entries)
    write_scp(os.path.join(data_dir, "feats_test.scp"), test_entries)
    write_utt2num_spk(os.path.join(data_dir, "utt2num_spk"), dict(spk))
    return data_dir


def test_train_on_legacy_feature_dir(tmp_path):
    from speech_separation_tpu.train.loop import TrainLoopConfig, train
    from speech_separation_tpu.train.data import FeatureDataset

    data_dir = _make_reference_style_dir(str(tmp_path))
    ds = FeatureDataset(data_dir, "train")
    assert ds.num_frames is None  # no sidecar -> Python loader fallback

    exp = str(tmp_path / "exp")
    train(data_dir, exp,
          TrainLoopConfig(arch="uPIT", batch_size=4, num_epochs=1,
                          time_pad_multiple=64, make_plots=False),
          model_kwargs={"hidden": 8, "num_layers": 1})
    assert os.path.isfile(os.path.join(exp, "final.mdl"))


def test_infer_on_legacy_feature_dir(tmp_path):
    from speech_separation_tpu.train.loop import TrainLoopConfig, train
    from speech_separation_tpu.eval import generate_masks

    data_dir = _make_reference_style_dir(str(tmp_path), seed=1)
    exp = str(tmp_path / "exp")
    train(data_dir, exp,
          TrainLoopConfig(arch="uPIT", batch_size=4, num_epochs=1,
                          time_pad_multiple=64, make_plots=False),
          model_kwargs={"hidden": 8, "num_layers": 1})
    out_dir = str(tmp_path / "masks")
    generate_masks(os.path.join(exp, "final.mdl"), data_dir, out_dir,
                   batch_size=4, time_pad_multiple=64)
    masks = np.load(os.path.join(out_dir, "legacy00.npz"))
    assert set(masks.files) == {"s1", "s2"}
