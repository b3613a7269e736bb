"""Determinism and staging tests (SURVEY.md §4 rebuild test plan)."""

import os

import numpy as np
import pytest


def test_seeded_training_is_deterministic(tmp_path):
    """Two runs with the same seed produce identical loss files."""
    from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
    from speech_separation_tpu.dsp import STFTConfig
    from speech_separation_tpu.dsp.extract import extract_features
    from speech_separation_tpu.train.loop import TrainLoopConfig, train
    from speech_separation_tpu.utils.synthetic import (make_synthetic_corpus,
                                                       write_id_list)

    corpus = str(tmp_path / "corpus")
    ids = make_synthetic_corpus(corpus, 4, seed=7)
    id_lists = str(tmp_path / "id_lists")
    write_id_list(id_lists, "toy", ids)
    reg = DatasetRegistry({"toy": corpus})
    d = prepare_data_dir("toy", reg, data_root=str(tmp_path / "data"),
                         id_lists_dir=id_lists)
    extract_features(d, "train", str(tmp_path / "feats"), STFTConfig())

    losses = []
    for run in range(2):
        exp = str(tmp_path / f"exp{run}")
        train(d, exp, TrainLoopConfig(arch="uPIT", batch_size=4, num_epochs=2,
                                      time_pad_multiple=64, make_plots=False,
                                      seed=123),
              model_kwargs={"hidden": 8, "num_layers": 1})
        with open(os.path.join(exp, "train_stats", "train_loss.txt")) as f:
            losses.append(f.read())
    assert losses[0] == losses[1]


def test_stage_scp_data(tmp_path):
    from speech_separation_tpu.datadir import write_scp, stage_scp_data
    from speech_separation_tpu.datadir.stage import staged_path

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    files = []
    for i in range(3):
        p = src_dir / f"f{i}.npz"
        p.write_bytes(os.urandom(100 * (i + 1)))
        files.append(str(p))
    scp = str(tmp_path / "feats.scp")
    write_scp(scp, [(f"u{i}", f) for i, f in enumerate(files)])

    target = str(tmp_path / "staged")
    mapping = stage_scp_data(scp, target)
    for f in files:
        assert mapping[f] == staged_path(f, target)
        with open(f, "rb") as a, open(mapping[f], "rb") as b:
            assert a.read() == b.read()

    # idempotent: second run copies nothing new but returns same mapping
    mapping2 = stage_scp_data(scp, target)
    assert mapping2 == mapping
