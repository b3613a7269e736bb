"""RSH pipeline: train + mask inference through the full driver path,
including speaker-count grouping and multi-pass mask npz output."""

import os

import numpy as np
import pytest

from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
from speech_separation_tpu.dsp import STFTConfig
from speech_separation_tpu.dsp.extract import extract_features
from speech_separation_tpu.utils.synthetic import make_synthetic_corpus, write_id_list


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("rsh")
    corpus_tr = str(root / "corpus" / "tr")
    corpus_tt = str(root / "corpus" / "tt")
    ids_tr = make_synthetic_corpus(corpus_tr, 6, seed=3, prefix="tr")
    ids_tt = make_synthetic_corpus(corpus_tt, 3, seed=4, prefix="tt")
    id_lists = str(root / "id_lists")
    write_id_list(id_lists, "toy_tr", ids_tr)
    write_id_list(id_lists, "toy_tt", ids_tt)
    reg = DatasetRegistry({"toy_tr": corpus_tr, "toy_tt": corpus_tt})
    data_root = str(root / "data")
    tr = prepare_data_dir("toy_tr", reg, data_root=data_root, id_lists_dir=id_lists)
    tt = prepare_data_dir("toy_tt", reg, data_root=data_root, id_lists_dir=id_lists)
    cfg = STFTConfig()
    extract_features(tr, "train", str(root / "feats" / "tr"), cfg)
    extract_features(tt, "test", str(root / "feats" / "tt"), cfg)
    return {"tr": tr, "tt": tt}


def test_rsh_train_and_infer(corpus, tmp_path):
    from speech_separation_tpu.train.loop import TrainLoopConfig, train
    from speech_separation_tpu.eval import generate_masks

    exp_dir = str(tmp_path / "exp" / "RSH_toy")
    loop_cfg = TrainLoopConfig(arch="RSH", batch_size=3, num_epochs=3,
                               time_pad_multiple=64, make_plots=False)
    train(corpus["tr"], exp_dir, loop_cfg,
          model_kwargs={"hidden": 16, "num_layers": 1})

    with open(os.path.join(exp_dir, "train_stats", "train_loss.txt")) as f:
        lines = f.read().splitlines()
    assert len(lines) == 3
    losses = [float(l.split()[1]) for l in lines]
    assert all(np.isfinite(losses))

    out_dir = str(tmp_path / "masks")
    generate_masks(os.path.join(exp_dir, "final.mdl"), corpus["tt"], out_dir,
                   model_kwargs={"hidden": 16, "num_layers": 1},
                   batch_size=3, time_pad_multiple=64)
    masks = np.load(os.path.join(out_dir, "tt0000.npz"))
    # RSH saves one mask per extraction pass: s1, s2 for 2-speaker utts
    assert set(masks.files) == {"s1", "s2"}
    assert masks["s1"].shape[0] == 257
    assert np.all(masks["s1"] >= 0) and np.all(masks["s1"] <= 1)
    # the two passes must differ (the residual update steers pass 2)
    assert float(np.max(np.abs(masks["s1"] - masks["s2"]))) > 1e-3
