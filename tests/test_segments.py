"""Segments-file support: per-segment feature extraction and oracle eval.

The reference supports segments in extraction (extract_feats.py:51-58) but
its oracle segments branch is broken (`rage` typo :95, `oracle_mask`
NameError :115 — SURVEY.md §7.7). This framework implements both correctly;
these tests pin that behavior.
"""

import os

import numpy as np
import pytest

from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
from speech_separation_tpu.datadir.scp import read_scp
from speech_separation_tpu.dsp import STFTConfig, stft_np
from speech_separation_tpu.dsp.extract import extract_features
from speech_separation_tpu.utils.audio import load_wav
from speech_separation_tpu.utils.synthetic import make_synthetic_corpus, write_id_list


@pytest.fixture(scope="module")
def seg_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("segs")
    corpus = str(root / "corpus")
    ids = make_synthetic_corpus(corpus, 3, seed=0, min_sec=1.2, max_sec=1.5)
    id_lists = str(root / "id_lists")
    write_id_list(id_lists, "toy", ids)
    reg = DatasetRegistry({"toy": corpus})
    d = prepare_data_dir("toy", reg, data_root=str(root / "data"),
                         id_lists_dir=id_lists)
    # two segments per recording
    with open(os.path.join(d, "segments"), "w") as f:
        for utt in ids:
            f.write(f"{utt}-seg1 {utt} 0.00 0.50\n")
            f.write(f"{utt}-seg2 {utt} 0.50 1.00\n")
    return {"root": root, "data_dir": d, "ids": ids, "corpus": corpus}


def test_extract_with_segments(seg_data):
    d = seg_data["data_dir"]
    feat_dir = str(seg_data["root"] / "feats")
    extract_features(d, "train", feat_dir, STFTConfig())

    entries = read_scp(os.path.join(d, "feats_train.scp"))
    keys = [k for k, _ in entries]
    assert keys == [f"{u}-seg{i}" for u in seg_data["ids"] for i in (1, 2)]

    # golden check: segment 2 features == STFT of samples [0.5s, 1.0s)
    utt = seg_data["ids"][0]
    feat = np.load(dict(entries)[f"{utt}-seg2"])
    audio, _ = load_wav(os.path.join(seg_data["corpus"], "mix", utt + ".wav"),
                        sr=8000, offset=0.5, duration=0.5)
    golden = np.abs(stft_np(audio))
    np.testing.assert_allclose(feat["mix"], golden, atol=3e-4)
    assert set(feat.files) == {"mix", "s1", "s2"}


def test_oracle_with_segments(seg_data):
    from speech_separation_tpu.eval import evaluate_oracle, merge_oracle_shards

    d = seg_data["data_dir"]
    evaluate_oracle(d, hard_mask=False)
    means = merge_oracle_shards(d, hard_mask=False, num_shards=1)
    assert np.isfinite(means["SDR"])
    assert means["SDR"] > 5.0  # disjoint-band sources separate well
    with open(os.path.join(d, "oracle_soft_mask_eval", "session_SDRs.txt")) as f:
        lines = f.read().splitlines()
    # one line per segment, sorted by the merge
    assert len(lines) == 6
    assert all("-seg" in line.split()[0] for line in lines)


def test_variable_count_corpus_extraction(tmp_path):
    """make_synthetic_corpus_var + the extractor's /mix/ -> /*/ count
    discovery: utterance i has counts[i % 3] sources and utt2num_spk
    records it (reference extract_feats.py:65-68 rule)."""
    from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
    from speech_separation_tpu.datadir.scp import read_utt2num_spk
    from speech_separation_tpu.dsp import STFTConfig
    from speech_separation_tpu.dsp.extract import extract_features
    from speech_separation_tpu.utils.synthetic import (
        make_synthetic_corpus_var, write_id_list)

    root = str(tmp_path / "corpus")
    ids = make_synthetic_corpus_var(root, 6, seed=0, prefix="v")
    write_id_list(str(tmp_path / "id_lists"), "var", ids)
    d = prepare_data_dir("var", DatasetRegistry({"var": root}),
                         data_root=str(tmp_path / "data"),
                         id_lists_dir=str(tmp_path / "id_lists"))
    extract_features(d, "train", str(tmp_path / "feats"), STFTConfig(),
                     compress=False)
    n_spk = read_utt2num_spk(os.path.join(d, "utt2num_spk"))
    assert [n_spk[u] for u in ids] == [1, 2, 3, 1, 2, 3]
    # feature files carry the matching source keys
    import numpy as np
    for u, c in zip(ids, 2 * (1, 2, 3)):
        f = np.load(os.path.join(str(tmp_path / "feats"), u + ".npz"))
        srcs = sorted(k for k in f.files if k != "mix")
        assert srcs == [f"s{i+1}" for i in range(c)]
