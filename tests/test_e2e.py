"""End-to-end integration: synthetic corpus -> prepare -> extract -> train ->
masks -> reconstruct -> BSS-eval -> oracle, all on the CPU backend.
This is the CI analog of the reference's run_train.sh + run_eval.sh recipes
(SURVEY.md §7 minimum end-to-end slice)."""

import os

import numpy as np
import pytest

from speech_separation_tpu.datadir import (DatasetRegistry, prepare_data_dir,
                                           validate_data_dir)
from speech_separation_tpu.dsp import STFTConfig
from speech_separation_tpu.dsp.extract import extract_features
from speech_separation_tpu.utils.synthetic import make_synthetic_corpus, write_id_list


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic corpus + prepared data dirs + extracted features."""
    root = tmp_path_factory.mktemp("e2e")
    corpus_tr = str(root / "corpus" / "tr")
    corpus_tt = str(root / "corpus" / "tt")
    ids_tr = make_synthetic_corpus(corpus_tr, 8, seed=0, prefix="tr")
    ids_tt = make_synthetic_corpus(corpus_tt, 4, seed=1, prefix="tt")
    id_lists = str(root / "id_lists")
    write_id_list(id_lists, "toy_tr", ids_tr)
    write_id_list(id_lists, "toy_tt", ids_tt)

    reg = DatasetRegistry({"toy_tr": corpus_tr, "toy_tt": corpus_tt})
    data_root = str(root / "data")
    tr_dir = prepare_data_dir("toy_tr", reg, data_root=data_root, id_lists_dir=id_lists)
    tt_dir = prepare_data_dir("toy_tt", reg, data_root=data_root, id_lists_dir=id_lists)
    validate_data_dir(tr_dir)
    validate_data_dir(tt_dir)

    cfg = STFTConfig()
    extract_features(tr_dir, "train", str(root / "feats" / "toy_tr_train"), cfg)
    extract_features(tt_dir, "test", str(root / "feats" / "toy_tt_test"), cfg)
    validate_data_dir(tr_dir)
    validate_data_dir(tt_dir)
    return {"root": root, "tr_dir": tr_dir, "tt_dir": tt_dir}


def test_extract_outputs_match_reference_format(corpus):
    from speech_separation_tpu.datadir.scp import read_scp, read_utt2num_spk
    tr_dir = corpus["tr_dir"]
    entries = read_scp(os.path.join(tr_dir, "feats_train.scp"))
    assert len(entries) == 8
    feat = np.load(entries[0][1])
    assert set(feat.files) == {"mix", "s1", "s2"}
    assert feat["mix"].dtype == np.float32
    assert feat["mix"].shape[0] == 257  # (freq, time)
    assert feat["mix"].shape == feat["s1"].shape == feat["s2"].shape
    assert read_utt2num_spk(os.path.join(tr_dir, "utt2num_spk"))[entries[0][0]] == 2

    tt_entries = read_scp(os.path.join(corpus["tt_dir"], "feats_test.scp"))
    tfeat = np.load(tt_entries[0][1])
    assert tfeat["mix"].dtype == np.complex64  # test stores complex spectrum


def test_extract_matches_numpy_golden(corpus):
    """Device-extracted magnitude == numpy golden STFT of the same wav."""
    from speech_separation_tpu.datadir.scp import read_scp
    from speech_separation_tpu.dsp import stft_np
    from speech_separation_tpu.utils.audio import load_wav

    tr_dir = corpus["tr_dir"]
    wav_entries = dict(read_scp(os.path.join(tr_dir, "wav.scp")))
    feat_entries = read_scp(os.path.join(tr_dir, "feats_train.scp"))
    utt, feat_path = feat_entries[0]
    audio, _ = load_wav(wav_entries[utt], sr=8000)
    golden = np.abs(stft_np(audio))
    got = np.load(feat_path)["mix"]
    assert got.shape == golden.shape
    np.testing.assert_allclose(got, golden, atol=3e-4)


def test_train_masks_reconstruct_score(corpus, tmp_path):
    from speech_separation_tpu.train.loop import TrainLoopConfig, train
    from speech_separation_tpu.eval import (generate_masks, reconstruct_sources,
                                            evaluate_sources)

    root, tr_dir, tt_dir = corpus["root"], corpus["tr_dir"], corpus["tt_dir"]
    exp_dir = str(tmp_path / "exp" / "uPIT_toy")
    loop_cfg = TrainLoopConfig(arch="uPIT", batch_size=4, num_epochs=5,
                               time_pad_multiple=64, make_plots=False, seed=0)
    out = train(tr_dir, exp_dir, loop_cfg, cv_data_dir=tr_dir,
                model_kwargs={"hidden": 32, "num_layers": 1})

    # loss log format: "NNN <float>" lines, one per epoch
    with open(os.path.join(exp_dir, "train_stats", "train_loss.txt")) as f:
        lines = f.read().splitlines()
    assert len(lines) == 5
    assert lines[0].split()[0] == "001"
    losses = [float(l.split()[1]) for l in lines]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # it learns *something*

    # cv loss written at epoch 5
    with open(os.path.join(exp_dir, "train_stats", "cv_loss.txt")) as f:
        assert len(f.read().splitlines()) == 1

    # checkpoints: init + 005 + final
    assert os.path.isfile(os.path.join(exp_dir, "intermediate_models", "init.mdl"))
    assert os.path.isfile(os.path.join(exp_dir, "intermediate_models", "005.mdl"))
    assert os.path.isfile(os.path.join(exp_dir, "final.mdl"))

    # mask generation
    out_dir = os.path.join(exp_dir, "output_final", "toy_tt")
    generate_masks(os.path.join(exp_dir, "final.mdl"), tt_dir,
                   os.path.join(out_dir, "masks"),
                   model_kwargs={"hidden": 32, "num_layers": 1},
                   batch_size=4, time_pad_multiple=64)
    masks = np.load(os.path.join(out_dir, "masks", "tt0000.npz"))
    assert set(masks.files) == {"s1", "s2"}
    assert masks["s1"].shape[0] == 257
    assert np.all(masks["s1"] >= 0) and np.all(masks["s1"] <= 1)

    # reconstruction
    reconstruct_sources(tt_dir, out_dir)
    for s in ("s1", "s2"):
        assert os.path.isfile(os.path.join(out_dir, "wav", s, "tt0000.wav"))

    # scoring: files exist, metrics finite
    means = evaluate_sources(tt_dir, out_dir)
    for m in ("SDR", "SIR", "SAR", "SI-SDR", "SI-SDRi"):
        assert np.isfinite(means[m])
    for name in ("session_SDRs.txt", "source_SDRs.txt", "SDR_stats.txt"):
        assert os.path.isfile(os.path.join(out_dir, "results", name))
    with open(os.path.join(out_dir, "results", "SDR_stats.txt")) as f:
        assert f.readline().startswith("Mean:\t")


def test_oracle_eval(corpus):
    from speech_separation_tpu.eval import evaluate_oracle, merge_oracle_shards

    tt_dir = corpus["tt_dir"]
    evaluate_oracle(tt_dir, hard_mask=False)
    means = merge_oracle_shards(tt_dir, hard_mask=False, num_shards=1)
    # spectrally disjoint sources: the ideal soft mask separates nearly
    # perfectly, so the oracle SDR must be high
    assert means["SDR"] > 8.0
    evaluate_oracle(tt_dir, hard_mask=True)
    means_hard = merge_oracle_shards(tt_dir, hard_mask=True, num_shards=1)
    assert means_hard["SDR"] > 5.0

    # device scoring path: same result files within the two-float scorer's
    # envelope (utterances the trust gate rejects fall back to host f64,
    # making them exactly equal)
    host_lines = open(os.path.join(
        tt_dir, "oracle_soft_mask_eval", "source_SDRs.txt")).readlines()
    evaluate_oracle(tt_dir, hard_mask=False, device=True)
    means_dev = merge_oracle_shards(tt_dir, hard_mask=False, num_shards=1)
    dev_lines = open(os.path.join(
        tt_dir, "oracle_soft_mask_eval", "source_SDRs.txt")).readlines()
    assert len(dev_lines) == len(host_lines)
    for h, d in zip(sorted(host_lines), sorted(dev_lines)):
        hk, *hv = h.split()
        dk, *dv = d.split()
        assert hk == dk
        np.testing.assert_allclose([float(x) for x in dv],
                                   [float(x) for x in hv], atol=0.1)
    assert abs(means_dev["SDR"] - means["SDR"]) < 0.1


def test_resume_continues_training(corpus, tmp_path):
    """start_epoch resume: losses replayed, training continues to the full
    epoch count, loss file has no duplicate epochs."""
    from speech_separation_tpu.train.loop import TrainLoopConfig, train

    tr_dir = corpus["tr_dir"]
    exp_dir = str(tmp_path / "exp" / "resume")
    base = dict(arch="uPIT", batch_size=4, time_pad_multiple=64,
                make_plots=False, seed=0)
    train(tr_dir, exp_dir, TrainLoopConfig(num_epochs=5, **base),
          model_kwargs={"hidden": 16, "num_layers": 1})
    train(tr_dir, exp_dir, TrainLoopConfig(num_epochs=7, start_epoch=5, **base),
          model_kwargs={"hidden": 16, "num_layers": 1})
    with open(os.path.join(exp_dir, "train_stats", "train_loss.txt")) as f:
        epochs = [int(l.split()[0]) for l in f.read().splitlines()]
    assert epochs == [1, 2, 3, 4, 5, 6, 7]


def test_checkpoint_embeds_model_kwargs(corpus, tmp_path):
    """Eval reconstructs the model from checkpoint metadata alone — no
    --model-config needed (usability improvement over the reference's
    conf-snapshot requirement)."""
    from speech_separation_tpu.train.loop import TrainLoopConfig, train
    from speech_separation_tpu.eval.infer import load_model

    exp_dir = str(tmp_path / "exp" / "meta")
    train(corpus["tr_dir"], exp_dir,
          TrainLoopConfig(arch="uPIT", batch_size=4, num_epochs=1,
                          time_pad_multiple=64, make_plots=False),
          model_kwargs={"hidden": 16, "num_layers": 1})
    arch, cfg, params, state = load_model(os.path.join(exp_dir, "final.mdl"))
    assert arch.NAME == "uPIT"
    assert cfg.hidden == 16 and cfg.num_layers == 1
    # explicit kwargs still win
    _, cfg2, _, _ = load_model(os.path.join(exp_dir, "final.mdl"),
                               model_kwargs={"num_spk": "2"})
    assert cfg2.hidden == 16


def test_evaluate_sources_device_matches_host(corpus, tmp_path):
    """evaluate_sources(device=True) — the _score_device slab path with
    length-sorted slabs, prefetch threads, and int16 transport — must
    agree with the host f64 scorer (same rows, metrics within the
    two-float envelope; trust-gate fallbacks are exactly equal)."""
    from speech_separation_tpu.datadir.scp import read_scp
    from speech_separation_tpu.eval import evaluate_sources
    from speech_separation_tpu.utils.audio import load_wav, write_wav_int16

    tt_dir = corpus["tt_dir"]
    entries = read_scp(os.path.join(tt_dir, "wav.scp"))
    # fake estimates: noisy remixes of the oracle sources (non-trivial
    # SIR/SAR, not bit-trivial permutations)
    rng = np.random.default_rng(3)
    exp_dir = str(tmp_path / "exp")
    for utt, mix_path in entries:
        srcs = [load_wav(mix_path.replace("/mix/", f"/s{s}/"))[0]
                for s in (1, 2)]
        L = min(len(s) for s in srcs)
        for s in (0, 1):
            est = (0.9 * srcs[s][:L] + 0.1 * srcs[1 - s][:L]
                   + 0.01 * rng.standard_normal(L).astype(np.float32))
            p = os.path.join(exp_dir, "wav", f"s{s + 1}", utt + ".wav")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            write_wav_int16(p, 8000, est)

    host = evaluate_sources(tt_dir, exp_dir)
    host_rows = open(os.path.join(exp_dir, "results",
                                  "source_SDRs.txt")).readlines()
    dev = evaluate_sources(tt_dir, exp_dir, device=True)
    dev_rows = open(os.path.join(exp_dir, "results",
                                 "source_SDRs.txt")).readlines()

    # identical utterance order (wav.scp order restored after slab sort)
    assert [r.split()[0] for r in dev_rows] == [r.split()[0] for r in host_rows]
    for m in ("SDR", "SIR", "SAR"):
        assert abs(dev[m] - host[m]) < 0.1, (m, dev[m], host[m])
    # SI-SDR is host-computed in both paths: same permutation -> equal
    assert abs(dev["SI-SDR"] - host["SI-SDR"]) < 1e-6
