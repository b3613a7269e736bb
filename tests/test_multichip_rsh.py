"""RSH under the multi-device mesh (VERDICT round-3 weak #3): the arch
whose data-dependent paths — speaker-count sub-batching, cross-pass hidden
carryover, greedy +Inf source exclusion, and `--reference-batching`
gradient accumulation — are the most likely to misbehave under sharding.
Both training modes run the FULL train() loop on the 8-virtual-device CPU
mesh with the loss trajectory pinned against single-device execution.
Reference semantics: /root/reference/archs/RSH.py:197-259 (per-count
passes + greedy assignment), steps/train_qsub.py:116-122 (one optimizer
step per mixed batch)."""

import os

import numpy as np
import pytest

import jax

from speech_separation_tpu.dsp import STFTConfig
from speech_separation_tpu.dsp.extract import extract_features
from speech_separation_tpu.train.loop import TrainLoopConfig, train
from speech_separation_tpu.utils.synthetic import make_synthetic_corpus_var


@pytest.fixture(scope="module")
def feature_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("mcrsh")
    cfg = STFTConfig()
    dirs = {}
    # 2- and 3-speaker mixtures interleaved: every epoch produces both a
    # 2-spk and a 3-spk sub-batch (the per-count jit programs + the greedy
    # assignment over different S under the mesh)
    for split, n, seed in (("tr", 12, 0), ("cv", 6, 1)):
        corpus = str(root / "corpus" / split)
        data_dir = str(root / "data" / split)
        os.makedirs(data_dir, exist_ok=True)
        utts = make_synthetic_corpus_var(corpus, n, seed=seed, prefix=split,
                                         counts=(2, 3))
        with open(os.path.join(data_dir, "wav.scp"), "w") as f:
            for u in utts:
                f.write(f"{u} {corpus}/mix/{u}.wav\n")
        extract_features(data_dir, "train", str(root / "feats" / split), cfg)
        dirs[split] = data_dir
    return root, dirs


def _read_losses(path):
    with open(path) as f:
        return [float(line.split()[1]) for line in f if line.strip()]


def _run(root, dirs, tag, use_mesh, reference_batching):
    exp_dir = str(root / f"exp_{tag}")
    cfg = TrainLoopConfig(arch="RSH", batch_size=6, num_epochs=4,
                          cv_every=3, checkpoint_every=10, seed=0,
                          time_pad_multiple=32, make_plots=False,
                          reference_batching=reference_batching)
    # zero_init_hidden: the random per-batch hidden draw is shape-dependent
    # and shard_batch row-pads 6 -> 8 on the mesh, so the random path can't
    # be bit-compared across paddings by construction
    out = train(dirs["tr"], exp_dir, cfg, cv_data_dir=dirs["cv"],
                model_kwargs={"hidden": "8", "num_layers": "1",
                              "zero_init_hidden": "true"},
                use_mesh=use_mesh)
    stats = os.path.join(exp_dir, "train_stats")
    return (out, _read_losses(os.path.join(stats, "train_loss.txt")),
            _read_losses(os.path.join(stats, "cv_loss.txt")))


def test_rsh_grouped_training_mesh_matches_single(feature_dirs):
    """Default RSH batching (host groups utterances by speaker count, one
    static S per device batch) sharded over 'data' == single device."""
    root, dirs = feature_dirs
    assert len(jax.devices()) == 8

    _, mesh_tr, mesh_cv = _run(root, dirs, "grp_mesh", True, False)
    _, single_tr, single_cv = _run(root, dirs, "grp_single", False, False)

    assert len(mesh_tr) == 4 and len(mesh_cv) == 1
    np.testing.assert_allclose(mesh_tr, single_tr, rtol=2e-4)
    np.testing.assert_allclose(mesh_cv, single_cv, rtol=2e-4)
    assert mesh_tr[-1] < mesh_tr[0]


def test_rsh_reference_batching_mesh_matches_single(feature_dirs):
    """--reference-batching (mixed batches split into per-count sub-batches,
    grads ACCUMULATED across sub-batches, one clip+Adam apply per mixed
    batch, BN state threaded through sub-batches in order) with every
    sub-batch DP-sharded == single device."""
    root, dirs = feature_dirs

    _, mesh_tr, mesh_cv = _run(root, dirs, "ref_mesh", True, True)
    _, single_tr, single_cv = _run(root, dirs, "ref_single", False, True)

    assert len(mesh_tr) == 4 and len(mesh_cv) == 1
    np.testing.assert_allclose(mesh_tr, single_tr, rtol=2e-4)
    np.testing.assert_allclose(mesh_cv, single_cv, rtol=2e-4)
    assert mesh_tr[-1] < mesh_tr[0]

    # and the two batching modes see the same data: trajectories differ
    # (different grouping => different batch statistics) but both train
    _, grp_tr, _ = _run(root, dirs, "grp_mesh2", True, False)
    assert grp_tr[-1] < grp_tr[0]
