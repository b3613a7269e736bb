"""Operational guards: exp-dir locking and auto-restart from checkpoints."""

import os

import numpy as np
import pytest

from speech_separation_tpu.train.loop import (
    TrainLoopConfig, train, train_with_restarts, latest_intermediate_epoch,
    ExpDirLocked, _ExpLock)


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
    from speech_separation_tpu.dsp import STFTConfig
    from speech_separation_tpu.dsp.extract import extract_features
    from speech_separation_tpu.utils.synthetic import (make_synthetic_corpus,
                                                       write_id_list)
    root = tmp_path_factory.mktemp("rec")
    ids = make_synthetic_corpus(str(root / "corpus"), 4, seed=0)
    write_id_list(str(root / "id_lists"), "toy", ids)
    reg = DatasetRegistry({"toy": str(root / "corpus")})
    d = prepare_data_dir("toy", reg, data_root=str(root / "data"),
                         id_lists_dir=str(root / "id_lists"))
    extract_features(d, "train", str(root / "feats"), STFTConfig())
    return d


def test_exp_lock_blocks_live_owner(tmp_path):
    exp = str(tmp_path / "exp")
    with _ExpLock(exp):
        with pytest.raises(ExpDirLocked):
            with _ExpLock(exp):
                pass
    # released: can lock again
    with _ExpLock(exp):
        pass


def test_stale_lock_is_replaced(tmp_path):
    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    with open(os.path.join(exp, ".train.lock"), "w") as f:
        f.write("999999999")  # dead pid
    with _ExpLock(exp):
        pass


def test_auto_restart_resumes_from_checkpoint(tiny_data, tmp_path, monkeypatch):
    """Crash mid-training after the epoch-2 checkpoint -> auto restart must
    resume at epoch 2 and complete, with a contiguous loss log."""
    import speech_separation_tpu.train.loop as loop_mod

    exp = str(tmp_path / "exp")
    base = TrainLoopConfig(arch="uPIT", batch_size=4, num_epochs=4,
                           checkpoint_every=2, cv_every=100,
                           time_pad_multiple=64, make_plots=False)

    real = loop_mod._train_locked
    calls = {"n": 0}

    def flaky(*args, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            # run 3 epochs (checkpoint lands at 2), then die
            cfg = args[2]
            import dataclasses
            crashing = dataclasses.replace(cfg, num_epochs=3)
            real(args[0], args[1], crashing, *args[3:], **kwargs)
            raise RuntimeError("injected transient device failure")
        return real(*args, **kwargs)

    monkeypatch.setattr(loop_mod, "_train_locked", flaky)
    train_with_restarts(tiny_data, exp, base, max_restarts=1,
                        model_kwargs={"hidden": 8, "num_layers": 1})
    assert calls["n"] == 2
    assert latest_intermediate_epoch(exp) == 4
    assert os.path.isfile(os.path.join(exp, "final.mdl"))
    with open(os.path.join(exp, "train_stats", "train_loss.txt")) as f:
        epochs = [int(l.split()[0]) for l in f.read().splitlines()]
    assert epochs == [1, 2, 3, 4]


def test_restart_gives_up_after_limit(tiny_data, tmp_path, monkeypatch):
    import speech_separation_tpu.train.loop as loop_mod

    def always_crash(*a, **k):
        raise RuntimeError("boom")

    monkeypatch.setattr(loop_mod, "_train_locked", always_crash)
    with pytest.raises(RuntimeError, match="boom"):
        train_with_restarts(tiny_data, str(tmp_path / "exp"),
                            TrainLoopConfig(num_epochs=1, make_plots=False),
                            max_restarts=2)


def test_reference_resume_drops_optimizer_state(tiny_data, tmp_path):
    """--reference-resume reproduces the reference's resume semantics
    (Adam moments reset — train_qsub.py:104-110): training still completes
    and the loss log stays contiguous."""
    exp = str(tmp_path / "exp")
    base = dict(arch="uPIT", batch_size=4, time_pad_multiple=64,
                checkpoint_every=2, cv_every=100, make_plots=False)
    train(tiny_data, exp, TrainLoopConfig(num_epochs=2, **base),
          model_kwargs={"hidden": 8, "num_layers": 1})
    train(tiny_data, exp,
          TrainLoopConfig(num_epochs=4, start_epoch=2, reference_resume=True,
                          **base),
          model_kwargs={"hidden": 8, "num_layers": 1})
    with open(os.path.join(exp, "train_stats", "train_loss.txt")) as f:
        epochs = [int(l.split()[0]) for l in f.read().splitlines()]
    assert epochs == [1, 2, 3, 4]


def _lock_contender(exp_dir, barrier, results, idx):
    import time
    from speech_separation_tpu.train.loop import _ExpLock, ExpDirLocked
    barrier.wait()
    try:
        with _ExpLock(exp_dir):
            results[idx] = 1
            time.sleep(4)
    except ExpDirLocked:
        results[idx] = 0


def test_exp_lock_stale_steal_is_exclusive(tmp_path):
    """Round-3 review finding: with a stale lock present, N simultaneous
    trainers must resolve to EXACTLY one owner (the old remove-then-create
    recovery let two waiters both acquire). Six spawned processes race
    through the stale-steal path behind a barrier; the winner holds the
    lock longer than the losers' whole attempt."""
    import multiprocessing as mp
    import os

    exp_dir = str(tmp_path / "exp")
    os.makedirs(exp_dir)
    with open(os.path.join(exp_dir, ".train.lock"), "w") as f:
        f.write("notapid")  # unparsable => stale

    n = 6
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(n)
    results = ctx.Array("i", [-1] * n)
    procs = [ctx.Process(target=_lock_contender,
                         args=(exp_dir, barrier, results, i))
             for i in range(n)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    assert sum(results[:]) == 1, list(results[:])
    # lock released after the winner's exit
    assert not os.path.exists(os.path.join(exp_dir, ".train.lock"))


def test_unreadable_lock_raises_instead_of_spinning(tmp_path):
    """A lock file that exists but cannot be READ (cross-uid 0600, EIO,
    stale NFS handle) must raise ExpDirLocked, not busy-spin forever.
    Simulated with a directory named like the lock: open() raises
    IsADirectoryError (an OSError), and link() fails with EEXIST."""
    exp = str(tmp_path / "exp")
    os.makedirs(os.path.join(exp, ".train.lock"))
    with pytest.raises(ExpDirLocked, match="cannot read"):
        with _ExpLock(exp):
            pass
