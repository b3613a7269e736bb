"""Hang watchdog (train/watchdog.py): heartbeat wiring + supervisor
kill/restart semantics. The supervisor is tested generically with stub
children (spawn re-imports this module by name, so stubs live at module
top level), then composed with the real train loop end-to-end."""

import os
import time

import pytest

from speech_separation_tpu.train.watchdog import (
    HangRecoveryExhausted, _supervise, train_supervised)


# ------------------------------------------------------------ stub children

def _stub_ok(hb_path, flag_path):
    for _ in range(3):
        os.utime(hb_path, None)
        time.sleep(0.05)


def _stub_hang_once(hb_path, flag_path):
    """First attempt: beat once, then wedge forever (the observed tunnel
    failure: dispatch blocks with no CPU and no exit). Second attempt
    (marker file exists): finish cleanly."""
    if os.path.exists(flag_path):
        os.utime(hb_path, None)
        return
    open(flag_path, "w").close()
    os.utime(hb_path, None)
    time.sleep(3600)


def _stub_crash_once(hb_path, flag_path):
    if os.path.exists(flag_path):
        os.utime(hb_path, None)
        return
    open(flag_path, "w").close()
    raise SystemExit(3)


def _stub_never_beats(hb_path, flag_path):
    time.sleep(3600)


def _args(tmp_path):
    hb = str(tmp_path / "hb")
    flag = str(tmp_path / "flag")
    return hb, (lambda attempt: (hb, flag))


# ------------------------------------------------------------- _supervise

def test_supervise_clean_child_no_restarts(tmp_path):
    hb, args_fn = _args(tmp_path)
    assert _supervise(_stub_ok, args_fn, hb, hang_timeout_s=30,
                      first_timeout_s=30, max_restarts=0, poll_s=0.2,
                      log=lambda *a: None) == 0


def test_supervise_kills_hung_child_and_restarts(tmp_path):
    """A child that beat once and then wedged is killed once its heartbeat
    is stale past hang_timeout_s, and the retry completes."""
    hb, args_fn = _args(tmp_path)
    msgs = []
    restarts = _supervise(_stub_hang_once, args_fn, hb, hang_timeout_s=1.0,
                          first_timeout_s=30, max_restarts=1, poll_s=0.2,
                          log=msgs.append)
    assert restarts == 1
    assert any("killing wedged child" in m for m in msgs)


def test_supervise_first_timeout_covers_slow_start(tmp_path):
    """Before the first beat the FIRST timeout governs (compiles may block
    for minutes): a never-beating child is killed after first_timeout_s,
    and with max_restarts exhausted the supervisor raises."""
    hb, args_fn = _args(tmp_path)
    t0 = time.time()
    with pytest.raises(HangRecoveryExhausted):
        _supervise(_stub_never_beats, args_fn, hb, hang_timeout_s=3600,
                   first_timeout_s=1.0, max_restarts=0, poll_s=0.2,
                   log=lambda *a: None)
    # killed on the first-beat allowance, not the (huge) steady-state one
    assert time.time() - t0 < 60


def test_supervise_restarts_on_crash_too(tmp_path):
    hb, args_fn = _args(tmp_path)
    assert _supervise(_stub_crash_once, args_fn, hb, hang_timeout_s=30,
                      first_timeout_s=30, max_restarts=1, poll_s=0.2,
                      log=lambda *a: None) == 1


# ------------------------------------------------- real train composition

@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
    from speech_separation_tpu.dsp import STFTConfig
    from speech_separation_tpu.dsp.extract import extract_features
    from speech_separation_tpu.utils.synthetic import (make_synthetic_corpus,
                                                       write_id_list)
    root = tmp_path_factory.mktemp("wd")
    ids = make_synthetic_corpus(str(root / "corpus"), 4, seed=0)
    write_id_list(str(root / "id_lists"), "toy", ids)
    reg = DatasetRegistry({"toy": str(root / "corpus")})
    d = prepare_data_dir("toy", reg, data_root=str(root / "data"),
                         id_lists_dir=str(root / "id_lists"))
    extract_features(d, "train", str(root / "feats"), STFTConfig())
    return d


def test_train_loop_beats_heartbeat(tiny_data, tmp_path):
    """The loop touches heartbeat_file after steps and checkpoints."""
    from speech_separation_tpu.train.loop import TrainLoopConfig, train
    hb = str(tmp_path / "hb")
    open(hb, "w").close()
    t0 = os.path.getmtime(hb)
    time.sleep(0.05)
    train(tiny_data, str(tmp_path / "exp"),
          TrainLoopConfig(arch="uPIT", batch_size=4, num_epochs=1,
                          time_pad_multiple=64, make_plots=False,
                          heartbeat_file=hb),
          model_kwargs={"hidden": 8, "num_layers": 1})
    assert os.path.getmtime(hb) > t0


def test_train_supervised_end_to_end(tiny_data, tmp_path):
    """Supervised training (spawned child, generous timeouts) produces the
    same on-disk artifacts as the in-process driver."""
    from speech_separation_tpu.train.loop import TrainLoopConfig
    exp = str(tmp_path / "exp")
    out = train_supervised(
        tiny_data, exp,
        TrainLoopConfig(arch="uPIT", batch_size=4, num_epochs=2,
                        checkpoint_every=1, time_pad_multiple=64,
                        make_plots=False),
        hang_timeout_s=600, first_timeout_s=600, max_restarts=0,
        model_kwargs={"hidden": 8, "num_layers": 1})
    assert out["restarts"] == 0
    assert out["utts_per_sec"] > 0
    assert os.path.isfile(os.path.join(exp, "final.mdl"))
    with open(os.path.join(exp, "train_stats", "train_loss.txt")) as f:
        assert len(f.read().splitlines()) == 2


def test_cli_exposes_watchdog_flags():
    from speech_separation_tpu.cli.main import build_parser
    args = build_parser().parse_args(
        ["train", "--hang-watchdog-sec", "300",
         "--hang-first-timeout-sec", "900", "uPIT", "data", "exp"])
    assert args.hang_watchdog_sec == 300.0
    assert args.hang_first_timeout_sec == 900.0
