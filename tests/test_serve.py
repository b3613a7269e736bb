"""Resident separation server (eval/serve.py): protocol, coalescing,
output equality with the direct pipeline, error isolation, shutdown.

The reference has no serving story (every eval is a cold batch job,
run_eval.sh); the server is a beyond-reference surface, so its contract is
pinned here: a request served through the socket must produce byte-identical
wavs to a direct ``SeparationPipeline.separate`` call on the same model.
"""

import json
import os
import socket
import threading
import time

import numpy as np
import pytest

import jax

from speech_separation_tpu.eval.pipeline import SeparationPipeline
from speech_separation_tpu.eval.serve import SeparationServer, request
from speech_separation_tpu.models import upit
from speech_separation_tpu.train.checkpoint import save_checkpoint
from speech_separation_tpu.utils.audio import load_wav, write_wav_int16

SR = 8000
KW = {"hidden": "16", "num_layers": "1", "zero_init_hidden": "1"}


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """A tiny model served on a temp socket + three input wavs on disk."""
    root = tmp_path_factory.mktemp("serve")
    cfg = upit.Config(feat_dim=257, num_spk=2, hidden=16, num_layers=1,
                      zero_init_hidden=True)
    params, state = upit.init(jax.random.PRNGKey(0), cfg)
    model = str(root / "model.mdl")
    save_checkpoint(model, params=params, state=state, epoch=0,
                    meta={"arch": "uPIT"})

    rng = np.random.default_rng(7)
    wavs = []
    for k, n in enumerate((7000, 5000, 3210)):
        path = str(root / f"in{k}.wav")
        write_wav_int16(path, SR, rng.standard_normal(n).astype(np.float32)
                        * 0.05)
        wavs.append(path)

    pipe = SeparationPipeline(model, model_kwargs=KW, batch_size=4,
                              length_quantum=4096)
    sock = str(root / "sep.sock")
    server = SeparationServer(pipe, sock, coalesce=8)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    deadline = time.monotonic() + 30
    while not os.path.exists(sock):
        assert time.monotonic() < deadline, "server never bound its socket"
        time.sleep(0.02)
    yield {"model": model, "socket": sock, "wavs": wavs, "root": root,
           "server": server, "thread": t}
    server.shutdown()
    t.join(timeout=10)


def test_ping(served):
    r = request(served["socket"], {"cmd": "ping"})
    assert r["ok"] and r["served"] >= 0 and "uptime_s" in r


def test_separate_request_matches_direct_pipeline(served):
    out_dir = str(served["root"] / "out_req")
    r = request(served["socket"],
                {"wavs": served["wavs"], "out_dir": out_dir})
    assert r["ok"], r
    assert set(r["outputs"]) == set(served["wavs"])

    # direct path: a fresh pipeline on the same checkpoint, outputs written
    # through the same int16 writer, must be byte-identical
    pipe = SeparationPipeline(served["model"], model_kwargs=KW, batch_size=4,
                              length_quantum=4096)
    sigs = [load_wav(w, sr=SR)[0] for w in served["wavs"]]
    direct = pipe.separate(sigs)
    for wav, ests in zip(served["wavs"], direct):
        paths = r["outputs"][wav]
        assert len(paths) == 2
        for path, est in zip(paths, ests):
            ref_path = str(served["root"] / "ref.wav")
            write_wav_int16(ref_path, SR, est)
            with open(path, "rb") as a, open(ref_path, "rb") as b:
                assert a.read() == b.read()


def test_concurrent_requests_all_served(served):
    """Two clients sending one file each: both must complete (the worker
    coalesces whatever is queued into one device dispatch)."""
    replies = {}

    def client(k, wav):
        out = str(served["root"] / f"out_conc{k}")
        replies[k] = request(served["socket"], {"wavs": [wav],
                                                "out_dir": out})

    ts = [threading.Thread(target=client, args=(k, w))
          for k, w in enumerate(served["wavs"][:2])]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert replies[0]["ok"] and replies[1]["ok"]
    for k in (0, 1):
        for paths in replies[k]["outputs"].values():
            assert all(os.path.exists(p) for p in paths)


def test_bad_requests_rejected_without_killing_server(served):
    r = request(served["socket"], {"wavs": ["/nonexistent/x.wav"],
                                   "out_dir": str(served["root"] / "o")})
    assert not r["ok"] and "error" in r
    r = request(served["socket"], {"cmd": "nope"})
    assert not r["ok"]
    r = request(served["socket"], {"wavs": [], "out_dir": "x"})
    assert not r["ok"]
    # malformed JSON on a raw socket
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.connect(served["socket"])
        s.sendall(b"{not json\n")
        assert b'"ok": false' in s.recv(1 << 16)
    assert request(served["socket"], {"cmd": "ping"})["ok"]


def test_serve_parser_and_separate_server_flag():
    from speech_separation_tpu.cli.main import build_parser, cmd_serve
    args = build_parser().parse_args(["serve", "m.mdl", "/tmp/s.sock",
                                      "--warmup-sec", "4,8"])
    assert args.fn is cmd_serve and args.warmup_sec == "4,8"
    args = build_parser().parse_args(["separate", "m.mdl", "out", "a.wav",
                                      "--server", "/tmp/s.sock"])
    assert args.server == "/tmp/s.sock"


def test_shutdown_removes_socket(served):
    """Run last: shutdown via the protocol, server thread exits, socket
    file is unlinked."""
    r = request(served["socket"], {"cmd": "shutdown"})
    assert r["ok"]
    served["thread"].join(timeout=15)
    assert not served["thread"].is_alive()
    assert not os.path.exists(served["socket"])
