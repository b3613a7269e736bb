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


def test_ping_latency_percentiles(served):
    """After at least one served request, ping reports end-to-end latency
    percentiles (p50 <= p99 <= max, all positive)."""
    out = str(served["root"] / "out_lat")
    assert request(served["socket"],
                   {"wavs": served["wavs"][:1], "out_dir": out})["ok"]
    lat = request(served["socket"], {"cmd": "ping"}).get("latency_ms")
    assert lat and lat["n"] >= 1
    assert 0 < lat["p50"] <= lat["p99"] <= lat["max"]


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
    out = str(served["root"] / "o")
    r = request(served["socket"], {"wavs": ["/nonexistent/x.wav"],
                                   "out_dir": out})
    assert not r["ok"] and "error" in r
    r = request(served["socket"], {"cmd": "nope"})
    assert not r["ok"]
    # type confusion must be rejected before it reaches open()/the worker:
    # an int wav would be opened as a raw file descriptor, an unhashable
    # num_spk would kill the batching thread
    for bad in ({"wavs": [], "out_dir": out},
                {"wavs": [3], "out_dir": out},
                {"wavs": [None], "out_dir": out},
                {"wavs": served["wavs"][:1], "out_dir": 7},
                {"wavs": served["wavs"][:1], "out_dir": out,
                 "num_spk": [2]},
                {"wavs": served["wavs"][:1], "out_dir": out,
                 "num_spk": 0},
                {"wavs": served["wavs"][:1], "out_dir": out,
                 "long_form": "yes"},
                {"wavs": ["/a/mix.wav", "/b/mix.wav"], "out_dir": out}):
        r = request(served["socket"], bad)
        assert not r["ok"] and "error" in r, bad
    # malformed JSON on a raw socket
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.connect(served["socket"])
        s.sendall(b"{not json\n")
        assert b'"ok": false' in s.recv(1 << 16)
    assert request(served["socket"], {"cmd": "ping"})["ok"]


def test_load_failure_isolated_to_its_own_request(served):
    """A wav that validates at dispatch but fails to load in the worker
    (vanished/corrupted in between) must fail only its request — other
    requests coalesced into the same device batch still succeed."""
    from speech_separation_tpu.eval.serve import _Pending
    server = served["server"]
    good = _Pending({"wavs": served["wavs"][:1], "lengths": [7000],
                     "out_dir": str(served["root"] / "iso_good")})
    bad = _Pending({"wavs": ["/vanished/after/dispatch.wav"],
                    "lengths": [5000],
                    "out_dir": str(served["root"] / "iso_bad")})
    os.makedirs(good.payload["out_dir"], exist_ok=True)
    server._run_batched([good, bad], None)
    assert good.reply["ok"]
    assert all(os.path.exists(p)
               for paths in good.reply["outputs"].values() for p in paths)
    assert not bad.reply["ok"] and "vanished" in bad.reply["error"]


def test_warmup_covers_any_request_size(served):
    """The server pads batches to batch_size, so after one full-batch
    warmup at a length bucket, a 1-file request at that bucket must NOT
    trace/compile a new executable (jit caches per argument shape — the
    whole point of pad_batches)."""
    from speech_separation_tpu.dsp.stft import num_frames
    server = served["server"]
    pipe = server.pipe
    # warm a bucket distinct from the other tests' (length_quantum=4096:
    # 2.0 s of 8 kHz audio = 16000 samples -> 16384-sample bucket)
    server.warmup([2.0])
    key = (num_frames(16384, pipe.stft_cfg.hop), pipe.num_spk)
    fused = pipe._fns[key]
    traces = fused._cache_size()
    out = str(served["root"] / "warm_out")
    wav = str(served["root"] / "warm.wav")
    write_wav_int16(wav, SR, np.zeros(15000, np.float32))
    r = request(served["socket"], {"wavs": [wav], "out_dir": out})
    assert r["ok"]
    assert fused._cache_size() == traces  # same shape -> no new executable


def test_serve_parser_and_separate_server_flag():
    from speech_separation_tpu.cli.main import build_parser, cmd_serve
    args = build_parser().parse_args(["serve", "m.mdl", "/tmp/s.sock",
                                      "--warmup-sec", "4,8"])
    assert args.fn is cmd_serve and args.warmup_sec == "4,8"
    args = build_parser().parse_args(["separate", "m.mdl", "out", "a.wav",
                                      "--server", "/tmp/s.sock"])
    assert args.server == "/tmp/s.sock"


def test_long_form_request_matches_direct_pipeline(served):
    """The server's long-form path (windowing + permutation alignment +
    crossfade inside _run_long_form) must produce byte-identical wavs to a
    direct separate_long call on the same checkpoint."""
    out_dir = str(served["root"] / "out_long")
    wav = served["wavs"][0]  # 7000 samples = several 0.5 s windows
    r = request(served["socket"],
                {"wavs": [wav], "out_dir": out_dir, "long_form": True,
                 "window_sec": 0.5, "overlap_sec": 0.1})
    assert r["ok"], r
    paths = r["outputs"][wav]
    assert len(paths) == 2

    pipe = SeparationPipeline(served["model"], model_kwargs=KW, batch_size=4,
                              length_quantum=4096)
    x, _ = load_wav(wav, sr=SR)
    direct = pipe.separate_long(x, window_sec=0.5, overlap_sec=0.1)
    assert len(direct[0]) == len(x)  # full coverage, no silent tail
    for path, est in zip(paths, direct):
        ref_path = str(served["root"] / "ref_long.wav")
        write_wav_int16(ref_path, SR, est)
        with open(path, "rb") as a, open(ref_path, "rb") as b:
            assert a.read() == b.read()


def test_shutdown_removes_socket(served):
    """Run last: shutdown via the protocol, server thread exits, socket
    file is unlinked."""
    r = request(served["socket"], {"cmd": "shutdown"})
    assert r["ok"]
    served["thread"].join(timeout=15)
    assert not served["thread"].is_alive()
    assert not os.path.exists(served["socket"])


def test_request_queued_during_shutdown_still_gets_a_reply(served, tmp_path):
    """The shutdown/enqueue race: a request whose queue.put lands AFTER the
    worker's final drain must still be finished (with an error), never left
    blocking its connection thread on event.wait() forever. Simulated by
    setting _stop between _dispatch's pre-put check and the put itself."""
    from speech_separation_tpu.eval.serve import SeparationServer, _Pending

    class _RacingQueue:
        """Wraps a drained-and-stopped server's queue: the put itself flips
        _stop, modeling shutdown landing in that exact window."""

        def __init__(self, server):
            self.server = server
            self.inner = server._queue

        def put(self, item):
            self.server._stop.set()   # shutdown wins the race ...
            self.inner.put(item)      # ... and the worker never sees this

        def __getattr__(self, name):
            return getattr(self.inner, name)

    srv = SeparationServer(pipeline=None, socket_path="/nonexistent.sock")
    # no worker thread running (as after its final drain)
    srv._queue = _RacingQueue(srv)
    reply = srv._dispatch({"wavs": [served["wavs"][0]],
                           "out_dir": str(tmp_path)})
    assert reply == {"ok": False, "error": "server shutting down"}


@pytest.fixture(scope="module")
def stream_served(tmp_path_factory):
    """A server with the live-stream protocol enabled (causal TCN pool)."""
    import base64
    from speech_separation_tpu.models import tcn
    from speech_separation_tpu.eval.streaming import StreamingPool

    root = tmp_path_factory.mktemp("stream_serve")
    tkw = {"channels": "16", "hidden": "24", "blocks": "3", "repeats": "2",
           "causal": "1"}
    cfg = tcn.Config(feat_dim=257, num_spk=2, channels=16, hidden=24,
                     blocks=3, repeats=2, causal=True)
    params, state = tcn.init(jax.random.PRNGKey(3), cfg)
    smodel = str(root / "stream.mdl")
    save_checkpoint(smodel, params=params, state=state,
                    meta={"arch": "TCN", "model_kwargs": tkw})

    # batch pipeline model (uPIT) — unrelated to the stream pool
    ucfg = upit.Config(feat_dim=257, num_spk=2, hidden=16, num_layers=1,
                       zero_init_hidden=True)
    up, us = upit.init(jax.random.PRNGKey(0), ucfg)
    bmodel = str(root / "batch.mdl")
    save_checkpoint(bmodel, params=up, state=us, meta={"arch": "uPIT"})

    pipe = SeparationPipeline(bmodel, model_kwargs=KW, batch_size=4,
                              length_quantum=4096)
    pool = StreamingPool(smodel, capacity=3, chunk_frames=8,
                         model_kwargs=tkw)
    sock = str(root / "sp.sock")
    server = SeparationServer(pipe, sock, stream_pool=pool)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    deadline = time.monotonic() + 30
    while not os.path.exists(sock):
        assert time.monotonic() < deadline
        time.sleep(0.02)
    yield {"socket": sock, "model": smodel, "tkw": tkw, "root": root}
    server.shutdown()
    t.join(timeout=10)


def _b64(x):
    import base64
    pcm = np.clip(np.rint(np.asarray(x) * 32768.0), -32768, 32767
                  ).astype("<i2")
    return base64.b64encode(pcm.tobytes()).decode()


def _unb64(s):
    import base64
    return np.frombuffer(base64.b64decode(s), "<i2"
                         ).astype(np.float32) / 32768.0


def test_socket_streaming_matches_direct(stream_served):
    """A live stream over the socket == StreamingSeparator on the same
    (pcm16-quantized) audio."""
    from speech_separation_tpu.eval.streaming import StreamingSeparator

    rng = np.random.default_rng(13)
    x = (0.1 * rng.standard_normal(7000)).astype(np.float32)
    xq = np.clip(np.rint(x * 32768.0), -32768, 32767
                 ).astype(np.float32) / 32768.0  # what the server decodes

    r = request(stream_served["socket"], {"cmd": "stream_open"})
    assert r["ok"] and r["num_spk"] == 2 and r["sample_rate"] == 8000
    slot = r["slot"]
    got = [[], []]
    for i in range(0, 7000, 800):
        rr = request(stream_served["socket"],
                     {"cmd": "stream_push", "slot": slot,
                      "pcm16": _b64(x[i: i + 800])})
        assert rr["ok"], rr
        for s in range(2):
            got[s].append(_unb64(rr["tracks"][s]))
    rr = request(stream_served["socket"], {"cmd": "stream_close",
                                           "slot": slot})
    assert rr["ok"], rr
    for s in range(2):
        got[s].append(_unb64(rr["tracks"][s]))
    mine = [np.concatenate(g) for g in got]

    sep = StreamingSeparator(stream_served["model"], chunk_frames=8,
                             model_kwargs=stream_served["tkw"])
    ref = [[], []]
    for i in range(0, 7000, 800):
        tr = sep.push(xq[i: i + 800])
        for s in range(2):
            ref[s].append(tr[s])
    tr = sep.close()
    for s in range(2):
        ref[s].append(tr[s])
    ref = [np.concatenate(r_) for r_ in ref]
    for s in range(2):
        assert len(mine[s]) == len(ref[s])
        # both sides pcm16-quantize outputs going over the wire
        np.testing.assert_allclose(mine[s], ref[s], atol=1.1 / 32768.0)


def test_socket_streaming_two_concurrent_and_errors(stream_served):
    """Two interleaved socket streams stay isolated; protocol errors are
    rejected without killing the server; slots free on close."""
    rng = np.random.default_rng(14)
    xa = (0.1 * rng.standard_normal(4000)).astype(np.float32)
    xb = (0.1 * rng.standard_normal(4000)).astype(np.float32)
    sa = request(stream_served["socket"], {"cmd": "stream_open"})["slot"]
    sb = request(stream_served["socket"], {"cmd": "stream_open"})["slot"]
    assert sa != sb
    la = lb = 0
    for i in range(0, 4000, 1000):
        ra = request(stream_served["socket"],
                     {"cmd": "stream_push", "slot": sa,
                      "pcm16": _b64(xa[i: i + 1000])})
        rb = request(stream_served["socket"],
                     {"cmd": "stream_push", "slot": sb,
                      "pcm16": _b64(xb[i: i + 1000])})
        assert ra["ok"] and rb["ok"]
        la += len(_unb64(ra["tracks"][0]))
        lb += len(_unb64(rb["tracks"][0]))
    ra = request(stream_served["socket"], {"cmd": "stream_close", "slot": sa})
    rb = request(stream_served["socket"], {"cmd": "stream_close", "slot": sb})
    assert ra["ok"] and rb["ok"]
    la += len(_unb64(ra["tracks"][0]))
    lb += len(_unb64(rb["tracks"][0]))
    assert la == lb == 128 * (4000 // 128)  # hop*(T-1)

    # errors: bad slot, bad payload, push to closed slot
    for bad in ({"cmd": "stream_push", "slot": 99, "pcm16": _b64(xa[:100])},
                {"cmd": "stream_push", "slot": sa, "pcm16": _b64(xa[:100])},
                {"cmd": "stream_close", "slot": True}):
        r = request(stream_served["socket"], bad)
        assert not r["ok"], bad
    r = request(stream_served["socket"], {"cmd": "stream_open"})
    rr = request(stream_served["socket"],
                 {"cmd": "stream_push", "slot": r["slot"], "pcm16": "!!!"})
    assert not rr["ok"]
    assert request(stream_served["socket"], {"cmd": "ping"})["ok"]
