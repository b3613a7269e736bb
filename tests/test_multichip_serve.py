"""Data-parallel inference/serving on the 8-device virtual CPU mesh.

The serving path (`SeparationPipeline(mesh=...)`, `sepsep serve
--data-parallel`) shards each padded batch over the mesh's 'data' axis with
parameters replicated. Inference is row-independent (eval-mode BN uses
running statistics), so the sharded program must reproduce the
single-device outputs — pinned here, along with the batch-size round-up
rule and a socket round-trip through a DP server.
"""

import os
import threading
import time

import numpy as np
import pytest

import jax

from speech_separation_tpu.eval.pipeline import SeparationPipeline
from speech_separation_tpu.eval.serve import SeparationServer, request
from speech_separation_tpu.models import upit
from speech_separation_tpu.parallel.mesh import make_mesh
from speech_separation_tpu.train.checkpoint import save_checkpoint
from speech_separation_tpu.utils.audio import load_wav, write_wav_int16

SR = 8000
KW = {"hidden": "16", "num_layers": "1", "zero_init_hidden": "1"}


@pytest.fixture(scope="module")
def model_and_wavs(tmp_path_factory):
    root = tmp_path_factory.mktemp("dp_serve")
    cfg = upit.Config(feat_dim=257, num_spk=2, hidden=16, num_layers=1,
                      zero_init_hidden=True)
    params, state = upit.init(jax.random.PRNGKey(0), cfg)
    model = str(root / "model.mdl")
    save_checkpoint(model, params=params, state=state, epoch=0,
                    meta={"arch": "uPIT"})
    rng = np.random.default_rng(11)
    sigs = [rng.standard_normal(n).astype(np.float32) * 0.05
            for n in (7000, 5000, 3210, 9000, 4000)]
    wavs = []
    for k, x in enumerate(sigs):
        path = str(root / f"in{k}.wav")
        write_wav_int16(path, SR, x)
        wavs.append(path)
    return {"root": root, "model": model, "sigs": sigs, "wavs": wavs}


def test_data_parallel_pipeline_matches_single_device(model_and_wavs):
    m = model_and_wavs
    single = SeparationPipeline(m["model"], model_kwargs=KW, batch_size=8,
                                length_quantum=4096)
    dp = SeparationPipeline(m["model"], model_kwargs=KW, batch_size=8,
                            length_quantum=4096, mesh=make_mesh())
    assert dp.mesh is not None and dp.mesh.shape["data"] == 8
    out_s = single.separate(m["sigs"])
    out_dp = dp.separate(m["sigs"])
    for ts, td in zip(out_s, out_dp):
        assert len(ts) == len(td) == 2
        for a, b in zip(ts, td):
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_batch_size_rounds_up_to_device_multiple(model_and_wavs, capsys):
    dp = SeparationPipeline(model_and_wavs["model"], model_kwargs=KW,
                            batch_size=5, length_quantum=4096,
                            mesh=make_mesh())
    assert dp.batch_size == 8
    assert "5 -> 8" in capsys.readouterr().out


def test_single_device_mesh_degenerates_to_none(model_and_wavs):
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    pipe = SeparationPipeline(model_and_wavs["model"], model_kwargs=KW,
                              batch_size=4, length_quantum=4096, mesh=mesh)
    assert pipe.mesh is None  # no sharding machinery for one device


def test_server_over_data_parallel_pipeline(model_and_wavs):
    """A request through a DP server matches the single-device pipeline."""
    m = model_and_wavs
    dp = SeparationPipeline(m["model"], model_kwargs=KW, batch_size=8,
                            length_quantum=4096, mesh=make_mesh())
    sock = str(m["root"] / "dp.sock")
    server = SeparationServer(dp, sock, coalesce=8)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    deadline = time.monotonic() + 30
    while not os.path.exists(sock):
        assert time.monotonic() < deadline, "server never bound its socket"
        time.sleep(0.02)
    try:
        out = str(m["root"] / "dp_out")
        r = request(sock, {"wavs": m["wavs"][:2], "out_dir": out})
        assert r["ok"], r
        single = SeparationPipeline(m["model"], model_kwargs=KW,
                                    batch_size=8, length_quantum=4096)
        ref = single.separate(m["sigs"][:2])
        from scipy.io import wavfile
        for k, wav in enumerate(m["wavs"][:2]):
            for s, path in enumerate(r["outputs"][wav]):
                ref_path = str(m["root"] / f"ref_{k}_{s}.wav")
                write_wav_int16(ref_path, SR, ref[k][s])
                got = wavfile.read(path)[1].astype(np.int32)
                want = wavfile.read(ref_path)[1].astype(np.int32)
                # identical up to int16 quantization of ~1e-6 float diffs
                # between sharded and single-device execution
                assert got.shape == want.shape
                assert np.max(np.abs(got - want)) <= 1
    finally:
        request(sock, {"cmd": "shutdown"})
        time.sleep(0.3)
