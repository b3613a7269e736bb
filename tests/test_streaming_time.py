"""Time-domain live streaming (eval/streaming.py + causal Conv-TasNet).

Same contract as the spectral streaming tests (test_streaming.py), for
the DOMAIN='time' path: each output sample is emitted exactly once,
never revised, and the concatenation equals the offline fused pipeline
on the same audio — with the much smaller structural lookahead of one
encoder window (filter_len samples) instead of n_fft/2."""

import numpy as np
import pytest

import jax

from speech_separation_tpu.models import convtasnet as ct
from speech_separation_tpu.train.checkpoint import save_checkpoint
from speech_separation_tpu.eval.streaming import (StreamingSeparator,
                                                  StreamingPool)

TINY = dict(n_filters=32, filter_len=16, stride=8, channels=16, hidden=24,
            kernel=3, blocks=3, repeats=2)
KW = {k: str(v) for k, v in dict(TINY, causal=1).items()}
S = 2


@pytest.fixture(scope="module")
def causal_model(tmp_path_factory):
    cfg = ct.Config(num_spk=S, causal=True, **TINY)
    params, state = ct.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path_factory.mktemp("tstream") / "m.mdl")
    save_checkpoint(path, params=params, state=state,
                    meta={"arch": "ConvTasNet", "model_kwargs": KW})
    return path


def _audio(n=6000, seed=5):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(n)).astype(np.float32)


def _run_stream(model, x, blocks, chunk_frames=8):
    sep = StreamingSeparator(model, chunk_frames=chunk_frames,
                             model_kwargs=KW)
    outs = [[] for _ in range(S)]
    i = 0
    for blk in blocks:
        tracks = sep.push(x[i: i + blk])
        i += blk
        for s in range(S):
            outs[s].append(tracks[s])
    assert i == len(x)
    tracks = sep.close()
    for s in range(S):
        outs[s].append(tracks[s])
    return [np.concatenate(o) for o in outs]


def test_stream_equals_offline_pipeline(causal_model):
    """Concatenated live emissions == the offline fused time-domain
    program (SeparationPipeline DOMAIN='time' branch) on the same audio,
    at the stream's exact sample count — including a ragged tail that
    exercises the partial final chunk."""
    from speech_separation_tpu.eval.pipeline import SeparationPipeline
    x = _audio(n=5987)
    off = SeparationPipeline(causal_model, model_kwargs=KW, batch_size=1,
                             length_quantum=512).separate([x])[0]
    stream = _run_stream(causal_model, x, (100, 57, 1000, 3, 2048, 900,
                                           1800, 79))
    for s in range(S):
        assert len(stream[s]) == len(x) == len(off[s])
        np.testing.assert_allclose(stream[s], off[s], atol=2e-5)


def test_push_granularity_invisible(causal_model):
    x = _audio(n=3000, seed=7)
    a = _run_stream(causal_model, x, (3000,))
    b = _run_stream(causal_model, x, (1,) * 100 + (700, 2200))
    for s in range(S):
        np.testing.assert_allclose(a[s], b[s], atol=1e-6)


def test_emitted_samples_never_revised(causal_model):
    x = _audio(n=4000, seed=9)
    sep1 = StreamingSeparator(causal_model, chunk_frames=8, model_kwargs=KW)
    sep2 = StreamingSeparator(causal_model, chunk_frames=8, model_kwargs=KW)
    got1 = sep1.push(x[:2048])
    got2 = sep2.push(x[:2048])
    n = min(len(got1[0]), len(got2[0]))
    assert n > 0
    sep1.push(x[2048:])
    sep2.push(-x[2048:])
    for s in range(S):
        np.testing.assert_array_equal(got1[s][:n], got2[s][:n])


def test_latency_is_structural(causal_model):
    """The time path's lookahead is one chunk of encoder strides plus one
    encoder window — ~10 ms at the test scale, far below the spectral
    path's n_fft-based bound."""
    x = _audio(n=6000, seed=11)
    sep = StreamingSeparator(causal_model, chunk_frames=8, model_kwargs=KW)
    emitted = 0
    bound = 8 * TINY["stride"] + TINY["filter_len"]  # chunk + one window
    for i in range(0, 6000, 500):
        emitted += len(sep.push(x[i: i + 500])[0])
        pushed = min(i + 500, 6000)
        assert emitted >= pushed - bound - 500, (pushed, emitted)


def test_non_causal_rejected(tmp_path):
    cfg = ct.Config(num_spk=S, **TINY)
    params, state = ct.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "nc.mdl")
    kw = {k: str(v) for k, v in TINY.items()}
    save_checkpoint(path, params=params, state=state,
                    meta={"arch": "ConvTasNet", "model_kwargs": kw})
    with pytest.raises(ValueError, match="causal"):
        StreamingSeparator(path, model_kwargs=kw)


def test_pool_slots_match_solo_streams(causal_model):
    """Interleaved time-domain pool slots emit exactly what each stream
    would produce alone (per-row conv state isolation), with slot reuse
    after close."""
    rng = np.random.default_rng(13)
    xa = (0.1 * rng.standard_normal(2500)).astype(np.float32)
    xb = (0.1 * rng.standard_normal(1789)).astype(np.float32)
    solo_a = _run_stream(causal_model, xa, (2500,))
    solo_b = _run_stream(causal_model, xb, (1789,))

    pool = StreamingPool(causal_model, capacity=2, chunk_frames=8,
                         model_kwargs=KW)
    a, b = pool.open(), pool.open()
    outs = {a: [[] for _ in range(S)], b: [[] for _ in range(S)]}
    ia = ib = 0
    while ia < len(xa) or ib < len(xb):
        if ia < len(xa):
            pool.push(a, xa[ia: ia + 400]); ia += 400
        if ib < len(xb):
            pool.push(b, xb[ib: ib + 250]); ib += 250
        for slot, tracks in pool.step().items():
            for s in range(S):
                outs[slot][s].append(tracks[s])
    for slot, x in ((a, xa), (b, xb)):
        final = pool.close(slot)
        for s in range(S):
            outs[slot][s].append(final[s])
    got_a = [np.concatenate(o) for o in outs[a]]
    got_b = [np.concatenate(o) for o in outs[b]]
    for s in range(S):
        np.testing.assert_allclose(got_a[s], solo_a[s], atol=1e-6)
        np.testing.assert_allclose(got_b[s], solo_b[s], atol=1e-6)

    c = pool.open()  # freed slot is reusable with zeroed state
    assert c in (a, b)
    xc = (0.1 * rng.standard_normal(900)).astype(np.float32)
    pool.push(c, xc)
    got_c = pool.close(c)
    solo_c = _run_stream(causal_model, xc, (900,))
    for s in range(S):
        got = np.concatenate([got_c[s]])
        np.testing.assert_allclose(got, solo_c[s], atol=1e-6)
