"""Online streaming separation (eval/streaming.py + causal TCN).

The contract: a causal-TCN stream pushed in arbitrary block sizes emits
each output sample exactly once, never revises it, and the concatenated
output equals the offline fused pipeline on the same audio — chunk
boundaries and push granularity are mathematically invisible."""

import os

import numpy as np
import pytest

import jax

from speech_separation_tpu.models import tcn
from speech_separation_tpu.train.checkpoint import save_checkpoint
from speech_separation_tpu.eval.streaming import StreamingSeparator

KW = {"channels": "16", "hidden": "24", "blocks": "3", "repeats": "2",
      "causal": "1"}


@pytest.fixture(scope="module")
def causal_model(tmp_path_factory):
    cfg = tcn.Config(feat_dim=257, num_spk=2, channels=16, hidden=24,
                     blocks=3, repeats=2, causal=True)
    params, state = tcn.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path_factory.mktemp("stream") / "m.mdl")
    save_checkpoint(path, params=params, state=state,
                    meta={"arch": "TCN", "model_kwargs": KW})
    return path


def _audio(n=9000, seed=5):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(n)).astype(np.float32)


def _run_stream(model, x, blocks, chunk_frames=8):
    sep = StreamingSeparator(model, chunk_frames=chunk_frames,
                             model_kwargs=KW)
    outs = [[] for _ in range(2)]
    i = 0
    for blk in blocks:
        tracks = sep.push(x[i: i + blk])
        i += blk
        for s in range(2):
            outs[s].append(tracks[s])
    assert i == len(x)
    tracks = sep.close()
    for s in range(2):
        outs[s].append(tracks[s])
    return [np.concatenate(o) for o in outs]


def test_stream_equals_offline_pipeline(causal_model):
    from speech_separation_tpu.eval.pipeline import SeparationPipeline
    x = _audio()
    off = SeparationPipeline(causal_model, model_kwargs=KW, batch_size=1,
                             length_quantum=1024).separate([x])[0]
    stream = _run_stream(causal_model, x,
                         (100, 57, 1000, 3, 2048, 900, 4000, 892))
    for s in range(2):
        assert len(stream[s]) == len(off[s])
        np.testing.assert_allclose(stream[s], off[s], atol=2e-5)


def test_push_granularity_invisible(causal_model):
    """Sample-by-sample-ish pushes and one giant push produce identical
    output (same chunk program, same state arithmetic)."""
    x = _audio(n=5000, seed=7)
    a = _run_stream(causal_model, x, (5000,))
    b = _run_stream(causal_model, x, (1,) * 300 + (700, 4000))
    for s in range(2):
        np.testing.assert_allclose(a[s], b[s], atol=1e-6)


def test_emitted_samples_never_revised(causal_model):
    """Causality end-to-end: whatever arrives later, samples already
    emitted must be identical across different futures."""
    x = _audio(n=8000, seed=9)
    sep1 = StreamingSeparator(causal_model, chunk_frames=8, model_kwargs=KW)
    sep2 = StreamingSeparator(causal_model, chunk_frames=8, model_kwargs=KW)
    got1 = sep1.push(x[:4096])
    got2 = sep2.push(x[:4096])
    n = min(len(got1[0]), len(got2[0]))
    assert n > 0  # enough audio to have emitted something
    # different futures
    sep1.push(x[4096:])
    sep2.push(-x[4096:])
    for s in range(2):
        np.testing.assert_array_equal(got1[s][:n], got2[s][:n])


def test_latency_is_structural(causal_model):
    """After pushing N samples, everything up to
    N - (chunk + n_fft/2 + n_fft) samples ago must already be out —
    the engine may not hoard audio beyond its structural lookahead."""
    x = _audio(n=12000, seed=11)
    sep = StreamingSeparator(causal_model, chunk_frames=8, model_kwargs=KW)
    emitted = 0
    bound = 8 * 128 + 256 + 512  # chunk + reflect lookahead + one window
    for i in range(0, 12000, 500):
        emitted += len(sep.push(x[i: i + 500])[0])
        pushed = min(i + 500, 12000)
        assert emitted >= pushed - bound - 500, (pushed, emitted)


def test_stream_errors(causal_model):
    sep = StreamingSeparator(causal_model, model_kwargs=KW)
    sep.push(_audio(1000))
    sep.close()
    with pytest.raises(RuntimeError):
        sep.push(np.zeros(10, np.float32))
    with pytest.raises(RuntimeError):
        sep.close()
    short = StreamingSeparator(causal_model, model_kwargs=KW)
    short.push(np.zeros(10, np.float32))
    with pytest.raises(ValueError, match="too short"):
        short.close()

    # non-causal models are rejected up front
    cfg = tcn.Config(feat_dim=257, num_spk=2, channels=8, hidden=12,
                     blocks=2, repeats=1)
    params, state = tcn.init(jax.random.PRNGKey(1), cfg)
    import tempfile
    nc = os.path.join(tempfile.mkdtemp(), "nc.mdl")
    kw = {"channels": "8", "hidden": "12", "blocks": "2", "repeats": "1"}
    save_checkpoint(nc, params=params, state=state,
                    meta={"arch": "TCN", "model_kwargs": kw})
    with pytest.raises(ValueError, match="causal"):
        StreamingSeparator(nc, model_kwargs=kw)


def test_causal_forward_ignores_future():
    """Model-level causality: changing frame t+1.. leaves outputs at <= t
    bit-identical (left-padded convs; everything else is per-frame)."""
    cfg = tcn.Config(feat_dim=33, num_spk=2, channels=8, hidden=12,
                     blocks=2, repeats=2, causal=True)
    params, _ = tcn.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = np.abs(rng.standard_normal((1, 30, 33))).astype(np.float32)
    import jax.numpy as jnp
    lengths = jnp.asarray([30]); rm = jnp.ones((1,), jnp.float32)
    key = jax.random.PRNGKey(1)
    m1, _ = tcn.forward(cfg, params, {}, jnp.asarray(x), lengths, rm, key,
                        train=False)
    x2 = x.copy()
    x2[0, 20:] = 7.7  # rewrite the future
    m2, _ = tcn.forward(cfg, params, {}, jnp.asarray(x2), lengths, rm, key,
                        train=False)
    np.testing.assert_array_equal(np.asarray(m1[0, :20]),
                                  np.asarray(m2[0, :20]))
    assert np.any(np.asarray(m1[0, 20:]) != np.asarray(m2[0, 20:]))


def test_pool_streams_match_solo(causal_model):
    """Two concurrent pool streams, interleaved pushes with starvation
    (slot b gets audio in bursts), must match running each stream alone
    to float precision (the B=4 program reduces in a different order
    than B=1, so bit-identity across batch shapes is not expected) —
    per-row conv state isolates slots."""
    from speech_separation_tpu.eval.streaming import StreamingPool

    xa = _audio(n=7000, seed=21)
    xb = _audio(n=9000, seed=22)
    solo = {k: _run_stream(causal_model, x, (len(x),))
            for k, x in (("a", xa), ("b", xb))}

    pool = StreamingPool(causal_model, capacity=4, chunk_frames=8,
                         model_kwargs=KW)
    a, b = pool.open(), pool.open()
    got = {a: [[], []], b: [[], []]}

    def take(results):
        for slot, tracks in results.items():
            for s in range(2):
                got[slot][s].append(tracks[s])

    # a gets steady 500-sample blocks; b arrives in two big bursts, so b
    # starves for many steps while a advances (frozen-state path)
    for i in range(0, 7000, 500):
        pool.push(a, xa[i: i + 500])
        if i == 0:
            pool.push(b, xb[:1500])
        if i == 4000:
            pool.push(b, xb[1500:])
        take(pool.step())
    take({b: pool.close(b)})
    take({a: pool.close(a)})

    for slot, x, key in ((a, xa, "a"), (b, xb, "b")):
        for s in range(2):
            mine = np.concatenate(got[slot][s])
            assert len(mine) == len(solo[key][s])
            np.testing.assert_allclose(mine, solo[key][s], atol=2e-6)


def test_pool_slot_reuse_and_errors(causal_model):
    from speech_separation_tpu.eval.streaming import StreamingPool

    pool = StreamingPool(causal_model, capacity=2, chunk_frames=8,
                         model_kwargs=KW)
    a, b = pool.open(), pool.open()
    with pytest.raises(RuntimeError, match="pool full"):
        pool.open()
    pool.push(a, _audio(3000, seed=1))
    tracks = pool.close(a)
    assert len(tracks) == 2 and len(tracks[0]) > 0
    with pytest.raises(RuntimeError, match="not open"):
        pool.push(a, np.zeros(10, np.float32))
    # the freed slot is reusable and starts from clean state: same input
    # on the reused slot == a fresh solo run
    c = pool.open()
    assert c == a
    x = _audio(4000, seed=2)
    pool.push(c, x)
    out_pool = pool.close(c)
    out_solo = _run_stream(causal_model, x, (4000,))
    for s in range(2):
        np.testing.assert_allclose(out_pool[s], out_solo[s], atol=2e-6)
