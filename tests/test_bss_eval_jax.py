"""Device BSS-eval vs the numpy/float64 implementation."""

import numpy as np
import pytest

from speech_separation_tpu.eval.bss_eval import bss_eval_sources
from speech_separation_tpu.eval.bss_eval_jax import bss_eval_sources_batch


def _mixture_case(seed, L=4000, alpha=0.1):
    rng = np.random.default_rng(seed)
    sources = rng.standard_normal((2, L))
    est0 = sources[0] + alpha * sources[1]
    est1 = sources[1] + alpha * sources[0]
    return sources, np.stack([est0, est1])


@pytest.mark.parametrize("flen", [16, 64])
def test_batch_matches_numpy(flen):
    cases = [_mixture_case(s) for s in range(3)]
    refs = np.stack([c[0] for c in cases]).astype(np.float32)
    ests = np.stack([c[1] for c in cases]).astype(np.float32)

    sdr, sir, sar, perm = bss_eval_sources_batch(refs, ests, flen=flen)
    for b in range(len(cases)):
        sdr_np, sir_np, sar_np, perm_np = bss_eval_sources(
            refs[b], ests[b], flen=flen)
        np.testing.assert_array_equal(perm[b], perm_np)
        np.testing.assert_allclose(sdr[b], sdr_np, atol=0.05)
        np.testing.assert_allclose(sir[b], sir_np, atol=0.05)
        # SAR of a near-subspace estimate is huge and ill-conditioned in
        # f32; just require it to agree that artifacts are negligible
        assert np.all(sar[b] > 40.0) == np.all(sar_np > 40.0)


def test_batch_zero_padding_exact():
    """Padding a shorter utterance with zeros must not change its scores."""
    sources, ests = _mixture_case(10, L=3000)
    flen = 32
    refs_p = np.zeros((1, 2, 4000), np.float32)
    ests_p = np.zeros((1, 2, 4000), np.float32)
    refs_p[0, :, :3000] = sources
    ests_p[0, :, :3000] = ests

    sdr_p, sir_p, _, _ = bss_eval_sources_batch(refs_p, ests_p, flen=flen)
    sdr_u, sir_u, _, _ = bss_eval_sources_batch(
        sources[None].astype(np.float32), ests[None].astype(np.float32),
        flen=flen)
    np.testing.assert_allclose(sdr_p, sdr_u, atol=0.02)
    np.testing.assert_allclose(sir_p, sir_u, atol=0.02)


def test_batch_permutation_recovery():
    sources, _ = _mixture_case(11)
    swapped = sources[::-1].copy()
    sdr, sir, sar, perm = bss_eval_sources_batch(
        sources[None].astype(np.float32), swapped[None].astype(np.float32),
        flen=32)
    assert perm[0].tolist() == [1, 0]
    assert np.all(sdr[0] > 60.0)


def _ar1(rng, n, rho=0.95):
    x = np.empty(n)
    x[0] = rng.standard_normal()
    eps = rng.standard_normal(n)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + eps[t]
    return x / np.std(x)


def test_ar_material_within_0p1_db_of_host_f64():
    """VERDICT round-1 weak #5 done-criterion: on strongly-correlated
    AR(0.95) material (the hard case — near-singular delayed-source Gram)
    the two-float device scorer agrees with the float64 host scorer to
    0.1 dB in SDR, SIR AND SAR at the production flen=512."""
    rng = np.random.default_rng(42)
    L, flen = 6000, 512
    cases = []
    for _ in range(2):
        refs = np.stack([_ar1(rng, L), _ar1(rng, L)])
        ests = np.stack([
            refs[0] + 0.3 * refs[1] + 0.05 * rng.standard_normal(L),
            refs[1] + 0.25 * refs[0] + 0.05 * rng.standard_normal(L),
        ])
        cases.append((refs, ests))
    refs_b = np.stack([c[0] for c in cases]).astype(np.float32)
    ests_b = np.stack([c[1] for c in cases]).astype(np.float32)

    sdr, sir, sar, perm = bss_eval_sources_batch(refs_b, ests_b, flen=flen)
    for b, (refs, ests) in enumerate(cases):
        # f64 host reference on the same f32-quantized inputs
        sdr_np, sir_np, sar_np, perm_np = bss_eval_sources(
            refs_b[b], ests_b[b], flen=flen)
        np.testing.assert_array_equal(perm[b], perm_np)
        np.testing.assert_allclose(sdr[b], sdr_np, atol=0.1, err_msg="SDR")
        np.testing.assert_allclose(sir[b], sir_np, atol=0.1, err_msg="SIR")
        np.testing.assert_allclose(sar[b], sar_np, atol=0.1, err_msg="SAR")


def test_chunked_pipeline_matches_single_call():
    """Shape-discipline path: with max_batch forcing multiple chunks AND a
    ragged tail (B % max_batch != 0), the tail chunk is row-padded by
    repeating real rows and its padded outputs dropped, while the two-deep
    dispatch pipeline overlaps chunk k+1 with chunk k's readback.  All of
    that must be invisible in the results: same scores/permutations as one
    exact-shape call, for every utterance including the tail."""
    cases = [_mixture_case(s, L=3000) for s in range(5)]
    refs = np.stack([c[0] for c in cases]).astype(np.float32)
    ests = np.stack([c[1] for c in cases]).astype(np.float32)

    one = bss_eval_sources_batch(refs, ests, flen=32)
    chunked = bss_eval_sources_batch(refs, ests, flen=32, max_batch=2)
    assert all(np.asarray(x).shape[0] == 5 for x in chunked)
    np.testing.assert_array_equal(chunked[3], one[3])  # permutations
    for a, b in zip(chunked[:3], one[:3]):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_int16_inputs_match_float_scoring():
    """PCM16 shipping path: int16 refs/ests (raw samples) must score
    identically to the float32 k/32768 representation — every BSS-eval
    quantity is invariant to the common scale (eval/bss_eval_jax.py), and
    eval/score.py's _maybe_int16 repacking must be exact + reversible."""
    from speech_separation_tpu.eval.score import _maybe_int16

    rng = np.random.default_rng(7)
    L = 4000
    k = rng.integers(-32768, 32768, size=(2, 2, L)).astype(np.int16)
    as_float = (k.astype(np.float32) / 32768.0)
    # estimates: a mixed version, also quantized to PCM16
    ke = np.clip(np.rint(0.8 * k + 0.2 * k[:, ::-1]), -32768, 32767
                 ).astype(np.int16)
    ests_float = ke.astype(np.float32) / 32768.0

    f_out = bss_eval_sources_batch(as_float, ests_float, flen=64)
    i_out = bss_eval_sources_batch(k, ke, flen=64)
    for f, i in zip(f_out, i_out):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(i))

    packed = _maybe_int16(as_float)
    assert packed.dtype == np.int16
    np.testing.assert_array_equal(packed, k)
    # inexact floats must pass through unchanged
    x = rng.standard_normal((2, 8)).astype(np.float32)
    assert _maybe_int16(x) is x


def test_pad_to_chunk_matches_exact_shape():
    """pad_to_chunk=True row-pads a sub-chunk call up to max_batch (so the
    scoring sweep's final slab reuses the warm full-chunk executable);
    results must equal the exact-shape call."""
    cases = [_mixture_case(s, L=3000) for s in range(3)]
    refs = np.stack([c[0] for c in cases]).astype(np.float32)
    ests = np.stack([c[1] for c in cases]).astype(np.float32)
    out_exact = bss_eval_sources_batch(refs, ests, flen=32)
    out_padded = bss_eval_sources_batch(refs, ests, flen=32, max_batch=8,
                                        pad_to_chunk=True)
    for a, b in zip(out_exact, out_padded):
        assert b.shape == a.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
