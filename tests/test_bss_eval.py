"""BSS-eval correctness: the FFT/block-Toeplitz projection is validated
against an explicit delayed-matrix least squares, and the metrics against
known-answer cases."""

import numpy as np
import pytest

from speech_separation_tpu.eval.bss_eval import (
    _project, _project_brute, bss_eval_sources, si_sdr, si_sdr_improvement)


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape)


def test_projection_matches_brute_force():
    L, n, flen = 400, 2, 16
    sources = _rand((n, L), 0)
    est = 0.7 * sources[0] + 0.2 * sources[1] + 0.1 * _rand((L,), 1)
    fast = _project(sources, est, flen)
    brute = _project_brute(sources, est, flen)
    np.testing.assert_allclose(fast, brute, atol=1e-8)


def test_projection_of_filtered_source_is_exact():
    """est = FIR(src) with taps < flen lies in the projection subspace
    (src is zero-tailed so the convolution tail stays inside the window)."""
    L, flen = 600, 16
    src = _rand((1, L), 2)
    src[0, L - flen:] = 0.0
    taps = np.array([0.5, -0.2, 0.1])
    est = np.convolve(src[0], taps)[:L]
    proj = _project(src, est, flen)
    np.testing.assert_allclose(proj[:L], est, atol=1e-7)


def test_bss_eval_perfect_separation():
    sources = _rand((2, 2000), 3)
    sdr, sir, sar, perm = bss_eval_sources(sources, sources.copy())
    assert np.all(sdr > 100.0)  # essentially perfect
    assert perm.tolist() == [0, 1]


def test_bss_eval_permutation_recovery():
    sources = _rand((2, 2000), 4)
    swapped = sources[::-1].copy()
    sdr, sir, sar, perm = bss_eval_sources(sources, swapped)
    assert perm.tolist() == [1, 0]
    assert np.all(sdr > 100.0)


def test_bss_eval_known_mixture_sdr():
    """est = s0 + 0.1*s1: SIR should be ~20 dB (power ratio 100) since the
    interference projection recovers the 0.1*s1 component; SDR slightly
    below, SAR very high (no artifacts outside the source subspace)."""
    sources = _rand((2, 4000), 5)
    est0 = sources[0] + 0.1 * sources[1]
    est1 = sources[1] + 0.1 * sources[0]
    sdr, sir, sar, perm = bss_eval_sources(sources, np.stack([est0, est1]))
    assert perm.tolist() == [0, 1]
    np.testing.assert_allclose(sir, 20.0, atol=1.0)
    assert np.all(sar > 60.0)
    np.testing.assert_allclose(sdr, 20.0, atol=1.0)


def test_bss_eval_no_permutation_identity():
    sources = _rand((2, 1500), 6)
    swapped = sources[::-1].copy()
    sdr, sir, sar, perm = bss_eval_sources(sources, swapped,
                                           compute_permutation=False)
    assert perm.tolist() == [0, 1]
    assert np.all(sdr < 10.0)  # wrong pairing scores terribly


def test_si_sdr_scale_invariance():
    ref = _rand((3000,), 7)
    est = ref + 0.01 * _rand((3000,), 8)
    a = si_sdr(est, ref)
    b = si_sdr(3.7 * est, ref)
    np.testing.assert_allclose(a, b, atol=1e-9)
    assert a > 35.0


def test_si_sdr_improvement_sign():
    rng = np.random.default_rng(9)
    ref = rng.standard_normal(3000)
    noise = rng.standard_normal(3000)
    mix = ref + noise
    est = ref + 0.1 * noise  # much cleaner than the mixture
    assert si_sdr_improvement(est, ref, mix) > 10.0
