"""int16 wav writing of out-of-range tracks (utils/audio.py).

SI-SNR-trained time-domain models (ConvTasNet/DPRNN) emit arbitrarily
scaled tracks; samples past +-1.0 must SATURATE at the int16 range (the
reference's bare ``astype`` WRAPS: a +1.1 peak became -0.9 and cost the
scored output ~8 dB — demo regression), and the separated-track writers
apply one shared per-utterance gain (limit_peak) so the waveform shape
survives the int16 format with scoring unchanged."""

import numpy as np

from speech_separation_tpu.utils.audio import (limit_peak, load_wav,
                                               write_wav_int16)


def test_write_saturates_instead_of_wrapping(tmp_path):
    x = np.array([0.5, 1.1, -1.3, -0.25, 0.999], np.float32)
    p = str(tmp_path / "a.wav")
    write_wav_int16(p, 8000, x)
    y, sr = load_wav(p)
    assert sr == 8000
    # in-range samples keep the reference's exact truncation scaling
    np.testing.assert_allclose(y[[0, 3, 4]],
                               np.trunc(x[[0, 3, 4]] * 32767.0) / 32768.0,
                               atol=0)
    # out-of-range samples clip to the rail with the input's sign
    assert y[1] == 32767.0 / 32768.0 and y[2] == -1.0


def test_write_in_range_bytes_unchanged(tmp_path):
    """The clip is a no-op for in-range audio: bytes equal the reference
    formula (x * 32767).astype(int16) (reconstruct_sources.py:41-42)."""
    rng = np.random.default_rng(0)
    x = (rng.uniform(-1.0, 1.0, 512) * 0.98).astype(np.float32)
    p = str(tmp_path / "b.wav")
    write_wav_int16(p, 8000, x)
    y, _ = load_wav(p)
    want = (x * 32767.0).astype(np.int16).astype(np.float64) / 32768.0
    np.testing.assert_array_equal(y, want)


def test_limit_peak_shared_gain():
    a = np.array([0.5, -2.0], np.float32)
    b = np.array([0.25, 0.1], np.float32)
    out = limit_peak([a, b])
    lim = 32767.0 / 32768.0
    g = lim / 2.0
    np.testing.assert_allclose(out[0], a * g, rtol=1e-6)
    np.testing.assert_allclose(out[1], b * g, rtol=1e-6)  # same gain
    # in-range tracks come back unscaled (identity, not a copy contract)
    c = np.array([0.9, -0.99], np.float32)
    out = limit_peak([c, b])
    np.testing.assert_array_equal(out[0], c)
    np.testing.assert_array_equal(out[1], b)


def test_limit_peak_scoring_invariance():
    """BSS-eval and SI-SDR of the written (gain-limited) tracks equal the
    raw tracks' scores — the property the writers rely on."""
    from speech_separation_tpu.eval.bss_eval import bss_eval_sources, si_sdr
    rng = np.random.default_rng(1)
    refs = rng.standard_normal((2, 3000)).astype(np.float32) * 0.1
    ests = refs + 0.02 * rng.standard_normal((2, 3000)).astype(np.float32)
    ests *= 3.7  # overshoot the wav range like an SI-SNR model would
    sdr0, sir0, sar0, _ = bss_eval_sources(refs, ests)
    lim = limit_peak(list(ests))
    sdr1, sir1, sar1, _ = bss_eval_sources(refs, np.stack(lim))
    np.testing.assert_allclose(sdr0, sdr1, atol=1e-7)
    np.testing.assert_allclose(sar0, sar1, atol=1e-7)
    for k in range(2):
        np.testing.assert_allclose(si_sdr(ests[k], refs[k]),
                                   si_sdr(lim[k], refs[k]), atol=1e-5)
