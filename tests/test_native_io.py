"""Native loader (native/sepio.cpp) vs numpy: bit-exact npz/wav decoding."""

import os

import numpy as np
import pytest

from speech_separation_tpu.utils import native
from speech_separation_tpu.utils.audio import load_wav, write_wav_int16

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_npz_member_names(tmp_path):
    path = str(tmp_path / "x.npz")
    np.savez_compressed(path, mix=np.zeros((3, 4), np.float32),
                        s1=np.ones((3, 4), np.float32))
    names = native.npz_member_names(path)
    assert sorted(names) == ["mix", "s1"]


def test_load_f32_transposed_padded(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((257, 123)).astype(np.float32)  # (F, T)
    path = str(tmp_path / "feat.npz")
    np.savez_compressed(path, mix=arr)

    out = np.zeros((200, 257), np.float32)  # (T_pad, F)
    tr, tc = native.load_npz_2d_transposed(path, "mix", out, mode=0)
    assert (tr, tc) == (123, 257)
    np.testing.assert_array_equal(out[:123], arr.T)
    assert np.all(out[123:] == 0.0)


def test_load_complex_magnitude(tmp_path):
    rng = np.random.default_rng(1)
    arr = (rng.standard_normal((64, 50)) + 1j * rng.standard_normal((64, 50))
           ).astype(np.complex64)
    path = str(tmp_path / "test_feat.npz")
    np.savez_compressed(path, mix=arr)

    out = np.zeros((64, 64), np.float32)
    tr, tc = native.load_npz_2d_transposed(path, "mix", out, mode=1)
    assert (tr, tc) == (50, 64)
    np.testing.assert_allclose(out[:50], np.abs(arr).T, rtol=1e-6)


def test_load_complex_planes(tmp_path):
    rng = np.random.default_rng(2)
    arr = (rng.standard_normal((16, 9)) + 1j * rng.standard_normal((16, 9))
           ).astype(np.complex64)
    path = str(tmp_path / "c.npz")
    np.savez_compressed(path, mix=arr)

    re = np.zeros((16, 16), np.float32)
    im = np.zeros((16, 16), np.float32)
    native.load_npz_2d_transposed(path, "mix", re, mode=2, out2=im)
    np.testing.assert_array_equal(re[:9], arr.real.T)
    np.testing.assert_array_equal(im[:9], arr.imag.T)


def test_wav_matches_python_loader(tmp_path):
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(5000) * 0.2).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav_int16(path, 8000, x)

    # scipy reference decode (load_wav itself now prefers the native path)
    from scipy.io import wavfile
    sr_ref, data = wavfile.read(path)
    ref = data.astype(np.float32) / 32768.0

    got, sr = native.read_wav_f32(path)
    assert sr == sr_ref == 8000
    np.testing.assert_array_equal(got, ref)

    via_loader, sr2 = load_wav(path)
    assert sr2 == 8000
    np.testing.assert_array_equal(via_loader, ref)


def test_load_fortran_order_member(tmp_path):
    """Transposed-view members (fortran_order=True) decode correctly —
    for both f32 (memcpy fast path) and complex."""
    rng = np.random.default_rng(4)
    base = rng.standard_normal((40, 30)).astype(np.float32)
    arr = base.T  # (30, 40) fortran-ordered view
    carr = (base + 1j * base[::-1]).astype(np.complex64).T
    path = str(tmp_path / "f.npz")
    np.savez_compressed(path, mix=arr, cx=carr)

    out = np.zeros((64, 30), np.float32)
    tr, tc = native.load_npz_2d_transposed(path, "mix", out, mode=0)
    assert (tr, tc) == (40, 30)
    np.testing.assert_array_equal(out[:40], arr.T)

    mout = np.zeros((64, 30), np.float32)
    native.load_npz_2d_transposed(path, "cx", mout, mode=1)
    np.testing.assert_allclose(mout[:40], np.abs(carr).T, rtol=1e-6)


def test_wav_num_samples_matches_load():
    """Header-only length (streaming planner) == decoded length, for PCM16
    and float32 wavs and for non-RIFF files via the fallback."""
    import tempfile, os
    import numpy as np
    from scipy.io import wavfile
    from speech_separation_tpu.utils.audio import load_wav, wav_num_samples

    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(0)
        p16 = os.path.join(d, "a.wav")
        wavfile.write(p16, 8000, (rng.standard_normal(12345) * 8000
                                  ).astype(np.int16))
        pf32 = os.path.join(d, "b.wav")
        wavfile.write(pf32, 8000, rng.standard_normal(777).astype(np.float32))
        for p in (p16, pf32):
            assert wav_num_samples(p) == len(load_wav(p)[0])
