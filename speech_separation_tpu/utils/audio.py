"""Host-side audio I/O.

Replaces the reference's librosa.core.load / scipy wav writing
(reference: steps/extract_feats.py:74, steps/reconstruct_sources.py:41-42)
with a dependency-light loader built on scipy.io.wavfile:

- integer PCM is normalized to float32 the way librosa does it
  (int16 / 32768, int32 / 2**31, uint8 -> [-1, 1)), so features are
  numerically identical to the reference pipeline's.
- resampling (only needed when a file's rate differs from the target,
  which never happens for the 8 kHz "min" mixture corpora) uses
  polyphase filtering.
- writing uses the reference's exact convention: float * 32767 -> int16.
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly
from math import gcd


def load_wav(path: str, sr: int | None = None,
             offset: float = 0.0, duration: float | None = None
             ) -> tuple[np.ndarray, int]:
    """Load a wav file as float32 in [-1, 1), optionally resampled.

    Mirrors librosa.core.load(path, sr=sr, offset=..., duration=...) as used
    at reference steps/extract_feats.py:74 (mono sources; multi-channel is
    averaged to mono like librosa's default). Decoding goes through the
    native runtime when available (bit-identical, tested), scipy otherwise.
    """
    x = None
    try:
        from . import native
        got = native.read_wav_f32(path) if native.available() else None
        if got is not None:
            x, file_sr = got
    except Exception:
        x = None
    if x is None:
        file_sr, data = wavfile.read(path)
        if data.dtype == np.int16:
            x = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            x = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            x = (data.astype(np.float32) - 128.0) / 128.0
        else:  # float32 / float64 wavs are already normalized
            x = data.astype(np.float32)
        if x.ndim > 1:
            x = x.mean(axis=1)

    if offset or duration is not None:
        start = int(round(offset * file_sr))
        stop = len(x) if duration is None else start + int(round(duration * file_sr))
        x = x[start:stop]

    if sr is not None and sr != file_sr:
        g = gcd(sr, file_sr)
        x = resample_poly(x, sr // g, file_sr // g).astype(np.float32)
        file_sr = sr
    return x, file_sr


def wav_num_samples(path: str) -> int:
    """Per-channel sample count from the RIFF header alone (no data read).
    Used to order/bucket utterances for streaming separation without
    loading the audio; falls back to a full load on non-RIFF files."""
    import struct
    try:
        with open(path, "rb") as f:
            riff, _size, wave = struct.unpack("<4sI4s", f.read(12))
            if riff != b"RIFF" or wave != b"WAVE":
                raise ValueError("not RIFF/WAVE")
            block_align = None
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    raise ValueError("no data chunk")
                cid, csize = struct.unpack("<4sI", hdr)
                if cid == b"fmt ":
                    fmt = f.read(csize)
                    if csize & 1:  # RIFF pads odd chunks with one byte
                        f.seek(1, 1)
                    block_align = struct.unpack("<H", fmt[12:14])[0]
                elif cid == b"data":
                    if not block_align:
                        raise ValueError("data before fmt")
                    return csize // block_align
                else:
                    f.seek(csize + (csize & 1), 1)
    except (OSError, ValueError, struct.error):
        return len(load_wav(path)[0])


def write_wav_int16(path: str, sr: int, x: np.ndarray) -> None:
    """Write float waveform as int16 with the reference's x*32767 scaling
    (reference steps/reconstruct_sources.py:41-42), SATURATED at the int16
    range — byte-identical to the reference for in-range samples (the
    clip is a no-op), but a sample past +-1.0 clips instead of WRAPPING
    (the reference's bare astype turns a +1.1 peak into -0.9). Masked
    iSTFT tracks stay in range so the parity paths never hit the clip;
    SI-SNR-trained time-domain models emit arbitrarily-scaled tracks and
    regularly do — those writers should prefer limit_peak(), which keeps
    the waveform shape with one per-utterance gain."""
    y = np.asarray(x) * 32767.0
    wavfile.write(path, sr, np.clip(y, -32768.0, 32767.0).astype(np.int16))


def limit_peak(tracks, limit: float = 32767.0 / 32768.0) -> list:
    """One shared gain bringing every track of an utterance within the
    int16-representable range (no-op when already in range). Shared —
    not per-track — so relative inter-track loudness is preserved;
    BSS-eval/SI-SDR scoring is invariant to a per-source scale, so
    scores of the written wavs equal scores of the raw tracks."""
    peak = max((float(np.max(np.abs(t))) if len(t) else 0.0)
               for t in tracks)
    if peak <= limit:
        return list(tracks)
    g = limit / peak
    return [np.asarray(t) * g for t in tracks]


def separated_track_paths(out_dir: str, wav_path: str,
                          num_spk: int) -> list[str]:
    """Output naming convention shared by `sepsep separate` and the
    resident server: ``<out_dir>/<input stem>_s<k>.wav`` per source."""
    import os
    stem = os.path.splitext(os.path.basename(wav_path))[0]
    return [os.path.join(out_dir, f"{stem}_s{s + 1}.wav")
            for s in range(num_spk)]
