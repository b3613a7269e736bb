"""Data-parallel device BSS-eval on the 8-device virtual CPU mesh.

Every BSS-eval quantity (Grams, projections, the permutation search) is
per-utterance, so sharding the batch axis over the mesh's 'data' axis must
reproduce single-device results exactly (same two-float arithmetic per
row). Pinned here, including the pad-to-device-multiple rule for batch
sizes that don't divide the mesh.
"""

import numpy as np

from speech_separation_tpu.eval.bss_eval_jax import bss_eval_sources_batch
from speech_separation_tpu.parallel.mesh import make_mesh


def _cases(B=5, n=2, L=4000, seed=3):
    rng = np.random.default_rng(seed)
    refs = np.zeros((B, n, L), np.float32)
    ests = np.zeros((B, n, L), np.float32)
    for b in range(B):
        # AR(0.9) sources (correlated, conditions the Gram realistically)
        e = rng.standard_normal((n, L)).astype(np.float32)
        s = np.copy(e)
        for t in range(1, L):
            s[:, t] += 0.9 * s[:, t - 1]
        refs[b] = s * 0.05
        mix = 0.6 * s[0] + 0.4 * s[1]
        ests[b, 0] = 0.8 * s[0] + 0.2 * mix
        ests[b, 1] = 0.8 * s[1] + 0.2 * mix
    return refs, ests


def test_mesh_scoring_matches_single_device():
    refs, ests = _cases(B=5)  # 5 rows: exercises pad-to-multiple (5 -> 8)
    sdr1, sir1, sar1, perm1 = bss_eval_sources_batch(refs, ests)
    sdr8, sir8, sar8, perm8 = bss_eval_sources_batch(refs, ests,
                                                     mesh=make_mesh())
    assert sdr8.shape == sdr1.shape == (5, 2)
    np.testing.assert_array_equal(perm1, perm8)
    for a, b in zip((sdr1, sir1, sar1), (sdr8, sir8, sar8)):
        np.testing.assert_allclose(a, b, atol=1e-4)
        assert np.all(np.isfinite(a))


def test_mesh_scoring_chunked():
    """max_batch scales by the mesh size and ragged chunks pad to a device
    multiple; outputs must still match the unchunked single-device run."""
    refs, ests = _cases(B=6)
    sdr1, sir1, sar1, _ = bss_eval_sources_batch(refs, ests)
    # per-chip max_batch=1 -> global chunk of 8 on the 8-device mesh;
    # B=6 pads by repeating rows, repeats dropped from the outputs
    sdr8, sir8, sar8, _ = bss_eval_sources_batch(refs, ests, max_batch=1,
                                                 mesh=make_mesh())
    assert sdr8.shape == (6, 2)
    for a, b in zip((sdr1, sir1, sar1), (sdr8, sir8, sar8)):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_evaluate_sources_data_parallel(tmp_path):
    """The full on-disk scoring sweep with data_parallel=True produces the
    same result files as the single-device device path."""
    from speech_separation_tpu.eval.score import evaluate_sources
    from speech_separation_tpu.utils.audio import write_wav_int16

    refs, ests = _cases(B=4, L=3000)
    data = tmp_path / "data"
    data.mkdir()
    for which in ("dev", "dp"):
        (tmp_path / which / "wav").mkdir(parents=True)
    with open(data / "wav.scp", "w") as scp, \
         open(data / "utt2num_spk", "w") as u2n:
        for b in range(4):
            utt = f"utt{b}"
            mixdir = tmp_path / "corpus" / "mix"
            mixdir.mkdir(parents=True, exist_ok=True)
            mp = str(mixdir / f"{utt}.wav")
            write_wav_int16(mp, 8000, refs[b].sum(axis=0))
            for s in range(2):
                sdir = tmp_path / "corpus" / f"s{s + 1}"
                sdir.mkdir(exist_ok=True)
                write_wav_int16(str(sdir / f"{utt}.wav"), 8000, refs[b, s])
            scp.write(f"{utt} {mp}\n")
            u2n.write(f"{utt} 2\n")
        for which in ("dev", "dp"):
            for b in range(4):
                for s in range(2):
                    d = tmp_path / which / "wav" / f"s{s + 1}"
                    d.mkdir(parents=True, exist_ok=True)
                    write_wav_int16(str(d / f"utt{b}.wav"), 8000, ests[b, s])

    logs = []
    m_dev = evaluate_sources(str(data), str(tmp_path / "dev"), device=True,
                             log=logs.append)
    m_dp = evaluate_sources(str(data), str(tmp_path / "dp"), device=True,
                            data_parallel=True, log=logs.append)
    for k in m_dev:
        assert abs(m_dev[k] - m_dp[k]) < 1e-3, (k, m_dev[k], m_dp[k])


def test_oracle_data_parallel_matches_single(tmp_path):
    """Oracle device scoring with data_parallel=True writes the same
    result files as the single-device device path."""
    import os
    from speech_separation_tpu.dsp.stft import STFTConfig
    from speech_separation_tpu.eval.oracle import evaluate_oracle
    from speech_separation_tpu.utils.audio import write_wav_int16

    refs, _ = _cases(B=4, L=3000)
    for which in ("a", "b"):
        d = tmp_path / which
        (d / "corpus" / "mix").mkdir(parents=True)
        with open(d / "wav.scp", "w") as scp:
            for b in range(4):
                mp = str(d / "corpus" / "mix" / f"u{b}.wav")
                write_wav_int16(mp, 8000, refs[b].sum(axis=0))
                for s in range(2):
                    sd = d / "corpus" / f"s{s + 1}"
                    sd.mkdir(exist_ok=True)
                    write_wav_int16(str(sd / f"u{b}.wav"), 8000, refs[b, s])
                scp.write(f"u{b} {mp}\n")

    logs = []
    evaluate_oracle(str(tmp_path / "a"), device=True, log=logs.append)
    evaluate_oracle(str(tmp_path / "b"), device=True, data_parallel=True,
                    log=logs.append)
    for fn in ("session_SDRs.txt", "source_SDRs.txt"):
        one = open(tmp_path / "a" / "oracle_soft_mask_eval" / fn).read()
        two = open(tmp_path / "b" / "oracle_soft_mask_eval" / fn).read()
        a_vals = [float(x) for line in one.splitlines()
                  for x in line.split()[1:]]
        b_vals = [float(x) for line in two.splitlines()
                  for x in line.split()[1:]]
        assert len(a_vals) == len(b_vals) > 0
        for va, vb in zip(a_vals, b_vals):
            assert abs(va - vb) < 1e-3
