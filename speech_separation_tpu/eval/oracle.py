"""Oracle-mask upper-bound evaluation (reference steps/evaluate_oracle.py).

For every utterance: compute the mixture STFT and each source's magnitude
STFT, build the ideal mask — soft (IRM-like |S_i| / |mix|, reference
:137-139) or hard (argmax binary, :133-136) — resynthesize by masked iSTFT,
and score against the true sources with BSS-eval *without* permutation
search (:144). Writes session_/source_ SDR/SIR/SAR files under
``<data-dir>/oracle_{soft,hard}_mask_eval/`` with optional shard suffix,
plus the stats files the reference's evaluate_oracle.sh derives with awk
(:80-84).

Divergences from the reference, both deliberate:
- the reference's segments branch is broken (``rage`` typo :95,
  ``oracle_mask`` NameError :115 — SURVEY.md §7.7); segments are supported
  *correctly* here;
- the soft-mask division guards |mix| == 0 bins (the reference emits
  inf/nan there); real mixtures never hit exact zeros, synthetic ones can.

STFT/iSTFT run on device through the same batched kernels as the rest of
the framework.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..datadir.scp import read_scp, read_segments, source_wavs_for_mix
from ..dsp.stft import (STFTConfig, num_frames, reflect_pad_center,
                        stft_centered_batch, istft_batch, istft_output_length)
from ..utils.audio import load_wav
from .bss_eval import bss_eval_sources
from .score import _write_stats


def _stft_rows(signals: list[np.ndarray], cfg: STFTConfig):
    """Batched device STFT of a small group of signals; returns (re, im)
    lists of (T_i, F) arrays."""
    max_len = max(len(s) for s in signals)
    n_t = num_frames(max_len, cfg.hop)
    Lp = max_len + cfg.n_fft
    xp = np.zeros((len(signals), Lp), np.float32)
    for i, s in enumerate(signals):
        p = reflect_pad_center(s, cfg.n_fft)
        xp[i, : len(p)] = p
    re, im = stft_centered_batch(jnp.asarray(xp), cfg.n_fft, cfg.hop, n_t)
    re, im = np.asarray(re), np.asarray(im)
    out = []
    for i, s in enumerate(signals):
        T_i = num_frames(len(s), cfg.hop)
        out.append((re[i, :T_i], im[i, :T_i]))
    return out


def _score_oracle_slab(slab, log, pad_quantum: int = 8000, mesh=None):
    """Device-batched no-permutation BSS-eval of [(seg_id, oracle, est)]
    cases, grouped by source count and padded to a QUANTIZED slab max
    (zero padding is metric-exact; the quantum bounds the number of
    compiled shapes on variable-length sets, exactly like
    score._score_device — without it every slab would jit a fresh
    Gram/LU program and the 'fast path' would lose to the host loop).
    NaN-poisoned utterances (trust gate, eval/bss_eval_jax.py) are
    rescored on the host in f64. Returns {seg_id: (sdr, sir, sar)}."""
    from .bss_eval_jax import bss_eval_sources_batch
    from .score import _maybe_int16

    results = {}
    n_host = 0
    by_count: dict[int, list] = {}
    for case in slab:
        by_count.setdefault(case[1].shape[0], []).append(case)
    for n, group in by_count.items():
        Lmax = max(c[1].shape[1] for c in group)
        Lpad = ((Lmax + pad_quantum - 1) // pad_quantum) * pad_quantum
        refs = np.zeros((len(group), n, Lpad), np.float32)
        ests = np.zeros((len(group), n, Lpad), np.float32)
        for i, (_sid, oracle, est) in enumerate(group):
            refs[i, :, : oracle.shape[1]] = oracle
            ests[i, :, : est.shape[1]] = est
        sdr, sir, sar, _ = bss_eval_sources_batch(
            _maybe_int16(refs), _maybe_int16(ests), compute_permutation=False,
            mesh=mesh)
        for i, (sid, oracle, est) in enumerate(group):
            if (np.all(np.isfinite(sdr[i])) and np.all(np.isfinite(sir[i]))
                    and np.all(np.isfinite(sar[i]))):
                results[sid] = (sdr[i], sir[i], sar[i])
            else:
                h_sdr, h_sir, h_sar, _ = bss_eval_sources(
                    oracle, est, compute_permutation=False)
                results[sid] = (h_sdr, h_sir, h_sar)
                n_host += 1
    log(f"oracle: scored {len(slab)} on device"
        + (f" ({n_host} host-f64 fallbacks)" if n_host else ""))
    return results


def evaluate_oracle(data_dir: str, hard_mask: bool = False,
                    cfg: STFTConfig = STFTConfig(),
                    job_suffix: str = "", device: bool = False,
                    data_parallel: bool = False,
                    slab: int = 32, log=print) -> None:
    """device=True scores slab-wise on the accelerator (two-float
    BSS-eval, eval/bss_eval_jax.py) instead of per-utterance host f64 —
    the fast path for large sets, same trust-gated fallback as
    evaluate_sources. data_parallel=True additionally shards each slab
    over all visible devices (per-utterance metric, zero collectives)."""
    kind = "hard" if hard_mask else "soft"
    dir_out = os.path.join(data_dir, f"oracle_{kind}_mask_eval")
    os.makedirs(dir_out, exist_ok=True)

    seg_path = os.path.join(data_dir, "segments" + job_suffix)
    segments = read_segments(seg_path) if os.path.isfile(seg_path) else None

    session_files = {m: open(os.path.join(dir_out, f"session_{m}s.txt" + job_suffix), "w")
                     for m in ("SDR", "SIR", "SAR")}
    source_files = {m: open(os.path.join(dir_out, f"source_{m}s.txt" + job_suffix), "w")
                    for m in ("SDR", "SIR", "SAR")}

    mesh = None
    if device and data_parallel:
        from ..parallel.mesh import data_parallel_mesh
        mesh = data_parallel_mesh(log)

    pending: list = []   # device mode: [(seg_id, oracle, est)] up to slab

    def emit(seg_id, num_src, sdr, sir, sar):
        for m, vals in (("SDR", sdr), ("SIR", sir), ("SAR", sar)):
            session_files[m].write(f"{seg_id} {sum(vals) / num_src}\n")
            source_files[m].write(
                seg_id + "".join(f" {v}" for v in vals) + "\n")

    def flush():
        if not pending:
            return
        results = _score_oracle_slab(pending, log, mesh=mesh)
        for sid, oracle, _est in pending:
            sdr, sir, sar = results[sid]
            emit(sid, oracle.shape[0], sdr, sir, sar)
        pending.clear()

    for reco_id, mix_path in read_scp(os.path.join(data_dir, "wav.scp" + job_suffix)):
        wav_files = source_wavs_for_mix(mix_path)
        num_src = max(len(wav_files) - 1, 1)
        seg_list = (segments.get(reco_id, []) if segments is not None
                    else [(reco_id, 0.0, None)])

        for seg_id, t0, t1 in seg_list:
            duration = None if t1 is None else t1 - t0
            signals = [load_wav(w, sr=cfg.sample_rate, offset=t0,
                                duration=duration)[0] for w in wav_files]
            mix_audio, sources_audio = signals[0], signals[1:]
            if not sources_audio:
                sources_audio = [mix_audio]
            specs = _stft_rows(signals, cfg)
            (mix_re, mix_im), src_specs = specs[0], specs[1:]
            if not src_specs:
                src_specs = [specs[0]]

            mags = np.stack([np.sqrt(r * r + i * i) for r, i in src_specs])
            mix_mag = np.sqrt(mix_re ** 2 + mix_im ** 2)
            if hard_mask:
                winner = np.argmax(mags, axis=0)
                masks = np.stack([(winner == i).astype(np.float32)
                                  for i in range(len(src_specs))])
            else:
                masks = np.divide(mags, mix_mag[None],
                                  out=np.zeros_like(mags),
                                  where=mix_mag[None] > 0)

            T_i = mix_re.shape[0]
            counts = np.full((len(src_specs),), T_i, np.int32)
            y = np.asarray(istft_batch(
                jnp.asarray(masks * mix_re[None]),
                jnp.asarray(masks * mix_im[None]),
                jnp.asarray(counts), hop=cfg.hop))
            half = cfg.n_fft // 2
            out_len = istft_output_length(T_i, cfg.hop)

            source_length = len(mix_audio)
            oracle = np.zeros((num_src, source_length))
            est = np.zeros((num_src, source_length))
            for i in range(num_src):
                oracle[i] = sources_audio[i][:source_length]
                est[i, :out_len] = y[i, half: half + out_len]

            if device:
                pending.append((seg_id, oracle, est))
                if len(pending) >= slab:
                    flush()
            else:
                sdr, sir, sar, _ = bss_eval_sources(
                    oracle, est, compute_permutation=False)
                emit(seg_id, num_src, sdr, sir, sar)

    flush()
    for f in (*session_files.values(), *source_files.values()):
        f.close()
    log(f"oracle {kind}-mask eval -> {dir_out}")


def merge_oracle_shards(data_dir: str, hard_mask: bool, num_shards: int) -> dict:
    """Merge per-shard result files (sorted, like evaluate_oracle.sh:62-70)
    and write the Mean/Std/Max/Min stats files (:80-84).
    Returns mean metrics."""
    kind = "hard" if hard_mask else "soft"
    dir_out = os.path.join(data_dir, f"oracle_{kind}_mask_eval")
    means = {}
    for m in ("SDR", "SIR", "SAR"):
        for prefix in ("session", "source"):
            name = f"{prefix}_{m}s.txt"
            lines = []
            for i in range(1, num_shards + 1):
                shard = os.path.join(dir_out, name + (f".{i}" if num_shards > 1 else ""))
                if os.path.isfile(shard):
                    with open(shard) as f:
                        lines.extend(f.readlines())
            lines.sort()
            with open(os.path.join(dir_out, name), "w") as f:
                f.writelines(lines)
        values = []
        with open(os.path.join(dir_out, f"source_{m}s.txt")) as f:
            for line in f:
                values.extend(float(v) for v in line.split()[1:])
        values = np.asarray(values)
        _write_stats(os.path.join(dir_out, f"{m}_stats.txt"), values)
        means[m] = float(np.mean(values))
    return means
