"""Scoring: BSS-eval over estimated vs oracle sources, reference file formats.

Reimplements steps/evaluate_sources.py: for each utterance in wav.scp, load
the oracle sources by the /mix/ -> /s<i>/ path substitution (:49), truncate
everything to the first estimate's length (:52-56), run BSS-eval with
permutation search (:57), and write

  results/session_{SDR,SIR,SAR}s.txt   per-utterance mean over sources
  results/source_{SDR,SIR,SAR}s.txt    per-utterance per-source values
  results/{SDR,SIR,SAR}_stats.txt      Mean/Std/Max/Min over all sources

plus (a framework addition) SI-SDR / SI-SDRi equivalents. Utterances are
scored in parallel worker processes — the host-side analog of the
reference's nj-sharded array jobs.
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from ..datadir.scp import read_scp, read_utt2num_spk
from ..utils.audio import load_wav
from .bss_eval import bss_eval_sources, si_sdr, si_sdr_improvement


def _load_case(utt, mix_path, num_src, est_dir):
    """(oracle (n, L), est (n, L), mix (L,)) truncated to the first
    estimate's length (reference evaluate_sources.py:52-56)."""
    oracle = est = None
    source_length = None
    for s in range(num_src):
        o, _ = load_wav(mix_path.replace("/mix/", f"/s{s + 1}/"))
        e, _ = load_wav(os.path.join(est_dir, f"s{s + 1}", utt + ".wav"))
        if s == 0:
            source_length = len(e)
            oracle = np.zeros((num_src, source_length))
            est = np.zeros((num_src, source_length))
        oracle[s] = o[:source_length]
        est[s] = e[:source_length]
    mix, _ = load_wav(mix_path)
    return oracle, est, mix[:source_length]


def _si_metrics(oracle, est, mix, perm):
    num_src = oracle.shape[0]
    sisdr = np.array([si_sdr(est[k], oracle[perm[k]]) for k in range(num_src)])
    sisdri = np.array([si_sdr_improvement(est[k], oracle[perm[k]], mix)
                       for k in range(num_src)])
    return sisdr, sisdri


def _score_one(args):
    utt, mix_path, num_src, est_dir = args
    oracle, est, mix = _load_case(utt, mix_path, num_src, est_dir)
    sdr, sir, sar, perm = bss_eval_sources(oracle, est)
    sisdr, sisdri = _si_metrics(oracle, est, mix, perm)
    return utt, sdr, sir, sar, sisdr, sisdri


def _case_int16(x: np.ndarray) -> np.ndarray | None:
    """Exact int16 repacking of one utterance's float audio when every
    sample is k/32768 (true for un-resampled PCM16 wavs, which is what the
    pipeline writes); None if any sample is inexact."""
    y = np.rint(x * 32768.0)
    if (np.all(y >= -32768.0) and np.all(y < 32768.0)
            and np.array_equal(y / 32768.0, x)):
        return y.astype(np.int16)
    return None


def _maybe_int16(x: np.ndarray) -> np.ndarray:
    """Slab-level variant: int16 repack when the whole array is exact,
    else unchanged. Used by the oracle path, where refs (PCM16 sources)
    and ests (masked-iSTFT floats) legitimately differ in packability."""
    y = _case_int16(x)
    return x if y is None else y


def _score_device(jobs, log, slab: int = 64, pad_quantum: int = 8000,
                  mesh=None):
    """Batched TPU scoring (eval/bss_eval_jax.py, two-float arithmetic —
    within 0.1 dB of the host f64 scorer; tests/test_bss_eval_jax.py).
    Utterances are grouped by source count and padded length (zero padding
    is metric-exact; the quantum bounds the number of compiled shapes) and
    scored in slabs; SI-SDR stays on the host (cheap).

    Host I/O overlaps device compute: loader threads read slab N+1..N+2
    while slab N scores on the device (the train pipeline's prefetch
    pattern, train/data.py) — without it the measured 3k sweep was I/O
    bound at ~18 utts/s against ~40 utts/s device-side
    (tools/bench_device_scoring.py).

    PCM16 material ships as int16 — half the transfer bytes (the metrics
    are scale-invariant). The repacking check runs per utterance during
    slab assembly, and the transport dtype is sticky per run: the first
    inexact utterance downgrades the rest of the run to float32, so at
    most one extra compile per shape (not one per dtype flip)."""
    from concurrent.futures import ThreadPoolExecutor
    from .bss_eval_jax import bss_eval_sources_batch, default_max_batch

    from ..utils.audio import wav_num_samples

    by_count: dict[int, list] = {}
    for job in jobs:
        by_count.setdefault(job[2], []).append(job)
    # flat slab list so the prefetcher runs ahead across group boundaries;
    # each slab holds bounded host memory (load -> score -> discard).
    # Groups are length-sorted (RIFF headers, no audio read) before
    # slabbing: mixed-length slabs would all pad to the corpus max, and
    # BSS-eval work scales ~linearly with padded length — on a 3-5 s
    # corpus sorting cuts ~25% of the padded FLOPs
    hdr_len = {job[0]: wav_num_samples(
        os.path.join(job[3], "s1", job[0] + ".wav")) for job in jobs}
    # Shape policy: every distinct padded length compiles its own XLA
    # program (~30 s on the TPU backend, and the persistent compile cache
    # does not engage there — docs/performance.md).  On small corpora the
    # extra compiles cost more than the padded-FLOP waste they avoid, so
    # pad everything to ONE corpus-level length; past the breakeven
    # (~10k utts at 30 s/compile vs ~25% FLOP waste on a 3-5 s corpus)
    # switch to per-slab quantized lengths.
    try:
        single_shape_max = int(
            os.environ.get("SEPSEP_SCORE_SINGLE_SHAPE_MAX", "10000"))
    except ValueError:
        log("note: ignoring malformed SEPSEP_SCORE_SINGLE_SHAPE_MAX "
            f"({os.environ['SEPSEP_SCORE_SINGLE_SHAPE_MAX']!r}); using 10000")
        single_shape_max = 10000
    single_shape = len(jobs) <= single_shape_max
    global_pad = ((max(hdr_len.values()) + pad_quantum - 1)
                  // pad_quantum) * pad_quantum if single_shape else None

    n_data = mesh.shape["data"] if mesh is not None and mesh.size > 1 else 1
    slabs = []
    for num_src, group in by_count.items():
        group = sorted(group, key=lambda job: hdr_len[job[0]])
        # Device chunk for this group (per-chip rows x mesh data axis),
        # from the best length estimate each shape regime has; slabs are a
        # whole number of chunks so full slabs split with no ragged tail.
        len_est = global_pad if global_pad is not None else (
            (max(hdr_len[j[0]] for j in group) + pad_quantum - 1)
            // pad_quantum * pad_quantum)
        mb_chip = default_max_batch(num_src, len_est)
        mb = mb_chip * n_data
        step = mb * max(1, slab // mb)
        # Row-pad ragged tails up to the chunk ONLY when this group runs at
        # least one full chunk (so the padded tail reuses that warm
        # executable). A group smaller than one chunk would pay BOTH a
        # fresh full-chunk compile and up to mb/B x wasted FLOPs — e.g. a
        # 4-utterance set padded to a 512-row chunk on an 8-device mesh.
        pad = len(group) >= mb
        for s in range(0, len(group), step):
            slabs.append((num_src, group[s: s + step], mb_chip, pad))

    def load_slab(num_src, chunk):
        return [_load_case(utt, mp, num_src, ed) for utt, mp, _n, ed in chunk]

    transport_int16 = True  # sticky: one inexact utterance downgrades

    def pack_slabs(cases, num_src):
        nonlocal transport_int16
        Lmax = max(c[0].shape[1] for c in cases)
        Lpad = ((Lmax + pad_quantum - 1) // pad_quantum) * pad_quantum
        if global_pad is not None:
            Lpad = max(Lpad, global_pad)  # hdr fallback can under-read
        if transport_int16:
            packed = []
            for oracle, est, _mix in cases:
                o16, e16 = _case_int16(oracle), _case_int16(est)
                if o16 is None or e16 is None:
                    transport_int16 = False
                    break
                packed.append((o16, e16))
            if transport_int16:
                refs = np.zeros((len(cases), num_src, Lpad), np.int16)
                ests = np.zeros((len(cases), num_src, Lpad), np.int16)
                for i, (o16, e16) in enumerate(packed):
                    refs[i, :, : o16.shape[1]] = o16
                    ests[i, :, : e16.shape[1]] = e16
                return refs, ests
        refs = np.zeros((len(cases), num_src, Lpad), np.float32)
        ests = np.zeros((len(cases), num_src, Lpad), np.float32)
        for i, (oracle, est, _mix) in enumerate(cases):
            refs[i, :, : oracle.shape[1]] = oracle
            ests[i, :, : est.shape[1]] = est
        return refs, ests

    import time as _time

    results = []
    t_sweep0 = _time.monotonic()
    t_loadwait = t_pack = t_dev = t_post = 0.0
    t_dev_first = None  # first slab carries the compile
    with ThreadPoolExecutor(max_workers=2) as pool:
        depth = 2
        futs = [pool.submit(load_slab, slabs[k][0], slabs[k][1])
                for k in range(min(depth, len(slabs)))]
        for k, (num_src, chunk, mb_chip, pad) in enumerate(slabs):
            t0 = _time.monotonic()
            cases = futs[k].result()
            t_loadwait += _time.monotonic() - t0
            if k + depth < len(slabs):
                futs.append(pool.submit(load_slab, slabs[k + depth][0],
                                        slabs[k + depth][1]))
            t0 = _time.monotonic()
            refs, ests = pack_slabs(cases, num_src)
            t_pack += _time.monotonic() - t0
            t0 = _time.monotonic()
            # pad_to_chunk (gated at slab construction): a slab smaller
            # than one device chunk (the tail of a group) row-pads to chunk
            # size and reuses the group's warm executable instead of
            # compiling an exact-shape program; max_batch is pinned to the
            # group-level chunk so every slab of a group chunks identically
            sdr, sir, sar, perm = bss_eval_sources_batch(
                refs, ests, mesh=mesh, max_batch=mb_chip, pad_to_chunk=pad)
            dt = _time.monotonic() - t0
            t_dev += dt
            if t_dev_first is None:
                t_dev_first = dt
            t0 = _time.monotonic()
            n_host = 0
            for i, ((utt, *_r), (oracle, est, mix)) in enumerate(
                    zip(chunk, cases)):
                finite = (np.all(np.isfinite(sdr[i]))
                          and np.all(np.isfinite(sir[i]))
                          and np.all(np.isfinite(sar[i])))
                if finite:
                    sisdr, sisdri = _si_metrics(oracle, est, mix, perm[i])
                    results.append((utt, sdr[i], sir[i], sar[i],
                                    sisdr, sisdri))
                else:
                    # f32 could not resolve this utterance's Gram (the
                    # device path NaN-poisons untrusted solves); rescore
                    # in float64 on the host
                    results.append(_score_one((utt, *_r)))
                    n_host += 1
            futs[k] = None  # release the slab's cases
            t_post += _time.monotonic() - t0
            log(f"scored {len(results)}/{len(jobs)} on device"
                + (f" ({n_host} host-f64 fallbacks)" if n_host else ""))
    total = _time.monotonic() - t_sweep0
    log(f"device scoring anatomy: total {total:.1f}s = load-wait "
        f"{t_loadwait:.1f} + pack {t_pack:.1f} + device {t_dev:.1f} "
        f"(first slab incl. compile {t_dev_first or 0:.1f}) + "
        f"host-SI/fallback {t_post:.1f}")
    order = {job[0]: i for i, job in enumerate(jobs)}
    return sorted(results, key=lambda r: order[r[0]])


def _write_stats(path: str, values: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write(f"Mean:\t{np.mean(values)}\n")
        f.write(f"Std:\t{np.std(values)}\n")
        f.write(f"Max:\t{np.amax(values)}\n")
        f.write(f"Min:\t{np.amin(values)}\n")


def evaluate_sources(data_dir: str, exp_dir: str, num_workers: int = 0,
                     device: bool = False, data_parallel: bool = False,
                     log=print) -> dict:
    """Score exp_dir/wav against the oracle sources of data_dir.
    Returns {'SDR': mean, 'SIR': ..., 'SAR': ..., 'SI-SDR': ..., 'SI-SDRi': ...}.

    device=True runs BSS-eval batched on the accelerator (the fast path
    for large test sets; two-float arithmetic, within 0.1 dB of the host
    float64 scorer — see eval/bss_eval_jax.py). data_parallel=True
    additionally shards each scoring slab over all visible devices
    (per-utterance metric — zero collectives)."""
    results_dir = os.path.join(exp_dir, "results")
    os.makedirs(results_dir, exist_ok=True)
    num_src_dict = read_utt2num_spk(os.path.join(data_dir, "utt2num_spk"))
    entries = read_scp(os.path.join(data_dir, "wav.scp"))
    est_dir = os.path.join(exp_dir, "wav")

    jobs = [(utt, path, num_src_dict[utt], est_dir) for utt, path in entries]
    if device:
        mesh = None
        if data_parallel:
            from ..parallel.mesh import data_parallel_mesh
            mesh = data_parallel_mesh(log)
        results = _score_device(jobs, log, mesh=mesh)
    elif num_workers and num_workers > 1:
        import multiprocessing as mp
        ctx = mp.get_context("spawn")  # never fork initialized JAX state
        with ProcessPoolExecutor(max_workers=num_workers, mp_context=ctx) as pool:
            results = list(pool.map(_score_one, jobs, chunksize=4))
    else:
        results = [_score_one(j) for j in jobs]

    metrics = {"SDR": [], "SIR": [], "SAR": [], "SI-SDR": [], "SI-SDRi": []}
    files = {}
    for name in metrics:
        files[f"session_{name}"] = open(
            os.path.join(results_dir, f"session_{name}s.txt"), "w")
        files[f"source_{name}"] = open(
            os.path.join(results_dir, f"source_{name}s.txt"), "w")

    for utt, sdr, sir, sar, sisdr, sisdri in results:
        for name, vals in (("SDR", sdr), ("SIR", sir), ("SAR", sar),
                           ("SI-SDR", sisdr), ("SI-SDRi", sisdri)):
            files[f"session_{name}"].write(f"{utt} {sum(vals) / len(vals)}\n")
            files[f"source_{name}"].write(
                utt + "".join(f" {v}" for v in vals) + "\n")
            metrics[name].extend(float(v) for v in vals)
    for f in files.values():
        f.close()

    means = {}
    for name, vals in metrics.items():
        vals = np.asarray(vals)
        _write_stats(os.path.join(results_dir, f"{name}_stats.txt"), vals)
        means[name] = float(np.mean(vals))
    # machine-readable companion to the reference's txt files (an addition;
    # the txt formats above remain the compatibility surface)
    import json
    with open(os.path.join(results_dir, "summary.json"), "w") as f:
        json.dump({"n_utts": len(entries), "mean": means,
                   "scorer": "device-two-float" if device else "host-f64"},
                  f, indent=1)
    log(" ".join(f"mean {k}: {v:.2f}" for k, v in means.items()))
    return means
