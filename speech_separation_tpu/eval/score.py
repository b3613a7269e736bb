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


def _score_one(args):
    utt, mix_path, num_src, est_dir = args
    oracle, est = None, None
    source_length = None
    mix = None
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
    mix = mix[:source_length]

    sdr, sir, sar, perm = bss_eval_sources(oracle, est)
    sisdr = np.array([si_sdr(est[k], oracle[perm[k]]) for k in range(num_src)])
    sisdri = np.array([si_sdr_improvement(est[k], oracle[perm[k]], mix)
                       for k in range(num_src)])
    return utt, sdr, sir, sar, sisdr, sisdri


def _write_stats(path: str, values: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write(f"Mean:\t{np.mean(values)}\n")
        f.write(f"Std:\t{np.std(values)}\n")
        f.write(f"Max:\t{np.amax(values)}\n")
        f.write(f"Min:\t{np.amin(values)}\n")


def evaluate_sources(data_dir: str, exp_dir: str, num_workers: int = 0,
                     log=print) -> dict:
    """Score exp_dir/wav against the oracle sources of data_dir.
    Returns {'SDR': mean, 'SIR': ..., 'SAR': ..., 'SI-SDR': ..., 'SI-SDRi': ...}."""
    results_dir = os.path.join(exp_dir, "results")
    os.makedirs(results_dir, exist_ok=True)
    num_src_dict = read_utt2num_spk(os.path.join(data_dir, "utt2num_spk"))
    entries = read_scp(os.path.join(data_dir, "wav.scp"))
    est_dir = os.path.join(exp_dir, "wav")

    jobs = [(utt, path, num_src_dict[utt], est_dir) for utt, path in entries]
    if num_workers and num_workers > 1:
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
    log(" ".join(f"mean {k}: {v:.2f}" for k, v in means.items()))
    return means
