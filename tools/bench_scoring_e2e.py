#!/usr/bin/env python3
"""End-to-end device-scoring benchmark (VERDICT round-2 next #4).

Measures the REAL `evaluate_sources(device=True)` path on an on-disk
corpus: wav decode + /mix/ -> /s<i>/ oracle resolution + slab assembly
(int16 transport) + batched two-float BSS-eval on the device + SI-SDR on
the host + result-file writing — i.e. everything a user's `sepsep score
--device-scoring` does. The loader threads in eval/score.py overlap file
I/O with device compute; this harness is the evidence for the ">=30
utts/s end-to-end" target (round-2 baseline: 18.3 utts/s with serial
loading).

Usage: python tools/bench_scoring_e2e.py [--n 3000] [--work /tmp/sepsep_score3k]
       [--reuse] [--host-n 0 (also time the host-f64 path on a subset)]
Writes <work>/RESULTS_scoring.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

LENGTHS = (24000, 32000, 32000, 40000)  # 3-5 s at 8 kHz, prior-sweep mix


def synthesize(work, n):
    """On-disk corpus: data/wav.scp + corpus/{mix,s1,s2} + exp/wav/{s1,s2}.
    AR(0.9) sources; estimates = lightly remixed sources + noise (the same
    non-trivial material as tools/bench_device_scoring.py), all PCM16."""
    from scipy.signal import lfilter
    from speech_separation_tpu.utils.audio import write_wav_int16

    rng = np.random.default_rng(0)
    corpus = os.path.join(work, "corpus")
    est_dir = os.path.join(work, "exp", "wav")
    data_dir = os.path.join(work, "data")
    for sub in ("mix", "s1", "s2"):
        os.makedirs(os.path.join(corpus, sub), exist_ok=True)
    for sub in ("s1", "s2"):
        os.makedirs(os.path.join(est_dir, sub), exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)

    t0 = time.time()
    with open(os.path.join(data_dir, "wav.scp"), "w") as scp, \
         open(os.path.join(data_dir, "utt2num_spk"), "w") as ns:
        for i in range(n):
            L = LENGTHS[i % len(LENGTHS)]
            e = rng.standard_normal((2, L))
            src = lfilter([1.0], [1.0, -0.9], e, axis=-1)
            src = (0.2 * src / np.abs(src).max()).astype(np.float32)
            mixmat = (np.eye(2) + 0.1 * rng.standard_normal((2, 2))
                      ).astype(np.float32)
            est = mixmat @ src + 0.02 * rng.standard_normal((2, L)).astype(np.float32)
            utt = f"u{i:05d}"
            for s in range(2):
                write_wav_int16(os.path.join(corpus, f"s{s + 1}",
                                             utt + ".wav"), 8000, src[s])
                write_wav_int16(os.path.join(est_dir, f"s{s + 1}",
                                             utt + ".wav"), 8000, est[s])
            write_wav_int16(os.path.join(corpus, "mix", utt + ".wav"),
                            8000, src.sum(0))
            scp.write(f"{utt} {corpus}/mix/{utt}.wav\n")
            ns.write(f"{utt} 2\n")
            if (i + 1) % 500 == 0:
                print(f"  synthesized {i + 1}/{n}", flush=True)
    print(f"synthesis: {time.time() - t0:.0f}s")
    return data_dir, os.path.join(work, "exp")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3000)
    ap.add_argument("--work", default="/tmp/sepsep_score3k")
    ap.add_argument("--reuse", action="store_true")
    ap.add_argument("--host-n", type=int, default=0,
                    help="also time the host f64 path on the first N utts")
    args = ap.parse_args()

    from speech_separation_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    data_dir = os.path.join(args.work, "data")
    exp_dir = os.path.join(args.work, "exp")
    if not (args.reuse and os.path.isfile(os.path.join(data_dir, "wav.scp"))):
        data_dir, exp_dir = synthesize(args.work, args.n)

    from speech_separation_tpu.eval.score import evaluate_sources

    print("device-scored sweep ...", flush=True)
    t0 = time.time()
    means = evaluate_sources(data_dir, exp_dir, device=True)
    dev_s = time.time() - t0

    out = {"metric": "device scoring end-to-end (wav decode -> BSS-eval "
                     "-> result files)",
           "n_utts": args.n,
           "wall_s": round(dev_s, 1),
           "utts_per_sec": round(args.n / dev_s, 2),
           "means": {k: round(v, 3) for k, v in means.items()}}

    if args.host_n:
        sub_dir = os.path.join(args.work, "data_sub")
        os.makedirs(sub_dir, exist_ok=True)
        for name in ("wav.scp", "utt2num_spk"):
            with open(os.path.join(data_dir, name)) as f, \
                 open(os.path.join(sub_dir, name), "w") as g:
                for i, line in enumerate(f):
                    if i < args.host_n:
                        g.write(line)
        t0 = time.time()
        evaluate_sources(sub_dir, exp_dir, device=False)
        host_s = time.time() - t0
        out["host_f64_utts_per_sec"] = round(args.host_n / host_s, 2)
        out["speedup_vs_host"] = round(out["utts_per_sec"]
                                       / out["host_f64_utts_per_sec"], 1)

    print(json.dumps(out))
    with open(os.path.join(args.work, "RESULTS_scoring.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
