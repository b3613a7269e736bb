#!/usr/bin/env python3
"""Benchmark the device BSS-eval scorer on a large synthetic sweep.

Measures eval/bss_eval_jax.py (two-float arithmetic, the documented fast
path for large test sets — VERDICT round-1 item 8) against the host f64
scorer (eval/bss_eval.py, the reference-equivalent of mir_eval at
steps/evaluate_sources.py:57) on N synthetic 2-source utterances of
mixed lengths, and reports utts/sec plus the max |device - host| metric
deviation on a spot-checked subset.

Usage: python tools/bench_device_scoring.py [--n 3000] [--host-n 12]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from speech_separation_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from speech_separation_tpu.eval.bss_eval import bss_eval_sources
from speech_separation_tpu.eval.bss_eval_jax import bss_eval_sources_batch


def make_case(rng, L, n=2):
    """Correlated-ish material: AR(0.9) sources, estimates = mixtures of
    sources + noise (so SIR/SAR are non-trivial)."""
    from scipy.signal import lfilter
    e = rng.standard_normal((n, L))
    src = lfilter([1.0], [1.0, -0.9], e, axis=-1).astype(np.float32)
    mixmat = np.eye(n, dtype=np.float32) + 0.1 * rng.standard_normal((n, n)).astype(np.float32)
    est = mixmat @ src + 0.02 * rng.standard_normal((n, L)).astype(np.float32)
    return src, est


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3000)
    ap.add_argument("--host-n", type=int, default=12,
                    help="subset re-scored on the host for accuracy + rate")
    ap.add_argument("--lengths", type=str, default="24000,32000,32000,40000",
                    help="cycle of utterance lengths (samples at 8 kHz)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    lengths = [int(x) for x in args.lengths.split(",")]
    Lmax = max(lengths)

    # pre-generate in padded slabs, grouped by length (as eval/score.py
    # does by padding each slab to its quantized max)
    print(f"generating {args.n} utterances ...", flush=True)
    refs = np.zeros((args.n, 2, Lmax), np.float32)
    ests = np.zeros((args.n, 2, Lmax), np.float32)
    for i in range(args.n):
        L = lengths[i % len(lengths)]
        r, e = make_case(rng, L)
        refs[i, :, :L] = r
        ests[i, :, :L] = e

    # warm the sweep's ACTUAL compiled shape (the internal max_batch
    # chunk) untimed — a tiny-slice warm-up would leave the real chunk
    # shape compiling inside the timed region
    from speech_separation_tpu.eval.bss_eval_jax import default_max_batch
    mb = default_max_batch(2, Lmax)
    bss_eval_sources_batch(refs[:mb], ests[:mb])
    t0 = time.time()
    sdr, sir, sar, perm = bss_eval_sources_batch(refs, ests)
    dev_s = time.time() - t0
    # trust-gate fallbacks are NaN-poisoned; -inf (e.g. silent sources)
    # is a legitimate score, not a fallback
    n_nan = int(np.sum(np.isnan(sdr[:, 0])))

    # host f64 on a subset: accuracy + the comparison rate
    hn = min(args.host_n, args.n)
    t0 = time.time()
    dev_err = 0.0
    n_perm_mismatch = 0
    for i in range(hn):
        L = lengths[i % len(lengths)]
        h_sdr, h_sir, h_sar, h_perm = bss_eval_sources(
            refs[i, :, :L].astype(np.float64), ests[i, :, :L].astype(np.float64))
        if not np.all(np.isfinite(sdr[i])):
            continue
        if not np.array_equal(np.asarray(h_perm), np.asarray(perm[i])):
            # near-tied permutations can resolve differently between the
            # scorers; comparing per-source values across different
            # assignments would report a spurious deviation
            n_perm_mismatch += 1
            continue
        dev_err = max(dev_err,
                      float(np.max(np.abs(h_sdr - sdr[i]))),
                      float(np.max(np.abs(h_sir - sir[i]))),
                      float(np.max(np.abs(h_sar - sar[i]))))
    host_s = time.time() - t0

    out = {
        "metric": "device BSS-eval sweep",
        "n_utts": args.n,
        "device_wall_s": round(dev_s, 1),
        "device_utts_per_sec": round(args.n / dev_s, 2),
        "host_f64_utts_per_sec": round(hn / host_s, 2),
        "speedup": round((args.n / dev_s) / (hn / host_s), 1),
        "max_abs_dev_vs_host_db": round(dev_err, 4),
        "perm_mismatches_in_spot_check": n_perm_mismatch,
        "host_fallbacks": n_nan,
        "mean_sdr_db": round(float(np.nanmean(sdr)), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
