#!/usr/bin/env python3
"""Generate the vendored BSS-eval golden vectors (tests/golden/).

Prefers REAL mir_eval when importable (run this once in an environment with
mir_eval installed to regenerate authoritative vectors); otherwise falls
back to tools/mir_eval_transcription.py, an independent from-scratch
implementation of the published BSS_EVAL v3 algorithm. The npz records which
generator produced it (`generator` field).

Cases are chosen to exercise the scorer's moving parts:
  - ar2 / ar3: 2- and 3-source AR(0.95) noise (strong short-time
    correlation — the hard case for the 512-tap projections), estimates =
    mixtures of the references (finite SIR/SAR), permuted so the
    max-mean-SIR search has work to do;
  - filtered: estimate = short FIR of the reference (the distortion-filter
    subspace should absorb it: very high SDR);
  - tones: deterministic sinusoid mixtures like the synthetic demo corpus;
  - identity_noperm: compute_permutation=False path (the oracle-eval rule).
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "golden", "bss_eval_golden.npz")


def _ar1(rng, n, rho=0.95):
    x = np.empty(n)
    x[0] = rng.standard_normal()
    eps = rng.standard_normal(n)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + eps[t]
    return x / np.std(x)


def make_cases():
    rng = np.random.default_rng(20260816)
    cases = {}

    # 2-source AR noise, estimates are swapped noisy mixtures
    L = 4000
    refs = np.stack([_ar1(rng, L), _ar1(rng, L)])
    ests = np.stack([
        0.2 * refs[0] + 0.9 * refs[1] + 0.05 * rng.standard_normal(L),
        0.9 * refs[0] + 0.25 * refs[1] + 0.05 * rng.standard_normal(L),
    ])
    cases["ar2"] = (refs, ests, True)

    # 3-source
    refs3 = np.stack([_ar1(rng, L), _ar1(rng, L), _ar1(rng, L)])
    ests3 = np.stack([
        0.8 * refs3[1] + 0.2 * refs3[2] + 0.04 * rng.standard_normal(L),
        0.85 * refs3[2] + 0.15 * refs3[0] + 0.04 * rng.standard_normal(L),
        0.9 * refs3[0] + 0.1 * refs3[1] + 0.04 * rng.standard_normal(L),
    ])
    cases["ar3"] = (refs3, ests3, True)

    # estimate = FIR-filtered reference (allowed distortion -> high SDR)
    h = rng.standard_normal(64) * np.hanning(64)
    filt = np.stack([
        np.convolve(refs[0], h)[:L],
        refs[1] + 0.3 * refs[0],
    ])
    cases["filtered"] = (refs, filt, True)

    # deterministic tone mixtures (like the synthetic demo corpus)
    t = np.arange(L) / 8000.0
    s1 = np.sin(2 * np.pi * 440 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    s2 = np.sign(np.sin(2 * np.pi * 311 * t)) * 0.7
    tones = np.stack([s1, s2])
    test = np.stack([0.75 * s1 + 0.3 * s2, 0.8 * s2 + 0.25 * s1])
    cases["tones"] = (tones, test, True)

    # oracle path: identity pairing, no permutation search
    cases["identity_noperm"] = (refs, ests[::-1].copy(), False)
    return cases


def main():
    try:
        from mir_eval.separation import bss_eval_sources
        generator = "mir_eval"
    except ImportError:
        sys.path.insert(0, HERE)
        from mir_eval_transcription import bss_eval_sources
        generator = "transcription"
    print(f"generator: {generator}")

    out = {"generator": np.asarray(generator)}
    for name, (refs, ests, perm) in make_cases().items():
        sdr, sir, sar, popt = bss_eval_sources(refs, ests,
                                               compute_permutation=perm)
        out[f"{name}_refs"] = refs.astype(np.float64)
        out[f"{name}_ests"] = ests.astype(np.float64)
        out[f"{name}_perm_flag"] = np.asarray(perm)
        out[f"{name}_sdr"] = sdr
        out[f"{name}_sir"] = sir
        out[f"{name}_sar"] = sar
        out[f"{name}_popt"] = popt
        print(f"{name}: SDR {np.round(sdr, 3)} SIR {np.round(sir, 3)} "
              f"SAR {np.round(sar, 3)} perm {popt}")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
