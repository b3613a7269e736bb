#!/usr/bin/env python3
"""Convergence parity on the REAL TPU hardware path (PARITY.md §5c).

§5/§5b establish that the framework and the torch reference transcription
train to the same converged quality — but both populations there ran on
JAX-CPU (deliberately, to never contend with the TPU). This experiment
closes the remaining gap between that evidence and what a user actually
runs: it trains the SAME seeds on the SAME corpus *on the TPU chip*, in
both numeric configurations the framework ships —

  f32   the bit-faithful parity path (compute_dtype=float32), and
  bf16  the perf path (compute_dtype=bfloat16 + Pallas LSTM kernel — the
        configuration behind the BENCH_r* headline number),

then scores the converged models and compares each against the recorded CPU
populations (scale_test/convergence/convergence.json): pair gaps
|tpu − cpu_jax| per seed vs the across-seed spread of either CPU
population. Parity holds if hardware (and bf16 rounding) moves a converged
model by no more than seed-level run noise.

Process layout: only *training* runs on the TPU. Corpus build / feature
extraction and model scoring run in JAX_PLATFORMS=cpu subprocesses — the
axon backend pays tens of seconds of compile per shape, which would swamp
those throwaway stages, and scoring on CPU keeps the inference numerics
IDENTICAL to how the §5 populations were scored, so score differences
reflect the trained weights only. Training step functions are shared
across seeds per config (parity_harness step_fns) for the same reason:
one compile per shape per config.

Reference protocol being matched: steps/train_qsub.py:113-155 (Adam 1e-3,
clip 0.25, batch-shuffled epochs, CV every 5 in eval mode).

Usage: PYTHONPATH=.:tests:/root/.axon_site python tools/run_convergence_tpu.py \
         [--workdir scale_test/convergence] [--seeds 0 1 2] [--arch uPIT]
Writes <workdir>/convergence_tpu[_RSH].json and the §5c block of PARITY.md.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, HERE)

import run_convergence as rc  # corpus builder + scorer (seed-fixed corpus)

MARK = "## §5c TPU-hardware convergence"
MARK_RSH = "## §5d RSH TPU-hardware convergence"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _cpu_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # The axon sitecustomize registers (and DIALS) the one-client TPU
    # tunnel whenever PALLAS_AXON_POOL_IPS is set, even under
    # JAX_PLATFORMS=cpu — a second client contending with this process's
    # live TPU client hangs. Strip the trigger so the subprocess is
    # purely CPU.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = ":".join(
        [ROOT, os.path.join(ROOT, "tests"), env.get("PYTHONPATH", "")])
    return env


def _run_cpu_phase(phase, extra_args):
    cmd = [sys.executable, "-u", os.path.abspath(__file__),
           "--phase", phase] + extra_args
    log(f"[cpu subprocess] {phase} ...")
    r = subprocess.run(cmd, env=_cpu_env())
    if r.returncode != 0:
        raise RuntimeError(f"cpu phase {phase!r} failed rc={r.returncode}")


def _spread(vals):
    return max(vals) - min(vals)


def write_parity_section(res, arch):
    """Insert/replace the §5c block in PARITY.md (kept after §5b; the
    run_convergence.py writer's split-to-next-'## ' logic composes with it)."""
    mark = MARK if arch == "uPIT" else MARK_RSH
    path = os.path.join(ROOT, "PARITY.md")
    text = open(path).read()
    if mark in text:
        i = text.index(mark)
        j = text.find("\n## ", i + len(mark))
        text = text[:i].rstrip() + "\n" + (text[j + 1:] if j != -1 else "")
    configs = res["configs"]
    seeds = res["seeds"]
    cpu = res["cpu_reference"]
    lines = [
        mark, "",
        f"The §{'5' if arch == 'uPIT' else '5b'} population ran on JAX-CPU; "
        "this block trains the same "
        f"seeds on the **real TPU chip** (tools/run_convergence_tpu.py, arch "
        f"{arch}, same corpus/protocol: {res['epochs']} epochs, "
        f"{res['steps']} steps) in both shipped numeric configs — `f32` "
        "(bit-faithful) and `bf16` (perf path: compute_dtype=bfloat16 + "
        "Pallas LSTM, the BENCH headline configuration) — and scores the "
        "converged models through the identical CPU inference + host-f64 "
        "BSS-eval used for the CPU population, so score gaps reflect "
        "trained weights only. "
        "Yardstick: the across-seed spread of the CPU populations (jax "
        f"{cpu['sdr_spread_jax']:.3f} dB, torch "
        f"{cpu['sdr_spread_torch']:.3f} dB SDR).", "",
        "| Seed | config | final CV loss (last-3 mean) | SDR (dB) | "
        "SI-SDR (dB) | |SDR − cpu_jax| |",
        "|---|---|---|---|---|---|",
    ]
    for s in seeds:
        lines.append(f"| {s} | cpu f32 (§{'5' if arch == 'uPIT' else '5b'}) | "
                     f"{cpu['pairs'][str(s)]['final_cv']:.6f} | "
                     f"{cpu['pairs'][str(s)]['SDR']:.3f} | "
                     f"{cpu['pairs'][str(s)]['SI-SDR']:.3f} | — |")
        for cfg_name in ("f32", "bf16"):
            r = configs[cfg_name]["pairs"][str(s)]
            lines.append(f"| {s} | tpu {cfg_name} | {r['final_cv']:.6f} | "
                         f"{r['SDR']:.3f} | {r['SI-SDR']:.3f} | "
                         f"{r['sdr_gap_vs_cpu']:.3f} |")
    lines.append("")
    for cfg_name in ("f32", "bf16"):
        c = configs[cfg_name]["summary"]
        lines.append(
            f"- tpu {cfg_name}: SDR pair gaps vs cpu_jax {c['sdr_gaps']} dB "
            f"(max {c['sdr_gap_max']:.3f}), population mean "
            f"{c['sdr_mean']:.3f} vs cpu {cpu['sdr_mean_jax']:.3f}; CV-loss "
            f"gaps {c['cv_gaps']}.")
    lines += [
        f"- train wall on TPU: {res['train_wall_s']:.0f}s for "
        f"{len(seeds) * 2} runs of {res['steps']} steps (tiny 2x64 model — "
        "dominated by per-shape compiles and per-step host dispatch, not "
        "device compute; the reference-scale step time is the BENCH number).",
    ]
    # fold in the full-scale (--hidden 600) f32-vs-bf16 run when recorded:
    # at reference model size no CPU population exists, so the comparison
    # is bf16-vs-f32 on TPU directly
    h600 = os.path.join(ROOT, "scale_test", "convergence",
                        "convergence_tpu_h600.json"
                        if arch == "uPIT" else
                        f"convergence_tpu_{arch}_h600.json")
    if os.path.isfile(h600):
        h = json.load(open(h600))
        hseeds = h["seeds"]
        bs = h["configs"]["bf16"]["summary"]
        f32p, b16p = (h["configs"]["f32"]["pairs"],
                      h["configs"]["bf16"]["pairs"])
        per_seed = "; ".join(
            f"seed {s}: f32 {f32p[str(s)]['SDR']:.3f} / bf16 "
            f"{b16p[str(s)]['SDR']:.3f} dB" for s in hseeds)
        lines.append(
            f"- **full model scale (2x600, reference archs/uPIT.py:115)**: "
            f"the same protocol at hidden=600 ({h['steps']} steps, seeds "
            f"{hseeds}) compares the perf path against f32 on TPU directly "
            f"— {per_seed}; per-seed |bf16 − f32| SDR gaps "
            f"{bs['sdr_gaps_vs_f32']} dB (max {bs['sdr_gap_vs_f32_max']:.3f}"
            f"), CV-loss gaps {bs['cv_gaps_vs_f32']} "
            f"(convergence_tpu_h600.json).")
    lines.append("")
    with open(path, "w") as f:
        f.write(text + "\n" + "\n".join(lines) + "\n")
    log(f"wrote {mark!r} to {path}")


def phase_build(args):
    n_train, n_cv, n_test = ((32, 8, 8) if args.quick else (160, 40, 40))
    rc.build_corpus(args.workdir, n_train, n_cv, n_test)
    log("corpus + features built")


def phase_score(args):
    """Score every model in the manifest (CPU inference, host-f64 BSS-eval)."""
    manifest = json.load(open(os.path.join(args.workdir,
                                           "tpu_score_manifest.json")))
    rc.ARCH = manifest["arch"]
    scores = {}
    for m in manifest["models"]:
        scores[m["tag"]] = rc.score_model(m["tag"], m["path"],
                                          manifest["test_dir"], args.workdir)
        log(f"scored {m['tag']}: SDR={scores[m['tag']]['SDR']:.3f}")
    with open(os.path.join(args.workdir, "tpu_scores.json"), "w") as f:
        json.dump(scores, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=os.path.join(ROOT, "scale_test",
                                                      "convergence"))
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--arch", default="uPIT", choices=["uPIT", "RSH"])
    ap.add_argument("--hidden", type=int, default=None,
                    help="override the 2x64 harness model with a wider one "
                         "(e.g. 600 = the reference model scale, "
                         "archs/uPIT.py:115); results go to a _h<N> JSON "
                         "and compare f32-vs-bf16 on TPU directly (no CPU "
                         "population exists at that scale)")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--phase", default="run",
                    choices=["run", "build", "score", "section"],
                    help="internal: build/score run as JAX-CPU subprocesses; "
                         "section re-emits the PARITY.md block from a "
                         "recorded results JSON")
    args = ap.parse_args()
    rc.ARCH = args.arch
    if args.hidden:
        rc.HIDDEN = args.hidden
    args.workdir = os.path.abspath(args.workdir)

    if args.phase == "build":
        return phase_build(args)
    if args.phase == "score":
        return phase_score(args)
    if args.phase == "section":
        name = ("convergence_tpu.json" if args.arch == "uPIT"
                else f"convergence_tpu_{args.arch}.json")
        res = json.load(open(os.path.join(args.workdir, name)))
        return write_parity_section(res, args.arch)

    import jax
    platform = jax.devices()[0].platform
    log(f"JAX platform: {platform} ({jax.devices()[0]})")

    n_train, n_cv, n_test = (32, 8, 8) if args.quick else (160, 40, 40)
    epochs = 4 if args.quick else args.epochs
    seeds = args.seeds[:1] if args.quick else args.seeds

    cpu_json = os.path.join(
        args.workdir,
        "convergence.json" if args.arch == "uPIT"
        else f"convergence_{args.arch}.json")
    cpu_ref = None
    if os.path.isfile(cpu_json) and not args.quick and not args.hidden:
        cpu = json.load(open(cpu_json))
        cpu_ref = {"pairs": {s: {"final_cv": p["jax"]["final_cv"],
                                 "SDR": p["jax"]["SDR"],
                                 "SI-SDR": p["jax"]["SI-SDR"]}
                             for s, p in cpu["pairs"].items()},
                   "sdr_spread_jax": cpu["summary"]["sdr_spread_jax"],
                   "sdr_spread_torch": cpu["summary"]["sdr_spread_torch"],
                   "sdr_mean_jax": cpu["summary"]["sdr_mean_jax"],
                   "cv_spread_jax": cpu["summary"]["cv_spread_jax"]}

    t_start = time.time()
    build_args = ["--workdir", args.workdir] + (["--quick"] if args.quick
                                                else [])
    _run_cpu_phase("build", build_args)
    dirs = {s: os.path.join(args.workdir, "data", s)
            for s in ("train", "cv", "test")}
    corpus = rc.load_harness_corpus(dirs["train"])
    cv_corpus = rc.load_harness_corpus(dirs["cv"])
    log(f"corpus: {len(corpus)} train / {len(cv_corpus)} cv")

    from parity_harness import run_parity

    ckpt_dir = os.path.join(args.workdir, "models")
    os.makedirs(ckpt_dir, exist_ok=True)
    configs = {"f32": {"pairs": {}}, "bf16": {"pairs": {}}}
    manifest = {"arch": args.arch, "test_dir": dirs["test"], "models": []}
    n_steps = 0
    train_wall = 0.0
    for cfg_name, extra in (("f32", None),
                            ("bf16", {"compute_dtype": "bfloat16"})):
        step_fns = None
        for seed in seeds:
            log(f"tpu {cfg_name} seed {seed}: training {epochs} epochs ...")
            t0 = time.time()
            r = run_parity(args.arch, corpus, cv_corpus,
                           F=rc.F_DIM, S=rc.NUM_SPK, H=rc.HIDDEN, L=rc.LAYERS,
                           batch_size=rc.BATCH, n_epochs=epochs, cv_every=5,
                           seed=seed, pad_multiple=rc.PAD_MULTIPLE,
                           with_torch=False, model_extra=extra,
                           step_fns=step_fns, log=log)
            step_fns = r["step_fns"]
            train_wall += time.time() - t0
            n_steps = len(r["j_train"])
            tag = (f"tpu_{cfg_name}_{args.arch}"
                   + (f"_h{rc.HIDDEN}" if args.hidden else "")
                   + f"_seed{seed}")
            path = os.path.join(ckpt_dir, tag + ".mdl")
            rc.save_jax_model(path, r["params"], r["state"])
            manifest["models"].append({"tag": tag, "path": path})
            configs[cfg_name]["pairs"][str(seed)] = {
                "final_train": r["j_train"][-1],
                "final_cv": float(np.mean(r["j_cv"][-3:])),
                "cv_curve": r["j_cv"]}
            log(f"tpu {cfg_name} seed {seed}: trained, "
                f"final_cv={configs[cfg_name]['pairs'][str(seed)]['final_cv']:.6f} "
                f"({time.time() - t0:.0f}s)")

    with open(os.path.join(args.workdir, "tpu_score_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    score_args = ["--workdir", args.workdir, "--arch", args.arch]
    _run_cpu_phase("score", score_args)
    scores = json.load(open(os.path.join(args.workdir, "tpu_scores.json")))

    for cfg_name in configs:
        pairs = configs[cfg_name]["pairs"]
        for seed in seeds:
            rec = pairs[str(seed)]
            means = scores[f"tpu_{cfg_name}_{args.arch}"
                           + (f"_h{rc.HIDDEN}" if args.hidden else "")
                           + f"_seed{seed}"]
            rec.update({"SDR": means["SDR"], "SI-SDR": means["SI-SDR"],
                        "SI-SDRi": means["SI-SDRi"]})
            if cpu_ref is not None:
                c = cpu_ref["pairs"][str(seed)]
                rec["sdr_gap_vs_cpu"] = abs(rec["SDR"] - c["SDR"])
                rec["cv_gap_vs_cpu"] = abs(rec["final_cv"] - c["final_cv"])
        sdrs = [pairs[str(s)]["SDR"] for s in seeds]
        summ = {"sdr_mean": float(np.mean(sdrs)), "sdr_spread": _spread(sdrs)}
        if cpu_ref is not None:
            g = [pairs[str(s)]["sdr_gap_vs_cpu"] for s in seeds]
            cg = [pairs[str(s)]["cv_gap_vs_cpu"] for s in seeds]
            summ["sdr_gaps"] = "[" + ", ".join(f"{x:.3f}" for x in g) + "]"
            summ["sdr_gap_max"] = max(g)
            summ["cv_gaps"] = "[" + ", ".join(f"{x:.2e}" for x in cg) + "]"
        configs[cfg_name]["summary"] = summ

    # with no CPU population (full-scale --hidden runs), the comparison is
    # f32-vs-bf16 on TPU directly: per-seed pair gaps vs the f32 seed spread
    if cpu_ref is None and len(seeds) >= 1:
        g = [abs(configs["f32"]["pairs"][str(s)]["SDR"]
                 - configs["bf16"]["pairs"][str(s)]["SDR"]) for s in seeds]
        cg = [abs(configs["f32"]["pairs"][str(s)]["final_cv"]
                  - configs["bf16"]["pairs"][str(s)]["final_cv"])
              for s in seeds]
        configs["bf16"]["summary"]["sdr_gaps_vs_f32"] = (
            "[" + ", ".join(f"{x:.3f}" for x in g) + "]")
        configs["bf16"]["summary"]["sdr_gap_vs_f32_max"] = max(g)
        configs["bf16"]["summary"]["cv_gaps_vs_f32"] = (
            "[" + ", ".join(f"{x:.2e}" for x in cg) + "]")

    res = {"platform": platform, "arch": args.arch, "seeds": list(seeds),
           "hidden": rc.HIDDEN, "epochs": epochs, "steps": n_steps,
           "n_train": n_train, "n_cv": n_cv, "n_test": n_test,
           "configs": configs, "cpu_reference": cpu_ref,
           "train_wall_s": train_wall, "wall_s": time.time() - t_start}
    out_name = ("convergence_tpu.json" if args.arch == "uPIT"
                else f"convergence_tpu_{args.arch}.json")
    if args.hidden:
        out_name = out_name.replace(".json", f"_h{rc.HIDDEN}.json")
    out_path = os.path.join(args.workdir, out_name)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    log(f"wrote {out_path}")
    if not args.quick and cpu_ref is not None:
        write_parity_section(res, args.arch)
    log(f"done in {res['wall_s']:.0f}s (train {train_wall:.0f}s)")


if __name__ == "__main__":
    main()
