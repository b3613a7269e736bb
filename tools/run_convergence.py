#!/usr/bin/env python3
"""Convergence-level quality parity (VERDICT round-2 missing #1).

The trajectory-parity evidence (PARITY.md §1-2) shows per-step losses track
for ~100 steps; this experiment shows training *arrives at the same model
quality*: the torch reference-semantics transcription (tests/torch_ref.py)
and this framework train to convergence on one identical synthetic corpus —
same initial weights, same batch order, zero_init_hidden, Adam(1e-3) +
clip 0.25 (reference steps/train_qsub.py:113-155) — and the *converged*
models are compared on

  1. final CV loss (norm-weighted, eval-mode — train_qsub.py:124-141), and
  2. scored SDR / SI-SDR on a held-out test set, both models evaluated
     through the same inference + BSS-eval path (the torch weights enter via
     ``sepsep import-model``, exercising the migration path end-to-end).

After ~800 optimizer steps the two trajectories are chaotic — f32
reduction-order differences compound through Adam — so single-run
comparisons sample a distribution. The experiment therefore runs N PAIRED
seeds (each pair = identical init + batch order, jax and torch trained side
by side) and compares populations: parity holds if the within-pair gaps are
comparable to the across-seed spread of either population. Final CV loss is
smoothed over the last 3 CV points (late training oscillates around the
minimum at constant lr 1e-3; a single CV sample aliases that oscillation).

Runs on JAX CPU (JAX_PLATFORMS=cpu) so it never contends with the TPU; the
model (2x64 BLSTM, feat_dim 257) is torch-CPU-feasible at this corpus size.

Usage: PYTHONPATH=.:tests JAX_PLATFORMS=cpu python tools/run_convergence.py \
         [--workdir scale_test/convergence] [--epochs 80] [--quick]
Writes <workdir>/convergence.json and rewrites the §5 block of PARITY.md.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

# model scale (VERDICT: "2x64 BLSTM, 100-200 utts, 40+ epochs")
F_DIM, NUM_SPK, HIDDEN, LAYERS = 257, 2, 64, 2
BATCH = 16
PAD_MULTIPLE = 32  # both sides pad T to this; bounds XLA compile count
ARCH = "uPIT"      # set by --arch; RSH reuses the same corpus/protocol


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build_corpus(workdir, n_train, n_cv, n_test):
    """Synthetic 2-speaker corpora + real STFT features for train/cv."""
    from speech_separation_tpu.utils.synthetic import make_synthetic_corpus
    from speech_separation_tpu.dsp import STFTConfig
    from speech_separation_tpu.dsp.extract import extract_features

    cfg = STFTConfig()
    dirs = {}
    for split, n, seed in (("train", n_train, 10), ("cv", n_cv, 11),
                           ("test", n_test, 12)):
        corpus_root = os.path.join(workdir, "corpus", split)
        data_dir = os.path.join(workdir, "data", split)
        os.makedirs(data_dir, exist_ok=True)
        utts = make_synthetic_corpus(corpus_root, n, seed=seed,
                                     prefix=f"{split}")
        with open(os.path.join(data_dir, "wav.scp"), "w") as f:
            for u in utts:
                f.write(f"{u} {os.path.abspath(corpus_root)}/mix/{u}.wav\n")
        if split != "test":
            extract_features(data_dir, "train",
                             os.path.join(workdir, "feats", split), cfg)
        else:
            with open(os.path.join(data_dir, "utt2num_spk"), "w") as f:
                for u in utts:
                    f.write(f"{u} {NUM_SPK}\n")
        dirs[split] = data_dir
    return dirs


def load_harness_corpus(data_dir):
    from speech_separation_tpu.train.data import FeatureDataset
    ds = FeatureDataset(data_dir, "train")
    out = []
    for i in range(len(ds)):
        s = ds.load(i)
        out.append({"mix": s["mix"], "sources": s["sources"],
                    "length": s["mix"].shape[0]})
    return out


def save_jax_model(path, params, state):
    from speech_separation_tpu.train.checkpoint import save_checkpoint
    kwargs = {"feat_dim": str(F_DIM), "hidden": str(HIDDEN),
              "num_layers": str(LAYERS), "zero_init_hidden": "true"}
    if ARCH == "uPIT":
        kwargs["num_spk"] = str(NUM_SPK)
    save_checkpoint(path, params=params, state=state,
                    meta={"arch": ARCH, "model_kwargs": kwargs})


def save_torch_model(path, model):
    """Write the reference .mdl format: torch.save(state_dict) with running
    BN stats (steps/train_qsub.py:148-155)."""
    import torch
    torch.save(model.state_dict(), path)


def score_model(tag, ckpt_path, test_dir, workdir):
    """Separate the test set with the framework pipeline and BSS-eval it
    (host f64 scorer). Returns the means dict."""
    from speech_separation_tpu.datadir.scp import read_scp
    from speech_separation_tpu.dsp import STFTConfig
    from speech_separation_tpu.eval.pipeline import SeparationPipeline
    from speech_separation_tpu.eval.score import evaluate_sources
    from speech_separation_tpu.utils.audio import load_wav, write_wav_int16

    cfg = STFTConfig()
    pipe = SeparationPipeline(ckpt_path,
                              model_kwargs={"zero_init_hidden": "true"},
                              stft_cfg=cfg, batch_size=BATCH)
    exp_dir = os.path.join(workdir, "exp_score", tag)
    entries = read_scp(os.path.join(test_dir, "wav.scp"))
    utts = [u for u, _ in entries]
    signals = [load_wav(p, sr=cfg.sample_rate)[0] for _, p in entries]
    outs = pipe.separate(signals)
    for utt, ests in zip(utts, outs):
        for s, est in enumerate(ests):
            path = os.path.join(exp_dir, "wav", f"s{s + 1}", utt + ".wav")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            write_wav_int16(path, cfg.sample_rate, est)
    return evaluate_sources(test_dir, exp_dir, log=log)


UPIT_MARK = "## §5 Convergence-level quality parity"
RSH_MARK = "## §5b RSH convergence parity"


def _spread(vals):
    return max(vals) - min(vals)


def write_parity_section(res):
    """Replace/append this arch's convergence block of PARITY.md (the uPIT
    block comes first; an existing other-arch block is preserved)."""
    path = os.path.join(ROOT, "PARITY.md")
    text = open(path).read() if os.path.isfile(path) else "# PARITY\n"

    def split_out(t, mark):
        """(text-without-block, block) — block runs to the next '## ' or EOF."""
        if mark not in t:
            return t, ""
        i = t.index(mark)
        j = t.find("\n## ", i + len(mark))
        if j == -1:
            return t[:i].rstrip() + "\n", t[i:]
        return (t[:i] + t[j + 1:]).rstrip() + "\n", t[i: j + 1]
    text, upit_block = split_out(text, UPIT_MARK)
    text, rsh_block = split_out(text, RSH_MARK)

    mark = UPIT_MARK if ARCH == "uPIT" else RSH_MARK
    pairs = res["pairs"]
    seeds = sorted(pairs)
    lines = [
        mark, "",
        "Training *to convergence* reaches the same model quality "
        "(tools/run_convergence.py; VERDICT round-2 #1). One synthetic "
        f"2-speaker corpus ({res['n_train']} train / {res['n_cv']} cv / "
        f"{res['n_test']} test utts, real |STFT| features, F=257), "
        f"2x{HIDDEN} BLSTM {ARCH}, batch {BATCH}, Adam(1e-3)+clip 0.25, "
        f"{res['epochs']} epochs ({res['steps']} optimizer steps). "
        f"{len(seeds)} PAIRED seeds: each pair trains the framework and the "
        "torch transcription side by side from identical init with "
        "identical batch order (zero_init_hidden); the torch weights are "
        "scored through `sepsep import-model` + the same pipeline + "
        "host-f64 BSS-eval as the framework's. After ~800 chaotic optimizer "
        "steps single runs sample a distribution, so the yardstick is the "
        "across-seed spread of either population; 'final CV' is the mean "
        "of the last 3 CV points (late training oscillates around the "
        "minimum at constant lr).", "",
        "| Seed | side | final train loss | final CV loss (last-3 mean) "
        "| SDR (dB) | SI-SDR (dB) |",
        "|---|---|---|---|---|---|",
    ]
    for s in seeds:
        for side in ("jax", "torch"):
            r = pairs[s][side]
            lines.append(f"| {s} | {side} | {r['final_train']:.6f} | "
                         f"{r['final_cv']:.6f} | {r['SDR']:.3f} | "
                         f"{r['SI-SDR']:.3f} |")
    summ = res["summary"]
    lines += [
        "",
        f"- scored SDR: paired |jax−torch| gaps "
        f"{summ['sdr_pair_gaps']} dB (max {summ['sdr_pair_max']:.3f}) vs "
        f"across-seed spread jax {summ['sdr_spread_jax']:.3f} / torch "
        f"{summ['sdr_spread_torch']:.3f} dB; population means "
        f"{summ['sdr_mean_jax']:.3f} (jax) vs {summ['sdr_mean_torch']:.3f} "
        "(torch).",
        f"- SI-SDR: paired gaps {summ['sisdr_pair_gaps']} dB (max "
        f"{summ['sisdr_pair_max']:.3f}) vs spread jax "
        f"{summ['sisdr_spread_jax']:.3f} / torch "
        f"{summ['sisdr_spread_torch']:.3f} dB.",
        f"- final CV loss (last-3 mean): paired gaps "
        f"{summ['cv_pair_gaps']} vs spread jax {summ['cv_spread_jax']:.2e} "
        f"/ torch {summ['cv_spread_torch']:.2e}.",
        f"- wall: {res['wall_s']:.0f}s on JAX-CPU + torch-CPU "
        "(tools/run_convergence.py, rerunnable).", "",
    ]
    block = "\n".join(lines) + "\n"
    if ARCH == "uPIT":
        upit_block = block
    else:
        rsh_block = block
    with open(path, "w") as f:
        f.write(text + "\n" + upit_block
                + ("\n" + rsh_block if rsh_block else ""))
    log(f"wrote {mark!r} to {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=os.path.join(ROOT, "scale_test",
                                                      "convergence"))
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--arch", default="uPIT", choices=["uPIT", "RSH"])
    ap.add_argument("--quick", action="store_true",
                    help="tiny sizes for a smoke run")
    ap.add_argument("--merge-existing", action="store_true",
                    help="reuse pairs already recorded in the workdir JSON "
                         "for seeds not listed in --seeds (the corpus is "
                         "seed-fixed, so results compose across runs)")
    args = ap.parse_args()
    global ARCH
    ARCH = args.arch

    n_train, n_cv, n_test = (32, 8, 8) if args.quick else (160, 40, 40)
    epochs = 6 if args.quick else args.epochs
    seeds = args.seeds[:1] if args.quick else args.seeds
    os.makedirs(args.workdir, exist_ok=True)
    t_start = time.time()

    log("building corpus + features ...")
    dirs = build_corpus(args.workdir, n_train, n_cv, n_test)
    corpus = load_harness_corpus(dirs["train"])
    cv_corpus = load_harness_corpus(dirs["cv"])
    log(f"corpus: {len(corpus)} train / {len(cv_corpus)} cv, "
        f"T in [{min(c['length'] for c in corpus)}, "
        f"{max(c['length'] for c in corpus)}]")

    from parity_harness import run_parity
    from speech_separation_tpu.utils.import_torch import import_reference_model

    json_name = ("convergence.json" if args.arch == "uPIT"
                 else f"convergence_{args.arch}.json")
    json_path = os.path.join(args.workdir, json_name)
    prev_pairs, prev_wall = {}, 0.0
    if args.merge_existing and os.path.isfile(json_path):
        prev = json.load(open(json_path))
        prev_pairs = {int(s): p for s, p in prev["pairs"].items()
                      if int(s) not in seeds}
        prev_wall = prev.get("wall_s", 0.0)
        log(f"merging {len(prev_pairs)} recorded pairs "
            f"(seeds {sorted(prev_pairs)}) from {json_name}")

    ckpt_dir = os.path.join(args.workdir, "models")
    os.makedirs(ckpt_dir, exist_ok=True)
    pairs = {}
    n_steps = 0
    for i, seed in enumerate(seeds):
        log(f"pair {i + 1}/{len(seeds)}: framework + torch {ARCH}, "
            f"seed {seed}, interleaved ...")
        r = run_parity(ARCH, corpus, cv_corpus, F=F_DIM, S=NUM_SPK,
                       H=HIDDEN, L=LAYERS, batch_size=BATCH, n_epochs=epochs,
                       cv_every=5, seed=seed, pad_multiple=PAD_MULTIPLE,
                       with_torch=True, log=log)
        n_steps = len(r["j_train"])
        j_path = os.path.join(ckpt_dir, f"jax_{ARCH}_seed{seed}.mdl")
        t_mdl = os.path.join(ckpt_dir, f"torch_{ARCH}_seed{seed}_ref.mdl")
        t_path = os.path.join(ckpt_dir, f"torch_{ARCH}_seed{seed}.mdl")
        save_jax_model(j_path, r["params"], r["state"])
        save_torch_model(t_mdl, r["torch_model"])
        import_reference_model(t_mdl, t_path, log=log)
        pair = {}
        for side, path, train_c, cv_c in (
                ("jax", j_path, r["j_train"], r["j_cv"]),
                ("torch", t_path, r["t_train"], r["t_cv"])):
            means = score_model(f"{side}_{ARCH}_seed{seed}", path,
                                dirs["test"], args.workdir)
            pair[side] = {"final_train": train_c[-1],
                          "final_cv": float(np.mean(cv_c[-3:])),
                          "final_cv_last": cv_c[-1],
                          "SDR": means["SDR"], "SI-SDR": means["SI-SDR"],
                          "SI-SDRi": means["SI-SDRi"], "cv_curve": cv_c}
            log(f"seed {seed} {side}: final_cv(last3)={pair[side]['final_cv']:.6f} "
                f"SDR={means['SDR']:.3f} SI-SDR={means['SI-SDR']:.3f}")
        pairs[seed] = pair

    if prev_pairs:
        pairs.update(prev_pairs)
        seeds = sorted(pairs)
        if not n_steps:
            n_steps = prev.get("steps", 0)

    def col(side, key):
        return [pairs[s][side][key] for s in seeds]

    def gaps(key, fmt):
        return "[" + ", ".join(
            fmt.format(abs(pairs[s]["jax"][key] - pairs[s]["torch"][key]))
            for s in seeds) + "]"

    summary = {
        "sdr_pair_gaps": gaps("SDR", "{:.3f}"),
        "sdr_pair_max": max(abs(pairs[s]["jax"]["SDR"]
                                - pairs[s]["torch"]["SDR"]) for s in seeds),
        "sdr_spread_jax": _spread(col("jax", "SDR")),
        "sdr_spread_torch": _spread(col("torch", "SDR")),
        "sdr_mean_jax": float(np.mean(col("jax", "SDR"))),
        "sdr_mean_torch": float(np.mean(col("torch", "SDR"))),
        "sisdr_pair_gaps": gaps("SI-SDR", "{:.3f}"),
        "sisdr_pair_max": max(abs(pairs[s]["jax"]["SI-SDR"]
                                  - pairs[s]["torch"]["SI-SDR"])
                              for s in seeds),
        "sisdr_spread_jax": _spread(col("jax", "SI-SDR")),
        "sisdr_spread_torch": _spread(col("torch", "SI-SDR")),
        "cv_pair_gaps": gaps("final_cv", "{:.2e}"),
        "cv_spread_jax": _spread(col("jax", "final_cv")),
        "cv_spread_torch": _spread(col("torch", "final_cv")),
    }
    res = {"n_train": n_train, "n_cv": n_cv, "n_test": n_test,
           "epochs": epochs, "steps": n_steps, "seeds": list(seeds),
           "pairs": {str(s): pairs[s] for s in seeds}, "summary": summary,
           "wall_s": time.time() - t_start + prev_wall}
    res["pairs"] = pairs  # keyed by int seed for write_parity_section
    with open(json_path, "w") as f:
        json.dump({**res, "pairs": {str(s): pairs[s] for s in seeds}}, f,
                  indent=1)
    if not args.quick:
        write_parity_section(res)
    log(f"done in {res['wall_s']:.0f}s; SDR paired gaps "
        f"{summary['sdr_pair_gaps']} vs spreads "
        f"{summary['sdr_spread_jax']:.3f}/{summary['sdr_spread_torch']:.3f}")


if __name__ == "__main__":
    main()
