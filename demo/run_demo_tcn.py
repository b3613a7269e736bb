#!/usr/bin/env python3
"""TCN end-to-end learning demonstration: the beyond-reference
recurrence-free arch (models/tcn.py) trained on the same synthetic
2-speaker corpus as the uPIT/RSH demos (run_demo.py), same recipe (40
epochs, batch 32, bf16 perf path), scored with the same pipeline — so the
RESULTS.md table compares the three archs like-for-like. Appends a TCN
section to RESULTS.md. Idempotent; resumes from checkpoints."""
import json, os, sys, time
os.chdir(os.path.dirname(os.path.abspath(__file__)))

from speech_separation_tpu.train.loop import TrainLoopConfig, train
from speech_separation_tpu.eval import (generate_masks, reconstruct_sources,
                                        evaluate_sources)

t_all = time.time()
from demo_corpus import ensure_demo_corpus, replace_results_section
ensure_demo_corpus()

start_epoch = 0
int_dir = "exp/TCN_syn_tr/intermediate_models"
if os.path.isdir(int_dir):
    done = [int(f[:3]) for f in os.listdir(int_dir) if f[:3].isdigit()]
    if done:
        start_epoch = max(done)
        print(f"== resuming from epoch {start_epoch} ==", flush=True)

print("== train ==", flush=True)
# ~0.9M params, comparable to the demo's uPIT 2x128 BLSTM (~0.92M)
mk = {"channels": "128", "hidden": "256", "blocks": "4", "repeats": "2",
      "compute_dtype": "bfloat16"}
t0 = time.time()
out = train("data/syn_tr", "exp/TCN_syn_tr",
            TrainLoopConfig(arch="TCN", batch_size=32, num_epochs=40,
                            time_pad_multiple=64, seed=0,
                            start_epoch=start_epoch),
            cv_data_dir="data/syn_cv", model_kwargs=mk)
train_wall = time.time() - t0
print(f"train wall: {train_wall:.0f}s", flush=True)

print("== eval ==", flush=True)
out_dir = "exp/TCN_syn_tr/output_final/syn_tt"
generate_masks("exp/TCN_syn_tr/final.mdl", "data/syn_tt",
               os.path.join(out_dir, "masks"), model_kwargs=mk,
               batch_size=32, time_pad_multiple=64)
reconstruct_sources("data/syn_tt", out_dir)
means = evaluate_sources("data/syn_tt", out_dir)

import jax
section = []
section.append("\n## TCN (recurrence-free, beyond reference) on the same corpus\n")
section.append(f"Same recipe, `--arch TCN` (channels 128, hidden 256, 4 blocks x 2\n"
               f"repeats ~ 0.9M params, 40 epochs, bf16): trained on "
               f"{jax.devices()[0].platform}.\n")
section.append("\n| metric | separated (TCN) |\n|---|---|\n")
for m in ("SDR", "SIR", "SAR", "SI-SDR", "SI-SDRi"):
    section.append(f"| {m} | {means[m]:.2f} dB |\n")
section.append(f"\nTrain wall: {train_wall:.0f}s "
               f"({out['utts_per_sec']:.1f} utts/sec incl. host pipeline + "
               f"compiles).\n")
replace_results_section(
    "## TCN (recurrence-free, beyond reference) on the same corpus", section)
print(json.dumps({"means": means, "train_wall_s": train_wall}))
print(f"total wall: {time.time()-t_all:.0f}s", flush=True)
