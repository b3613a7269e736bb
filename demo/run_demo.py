#!/usr/bin/env python3
"""End-to-end learning demonstration on real hardware: synthetic 2-speaker
corpus -> train uPIT (bf16 + Pallas path) -> masks -> wavs -> BSS-eval +
SI-SDRi -> oracle ceiling. Writes demo/RESULTS.md."""
import json, os, sys, time
os.chdir(os.path.dirname(os.path.abspath(__file__)))

from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
from speech_separation_tpu.dsp import STFTConfig
from speech_separation_tpu.dsp.extract import extract_features
from speech_separation_tpu.train.loop import TrainLoopConfig, train
from speech_separation_tpu.eval import (generate_masks, reconstruct_sources,
                                        evaluate_sources, evaluate_oracle,
                                        merge_oracle_shards)
from speech_separation_tpu.utils.synthetic import make_synthetic_corpus, write_id_list

t_all = time.time()
from demo_corpus import ensure_demo_corpus
ensure_demo_corpus()

# resume from the latest intermediate checkpoint (transient device failures
# through the tunnel are expected; this is what checkpoint/resume is for)
start_epoch = 0
int_dir = "exp/uPIT_syn_tr/intermediate_models"
if os.path.isdir(int_dir):
    done = [int(f[:3]) for f in os.listdir(int_dir) if f[:3].isdigit()]
    if done:
        start_epoch = max(done)
        print(f"== resuming from epoch {start_epoch} ==", flush=True)

print("== train ==", flush=True)
mk = {"hidden": "128", "num_layers": "2", "compute_dtype": "bfloat16"}
t0 = time.time()
out = train("data/syn_tr", "exp/uPIT_syn_tr",
            TrainLoopConfig(arch="uPIT", batch_size=32, num_epochs=40,
                            time_pad_multiple=64, seed=0,
                            start_epoch=start_epoch),
            cv_data_dir="data/syn_cv", model_kwargs=mk)
train_wall = time.time() - t0
print(f"train wall: {train_wall:.0f}s", flush=True)

print("== eval ==", flush=True)
out_dir = "exp/uPIT_syn_tr/output_final/syn_tt"
generate_masks("exp/uPIT_syn_tr/final.mdl", "data/syn_tt",
               os.path.join(out_dir, "masks"), model_kwargs=mk,
               batch_size=32, time_pad_multiple=64)
reconstruct_sources("data/syn_tt", out_dir)
means = evaluate_sources("data/syn_tt", out_dir)

print("== oracle ==", flush=True)
evaluate_oracle("data/syn_tt", hard_mask=False)
oracle = merge_oracle_shards("data/syn_tt", hard_mask=False, num_shards=1)

with open("RESULTS.md", "w") as f:
    f.write("# Synthetic-corpus end-to-end demonstration\n\n")
    f.write("Trained and evaluated on this environment's real TPU v5e core via the\n")
    f.write("full pipeline (prepare -> extract -> train[bf16+Pallas] -> masks -> wavs\n")
    f.write("-> BSS-eval). Corpus: 256/32/32 synthetic 2-speaker mixtures\n")
    f.write("(low-band harmonic voice + high-band noise voice, 8 kHz).\n\n")
    f.write(f"- model: uPIT BLSTM 2x128, 40 epochs, batch 32, Adam 1e-3, clip 0.25\n")
    f.write(f"- train wall: {train_wall:.0f}s ({out['utts_per_sec']:.1f} utts/sec incl. host pipeline + compiles)\n\n")
    f.write("| metric | separated | oracle soft mask (ceiling) |\n|---|---|---|\n")
    for m in ("SDR", "SIR", "SAR"):
        f.write(f"| {m} | {means[m]:.2f} dB | {oracle[m]:.2f} dB |\n")
    f.write(f"| SI-SDR | {means['SI-SDR']:.2f} dB | — |\n")
    f.write(f"| SI-SDRi | {means['SI-SDRi']:.2f} dB | — |\n")
print(json.dumps({"means": means, "oracle": oracle, "train_wall_s": train_wall}))
print(f"total wall: {time.time()-t_all:.0f}s", flush=True)
