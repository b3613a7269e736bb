#!/usr/bin/env python3
"""RSH end-to-end demonstration on real hardware: reuses the demo corpus,
trains the iterative-extraction architecture, evaluates with the staged
pipeline, appends results to RESULTS.md."""
import json, os, time
os.chdir(os.path.dirname(os.path.abspath(__file__)))

from speech_separation_tpu.train.loop import TrainLoopConfig, train_with_restarts, latest_intermediate_epoch
from speech_separation_tpu.eval import (generate_masks, reconstruct_sources,
                                        evaluate_sources)

assert os.path.isfile("data/syn_tt/feats_test.scp"), "run run_demo.py first"

start = latest_intermediate_epoch("exp/RSH_syn_tr")
mk = {"hidden": "128", "num_layers": "2", "compute_dtype": "bfloat16"}
t0 = time.time()
out = train_with_restarts("data/syn_tr", "exp/RSH_syn_tr",
            TrainLoopConfig(arch="RSH", batch_size=32, num_epochs=40,
                            time_pad_multiple=64, seed=0, start_epoch=start),
            max_restarts=3,
            cv_data_dir="data/syn_cv", model_kwargs=mk)
print(f"train wall: {time.time()-t0:.0f}s", flush=True)

out_dir = "exp/RSH_syn_tr/output_final/syn_tt"
generate_masks("exp/RSH_syn_tr/final.mdl", "data/syn_tt",
               os.path.join(out_dir, "masks"), batch_size=32,
               time_pad_multiple=64)
reconstruct_sources("data/syn_tt", out_dir)
means = evaluate_sources("data/syn_tt", out_dir)
print(json.dumps(means), flush=True)

with open("RESULTS.md", "a") as f:
    f.write("\n## RSH (iterative extraction) on the same corpus\n\n")
    f.write("Same recipe, `--arch RSH` (2x128 BLSTM, 40 epochs, bf16+Pallas;\n")
    f.write("one mask per pass, greedy source assignment, residual attention):\n\n")
    f.write("| metric | separated |\n|---|---|\n")
    for m in ("SDR", "SIR", "SAR", "SI-SDR", "SI-SDRi"):
        f.write(f"| {m} | {means[m]:.2f} dB |\n")
