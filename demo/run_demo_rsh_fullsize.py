#!/usr/bin/env python3
"""Full-size RSH demonstration on the real TPU: the reference-scale
iterative-extraction model (RSH BLSTM 2x600 over the 2*257-dim combo
input — archs/RSH.py:141-187) trained waveform-direct on the same
synthetic corpus as run_demo_fullsize.py, evaluated masks -> wavs ->
device BSS-eval. Appends a section to demo/RESULTS.md.

Run run_demo_fullsize.py first (it creates the corpus + test features).
"""
import json
import os
import time

os.chdir(os.path.dirname(os.path.abspath(__file__)))

from speech_separation_tpu.dsp import STFTConfig
from speech_separation_tpu.train.loop import (TrainLoopConfig,
                                              latest_intermediate_epoch,
                                              train_with_restarts)
from speech_separation_tpu.eval import (generate_masks, reconstruct_sources,
                                        evaluate_sources)
from speech_separation_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
t_all = time.time()
assert os.path.isfile("data/fs_tt/feats_test.scp"), \
    "run run_demo_fullsize.py first (creates corpus/fs_* and test feats)"

print("== train RSH (2x600, waveform-direct, bf16+Pallas) ==", flush=True)
mk = {"hidden": "600", "num_layers": "2", "compute_dtype": "bfloat16"}
start_epoch = latest_intermediate_epoch("exp/RSH_fs_tr")
if start_epoch:
    print(f"== resuming from epoch {start_epoch} ==", flush=True)
t0 = time.time()
out = train_with_restarts(
    "data/fs_tr", "exp/RSH_fs_tr",
    TrainLoopConfig(arch="RSH", batch_size=64, num_epochs=60,
                    time_pad_multiple=64, seed=0, start_epoch=start_epoch,
                    on_device_features=True, stft=STFTConfig()),
    max_restarts=4, cv_data_dir="data/fs_cv", model_kwargs=mk)
train_wall = time.time() - t0
print(f"train wall: {train_wall:.0f}s", flush=True)

print("== eval (masks -> wavs -> device BSS-eval) ==", flush=True)
out_dir = "exp/RSH_fs_tr/output_final/fs_tt"
generate_masks("exp/RSH_fs_tr/final.mdl", "data/fs_tt",
               os.path.join(out_dir, "masks"), model_kwargs=mk,
               batch_size=32, time_pad_multiple=64, arch_name="RSH")
reconstruct_sources("data/fs_tt", out_dir)
means = evaluate_sources("data/fs_tt", out_dir, device=True)

with open("RESULTS.md", "a") as f:
    f.write("\n## Full-size RSH (2x600 iterative extraction), same corpus\n\n")
    f.write("- model: RSH BLSTM 2x600 over the 514-dim combo input "
            "(archs/RSH.py:141-187), 60 epochs, batch 64, waveform-direct\n")
    f.write(f"- train wall: {train_wall:.0f}s "
            f"({out['utts_per_sec']:.1f} utts/sec end-to-end)\n")
    f.write("- scored on device (--device-scoring path)\n\n")
    f.write("| metric | held-out test set |\n|---|---|\n")
    for m in ("SDR", "SIR", "SAR", "SI-SDR", "SI-SDRi"):
        f.write(f"| {m} | {means[m]:.2f} dB |\n")
print(json.dumps({"means": means, "train_wall_s": train_wall,
                  "utts_per_sec": out.get("utts_per_sec")}))
print(f"total wall: {time.time()-t_all:.0f}s", flush=True)
