#!/usr/bin/env python3
"""Full-size end-to-end demonstration on the real TPU: the REFERENCE-SCALE
model (uPIT BLSTM 2x600, ~13.4 M params — archs/uPIT.py:115-119) trained
waveform-direct (STFT inside the train step, no feature files) on a
synthetic 2-speaker corpus, evaluated masks -> wavs -> device BSS-eval.
Appends a section to demo/RESULTS.md.

The small-model demos (run_demo*.py) establish learning + scoring; this
one establishes the flagship configuration end-to-end: full model size,
bf16 + Pallas kernels, waveform-direct input, device scoring.
"""
import json
import os
import time

os.chdir(os.path.dirname(os.path.abspath(__file__)))

from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
from speech_separation_tpu.dsp import STFTConfig
from speech_separation_tpu.dsp.extract import extract_features
from speech_separation_tpu.train.loop import (TrainLoopConfig,
                                              latest_intermediate_epoch,
                                              train_with_restarts)
from speech_separation_tpu.eval import (generate_masks, reconstruct_sources,
                                        evaluate_sources)
from speech_separation_tpu.utils.compile_cache import enable_compilation_cache
from speech_separation_tpu.utils.synthetic import make_synthetic_corpus, write_id_list

enable_compilation_cache()
t_all = time.time()

NTR, NCV, NTT = 1024, 64, 64
if not os.path.isfile("data/fs_tt/feats_test.scp"):
    print("== corpus ==", flush=True)
    ids_tr = make_synthetic_corpus("corpus/fs_tr", NTR, seed=10,
                                   min_sec=2.0, max_sec=4.0, prefix="fstr")
    ids_cv = make_synthetic_corpus("corpus/fs_cv", NCV, seed=11,
                                   min_sec=2.0, max_sec=4.0, prefix="fscv")
    ids_tt = make_synthetic_corpus("corpus/fs_tt", NTT, seed=12,
                                   min_sec=2.0, max_sec=4.0, prefix="fstt")
    write_id_list("id_lists", "fs_tr", ids_tr)
    write_id_list("id_lists", "fs_cv", ids_cv)
    write_id_list("id_lists", "fs_tt", ids_tt)
    reg = DatasetRegistry({"fs_tr": "corpus/fs_tr", "fs_cv": "corpus/fs_cv",
                           "fs_tt": "corpus/fs_tt"})
    for ds in ("fs_tr", "fs_cv", "fs_tt"):
        prepare_data_dir(ds, reg)
    # only the TEST set needs stored features (complex mix spectra for
    # reconstruction); training is waveform-direct
    extract_features("data/fs_tt", "test", "feats/fs_tt_test", STFTConfig(),
                     compress=False)

print("== train (2x600, waveform-direct, bf16+Pallas) ==", flush=True)
mk = {"hidden": "600", "num_layers": "2", "compute_dtype": "bfloat16"}
start_epoch = latest_intermediate_epoch("exp/uPIT_fs_tr")
if start_epoch:
    print(f"== resuming from epoch {start_epoch} ==", flush=True)
t0 = time.time()
out = train_with_restarts(
    "data/fs_tr", "exp/uPIT_fs_tr",
    TrainLoopConfig(arch="uPIT", batch_size=64, num_epochs=30,
                    time_pad_multiple=64, seed=0, start_epoch=start_epoch,
                    on_device_features=True, stft=STFTConfig()),
    max_restarts=4, cv_data_dir="data/fs_cv", model_kwargs=mk)
train_wall = time.time() - t0
print(f"train wall: {train_wall:.0f}s", flush=True)

print("== eval (masks -> wavs -> device BSS-eval) ==", flush=True)
out_dir = "exp/uPIT_fs_tr/output_final/fs_tt"
generate_masks("exp/uPIT_fs_tr/final.mdl", "data/fs_tt",
               os.path.join(out_dir, "masks"), model_kwargs=mk,
               batch_size=32, time_pad_multiple=64)
reconstruct_sources("data/fs_tt", out_dir)
means = evaluate_sources("data/fs_tt", out_dir, device=True)

with open("RESULTS.md", "a") as f:
    f.write("\n## Full-size model (2x600, ~13.4 M params) at the reference "
            "training configuration\n\n")
    f.write("The flagship path end-to-end on the TPU: waveform-direct "
            "training (STFT inside\nthe jit'd train step, no feature "
            "files), bf16 + Pallas kernels, device\nBSS-eval scoring. "
            f"Corpus: {NTR}/{NCV}/{NTT} synthetic 2-speaker mixtures, "
            "2-4 s at 8 kHz.\n\n")
    f.write("- model: uPIT BLSTM 2x600 (the reference's size, "
            "archs/uPIT.py:115-119), 30 epochs, batch 64\n")
    f.write(f"- train wall: {train_wall:.0f}s "
            f"({out['utts_per_sec']:.1f} utts/sec end-to-end incl. host "
            "pipeline + compiles)\n")
    f.write(f"- scored on device (--device-scoring path)\n\n")
    f.write("| metric | held-out test set |\n|---|---|\n")
    for m in ("SDR", "SIR", "SAR", "SI-SDR", "SI-SDRi"):
        f.write(f"| {m} | {means[m]:.2f} dB |\n")
print(json.dumps({"means": means, "train_wall_s": train_wall,
                  "utts_per_sec": out.get("utts_per_sec")}))
print(f"total wall: {time.time()-t_all:.0f}s", flush=True)
