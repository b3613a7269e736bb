#!/usr/bin/env python3
"""Full-size uPIT under the tuned schedule (VERDICT round-4 #2): the
2x600 uPIT's 23.45 dB like-for-like row is an untuned 30-epoch number
standing against 100-epoch tuned time-domain competitors. This run gives
the reference's flagship arch the same treatment (grad clip 5, lr decay
0.99, 100 epochs) on the same corpus. Sweep probes in
demo/sweep_spectral.py justify the knob choices; transcribe both into
RESULTS.md.

Appends a section to demo/RESULTS.md. Creates corpus + test feats if
needed. Run from demo/ on the chip:  PYTHONPATH=..:/root/.axon_site \
    python run_demo_upit_tuned.py
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
from speech_separation_tpu.utils.synthetic import (make_synthetic_corpus,
                                                   write_id_list)

enable_compilation_cache()
t_all = time.time()

NTR, NCV, NTT = 1024, 64, 64
if not os.path.isfile("data/fs_tr/wav.scp"):
    print("== corpus ==", flush=True)
    for ds, n, seed, prefix in (("fs_tr", NTR, 10, "fstr"),
                                ("fs_cv", NCV, 11, "fscv"),
                                ("fs_tt", NTT, 12, "fstt")):
        ids = make_synthetic_corpus(f"corpus/{ds}", n, seed=seed,
                                    min_sec=2.0, max_sec=4.0, prefix=prefix)
        write_id_list("id_lists", ds, ids)
    reg = DatasetRegistry({ds: f"corpus/{ds}"
                           for ds in ("fs_tr", "fs_cv", "fs_tt")})
    for ds in ("fs_tr", "fs_cv", "fs_tt"):
        prepare_data_dir(ds, reg)
if not os.path.isfile("data/fs_tt/feats_test.scp"):
    extract_features("data/fs_tt", "test", "feats/fs_tt_test", STFTConfig())

EPOCHS = int(os.environ.get("TUNED_EPOCHS", 100))
BATCH = int(os.environ.get("TUNED_BATCH", 64))
CLIP = float(os.environ.get("TUNED_CLIP", 5.0))
DECAY = float(os.environ.get("TUNED_DECAY", 0.99))

print(f"== train uPIT tuned (2x600, clip {CLIP}, decay {DECAY}, "
      f"{EPOCHS} epochs, batch {BATCH}) ==", flush=True)
mk = {"hidden": "600", "num_layers": "2", "compute_dtype": "bfloat16"}
exp = "exp/uPIT_tuned_fs_tr"
start_epoch = latest_intermediate_epoch(exp)
if start_epoch:
    print(f"== resuming from epoch {start_epoch} ==", flush=True)
t0 = time.time()
out = train_with_restarts(
    "data/fs_tr", exp,
    TrainLoopConfig(arch="uPIT", batch_size=BATCH, num_epochs=EPOCHS,
                    grad_clip=CLIP, lr_decay=DECAY,
                    time_pad_multiple=64, seed=0, start_epoch=start_epoch,
                    on_device_features=True, stft=STFTConfig(),
                    make_plots=False),
    max_restarts=4, cv_data_dir="data/fs_cv", model_kwargs=mk)
train_wall = time.time() - t0
print(f"train wall: {train_wall:.0f}s", flush=True)

print("== eval (masks -> wavs -> device BSS-eval) ==", flush=True)
out_dir = f"{exp}/output_final/fs_tt"
generate_masks(f"{exp}/final.mdl", "data/fs_tt",
               os.path.join(out_dir, "masks"), model_kwargs=mk,
               batch_size=32, time_pad_multiple=64, arch_name="uPIT")
reconstruct_sources("data/fs_tt", out_dir)
means = evaluate_sources("data/fs_tt", out_dir, device=True)

with open("RESULTS.md", "a") as f:
    f.write("\n## Full-size uPIT with the tuned recipe, same corpus\n\n")
    f.write(f"- uPIT BLSTM 2x600, clip {CLIP}, lr decay {DECAY}, "
            f"{EPOCHS} epochs, batch {BATCH}, waveform-direct\n")
    f.write(f"- train wall: {train_wall:.0f}s "
            f"({out['utts_per_sec']:.1f} utts/sec end-to-end)\n\n")
    f.write("| metric | tuned | (ref-recipe 30-ep, 23.45 dB row) |\n"
            "|---|---|---|\n")
    prev = {"SDR": 23.45, "SIR": 26.95, "SAR": 25.67, "SI-SDR": 22.77,
            "SI-SDRi": 22.76}   # RESULTS.md full-size uPIT section
    for m in ("SDR", "SIR", "SAR", "SI-SDR", "SI-SDRi"):
        f.write(f"| {m} | {means[m]:.2f} dB | {prev[m]:.2f} dB |\n")
print(json.dumps({"means": means, "train_wall_s": train_wall,
                  "utts_per_sec": out.get("utts_per_sec")}))
print(f"total wall: {time.time()-t_all:.0f}s", flush=True)
