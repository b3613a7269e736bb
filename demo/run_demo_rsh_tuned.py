#!/usr/bin/env python3
"""Full-size RSH under the tuned schedule (VERDICT round-4 #2): the
like-for-like table's recipe (grad clip 5, lr decay 0.99, 100 epochs —
the one that lifted DPRNN +7.3 dB and Conv-TasNet +2.2 dB) applied to
the reference's second flagship arch at full size (2x600 over the
514-dim combo input, archs/RSH.py:141-187), on the same corpus as every
other like-for-like row. Batch 64, matching the 60-epoch full-size row:
the sweep (demo/sweep_spectral.py) found batch 32's doubled update count
only overfits harder (CV 0.0305 vs 0.0263 at epoch 15), so the tuned run
isolates schedule+epochs at the original batch. Transcribe the sweep
JSON into RESULTS.md alongside.

Appends a section to demo/RESULTS.md. Creates the corpus + test feats if
run_demo_fullsize.py hasn't already.
Run from demo/ on the chip:  PYTHONPATH=..:/root/.axon_site \
    python run_demo_rsh_tuned.py
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

print(f"== train RSH tuned (2x600, clip {CLIP}, decay {DECAY}, "
      f"{EPOCHS} epochs, batch {BATCH}) ==", flush=True)
mk = {"hidden": "600", "num_layers": "2", "compute_dtype": "bfloat16"}
exp = "exp/RSH_tuned_fs_tr"
start_epoch = latest_intermediate_epoch(exp)
if start_epoch:
    print(f"== resuming from epoch {start_epoch} ==", flush=True)
t0 = time.time()
out = train_with_restarts(
    "data/fs_tr", exp,
    TrainLoopConfig(arch="RSH", batch_size=BATCH, num_epochs=EPOCHS,
                    grad_clip=CLIP, lr_decay=DECAY,
                    time_pad_multiple=64, seed=0, start_epoch=start_epoch,
                    on_device_features=True, stft=STFTConfig(),
                    make_plots=False),
    max_restarts=4, cv_data_dir="data/fs_cv", model_kwargs=mk)
train_wall = time.time() - t0
print(f"train wall: {train_wall:.0f}s", flush=True)

def eval_model(mdl_path: str, out_dir: str) -> dict:
    generate_masks(mdl_path, "data/fs_tt",
                   os.path.join(out_dir, "masks"), model_kwargs=mk,
                   batch_size=32, time_pad_multiple=64, arch_name="RSH")
    reconstruct_sources("data/fs_tt", out_dir)
    return evaluate_sources("data/fs_tt", out_dir, device=True)


print("== eval final (masks -> wavs -> device BSS-eval) ==", flush=True)
means = eval_model(f"{exp}/final.mdl", f"{exp}/output_final/fs_tt")

# The sweep's CV curves (demo/sweep_spectral.py) put the generalization
# minimum near epoch 5 in EVERY full-size variant — so also evaluate the
# best-CV intermediate (the reference supports exactly this via
# qsub_eval.sh's intermediate-model select; here: --intermediate-model-num).
cv = [(int(l.split()[0]), float(l.split()[1])) for l in
      open(f"{exp}/train_stats/cv_loss.txt") if l.strip()]
best_ep = min(cv, key=lambda t: t[1])[0] if cv else None
means_best = None
if best_ep and os.path.isfile(f"{exp}/intermediate_models/{best_ep:03d}.mdl"):
    print(f"== eval best-CV intermediate (epoch {best_ep}) ==", flush=True)
    means_best = eval_model(f"{exp}/intermediate_models/{best_ep:03d}.mdl",
                            f"{exp}/output_{best_ep:03d}/fs_tt")

with open("RESULTS.md", "a") as f:
    f.write("\n## Full-size RSH with the tuned recipe, same corpus\n\n")
    f.write(f"- RSH BLSTM 2x600, clip {CLIP}, lr decay {DECAY}, "
            f"{EPOCHS} epochs, batch {BATCH}, waveform-direct "
            "(sweep evidence: demo/sweep_spectral.py)\n")
    f.write(f"- train wall: {train_wall:.0f}s "
            f"({out['utts_per_sec']:.1f} utts/sec end-to-end)\n\n")
    hdr = "| metric | tuned final"
    if means_best is not None:
        hdr += f" | tuned ep{best_ep} (best CV)"
    f.write(hdr + " | (ref-recipe 60-ep full-size) | (small 2x128 RSH) |\n")
    f.write("|---" * (4 + (means_best is not None)) + "|\n")
    prev = {"SDR": 16.55, "SIR": 21.08, "SAR": 20.92, "SI-SDR": 12.95,
            "SI-SDRi": 12.95}   # RESULTS.md full-size RSH, 60-epoch column
    small = {"SDR": 23.17, "SIR": 25.91, "SAR": 27.94, "SI-SDR": 20.76,
             "SI-SDRi": 20.76}  # RESULTS.md small 2x128 RSH
    for m in ("SDR", "SIR", "SAR", "SI-SDR", "SI-SDRi"):
        row = f"| {m} | {means[m]:.2f} dB"
        if means_best is not None:
            row += f" | {means_best[m]:.2f} dB"
        f.write(row + f" | {prev[m]:.2f} dB | {small[m]:.2f} dB |\n")
print(json.dumps({"means": means, "means_best_cv": means_best,
                  "best_cv_epoch": best_ep, "train_wall_s": train_wall,
                  "utts_per_sec": out.get("utts_per_sec")}))
print(f"total wall: {time.time()-t_all:.0f}s", flush=True)
