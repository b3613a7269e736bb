#!/usr/bin/env python3
"""Quality check for the round-4 activation STORAGE dtype change: the
time-domain archs now keep between-op activations in bfloat16 on the
compute_dtype=bfloat16 perf path (matmul accumulation and all norm
statistics stay f32 — models/{tcn,convtasnet,dprnn,sepformer}.py). The
step-time win is measured (tools/convtasnet_anatomy.py: 1.70x on the
separator grad, 133->98 ms full step); this script measures the QUALITY
side at full model size: 15-epoch probes on the same full-size demo
corpus (same generator/seeds as run_demo_timedomain_fullsize.py), tuned
recipe (clip 5, lr decay 0.99 — demo/RESULTS.md like-for-like table),
comparing compute_dtype=float32 against bfloat16 per arch. Losses are
mean per-utterance -SI-SNR dB, so a gap of 0.1 means 0.1 dB.

Prints a JSON table to stdout; transcribe it into demo/RESULTS.md
("Storage-dtype quality probe") by hand.
Run from demo/ on the chip:  PYTHONPATH=..:/root/.axon_site \
    python sweep_storage_dtype.py   (SWEEP_ARCHS=ConvTasNet to subset)
"""
import json, os, time
os.chdir(os.path.dirname(os.path.abspath(__file__)))

from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
from speech_separation_tpu.train.loop import TrainLoopConfig, train
from speech_separation_tpu.utils.compile_cache import enable_compilation_cache
from speech_separation_tpu.utils.synthetic import (make_synthetic_corpus,
                                                   write_id_list)

enable_compilation_cache()

NTR, NCV, NTT = 1024, 64, 64
if not os.path.isfile("data/fs_tr/wav.scp"):
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

ARCHS = os.environ.get("SWEEP_ARCHS", "ConvTasNet,DPRNN,SepFormer").split(",")
EPOCHS = int(os.environ.get("SWEEP_EPOCHS", 15))
rows = {}
for arch in ARCHS:
    for dtype in ("float32", "bfloat16"):
        tag = f"{arch}_{dtype}"
        exp = f"exp/sweep_dtype_{tag}"
        t0 = time.time()
        out = train("data/fs_tr", exp,
                    TrainLoopConfig(arch=arch, batch_size=32,
                                    num_epochs=EPOCHS, seed=0, cv_every=5,
                                    checkpoint_every=100, grad_clip=5.0,
                                    lr_decay=0.99, on_device_features=True,
                                    make_plots=False),
                    cv_data_dir="data/fs_cv",
                    model_kwargs={"compute_dtype": dtype, "remat": "0"})
        wall = time.time() - t0
        losses = [float(l.split()[1]) for l in
                  open(f"{exp}/train_stats/train_loss.txt") if l.strip()]
        cv = [float(l.split()[1]) for l in
              open(f"{exp}/train_stats/cv_loss.txt") if l.strip()]
        # cv_loss.txt is empty when EPOCHS < cv_every (no CV pass ran)
        cv_final = cv[-1] if cv else float("nan")
        rows[tag] = {"train_final": losses[-1], "cv_final": cv_final,
                     "wall_s": round(wall),
                     "utts_per_sec": round(out["utts_per_sec"], 1)}
        print(f"{tag}: train {losses[-1]:.2f} cv {cv_final:.2f} "
              f"wall {wall:.0f}s ({rows[tag]['utts_per_sec']} utts/s)",
              flush=True)

print(json.dumps(rows, indent=1))
