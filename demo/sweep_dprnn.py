#!/usr/bin/env python3
"""DPRNN full-size quality investigation (VERDICT round-3 weak #2): the
round-3 demo scored DPRNN 5.4 dB below Conv-TasNet on the same corpus,
the reverse of the literature ordering (Luo et al. 2020). Hypotheses:

  H1 (optimizer): the reference's grad clip 0.25 (train_qsub.py:121,
      inherited by every arch here) binds hard on DPRNN's recurrent
      gradients — Conv-TasNet-family training in the literature clips at
      5 — so the effective step size collapses and 30 epochs underfit.
  H2 (chunking): chunk=100 is mis-sized for 2-4 s utterances
      (T' = 2000-4000 latent frames; paper recommends K ~= sqrt(2T)).
  H3 (capacity/schedule): needs more epochs at this lr.

This script trains short (15-epoch) variants on the SAME full-size demo
corpus (same generator/seeds as run_demo_timedomain_fullsize.py) and
prints the final train/CV losses (mean per-utterance -SI-SNR dB: -20.0
means 20 dB). Cheap by design; the winner gets the full 60-epoch run in
run_demo_timedomain_fullsize.py. Results are recorded in
demo/RESULTS.md's DPRNN-anatomy section."""
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

BASE_MK = {"compute_dtype": "bfloat16", "remat": "1"}
VARIANTS = {
    # round-3 shipped config (the 19.1 dB SI-SDRi one), short-run control
    "base_clip0.25": (dict(), dict()),
    # H1: literature clip
    "clip5": (dict(grad_clip=5.0), dict()),
    # H1 interaction: lower lr under the looser clip
    "clip5_lr5e-4": (dict(grad_clip=5.0, learning_rate=5e-4), dict()),
    # H2: paper's K ~= sqrt(2T) for T'=2000-4000 is ~63-90; probe both
    # directions around the shipped 100
    "clip5_chunk64": (dict(grad_clip=5.0), {"chunk": "64"}),
    "clip5_chunk150": (dict(grad_clip=5.0), {"chunk": "150"}),
}

EPOCHS = int(os.environ.get("SWEEP_EPOCHS", 15))
rows = {}
for tag, (loop_kw, model_kw) in VARIANTS.items():
    exp = f"exp/sweep_DPRNN_{tag}"
    t0 = time.time()
    out = train("data/fs_tr", exp,
                TrainLoopConfig(arch="DPRNN", batch_size=32,
                                num_epochs=EPOCHS, seed=0, cv_every=5,
                                checkpoint_every=100,
                                on_device_features=True, make_plots=False,
                                **loop_kw),
                cv_data_dir="data/fs_cv",
                model_kwargs={**BASE_MK, **model_kw})
    wall = time.time() - t0
    losses = [float(l.split()[1]) for l in
              open(f"{exp}/train_stats/train_loss.txt") if l.strip()]
    cv = [float(l.split()[1]) for l in
          open(f"{exp}/train_stats/cv_loss.txt") if l.strip()]
    rows[tag] = {"train_final": losses[-1], "cv_final": cv[-1],
                 "train_ep5": losses[min(4, len(losses) - 1)],
                 "wall_s": round(wall), "utts_per_sec": round(out["utts_per_sec"], 1)}
    print(f"{tag}: train {losses[-1]:.2f} cv {cv[-1]:.2f} "
          f"(ep5 {losses[min(4, len(losses)-1)]:.2f}) wall {wall:.0f}s",
          flush=True)

print(json.dumps(rows, indent=1))
