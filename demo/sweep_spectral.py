#!/usr/bin/env python3
"""Full-size RSH / uPIT quality investigation (VERDICT round-4 #2): the
like-for-like tuned table stops at the time-domain trio, and full-size
RSH's 16.55 dB (vs 23.17 for the SMALL RSH) is explained only by a
plausible-but-unproven "overfits the 1024-utt corpus" story — exactly the
kind of story the round-4 DPRNN sweep disproved. Method copied from
demo/sweep_dprnn.py: cheap 15-epoch probes on the same full-size demo
corpus (same generator/seeds as run_demo_fullsize.py), full model size
(2x600), comparing:

  H1 (schedule): the reference clip 0.25 binds the 14M-param RSH's
      gradients; the time-domain tuned recipe (clip 5, lr decay 0.99)
      lifted DPRNN +7.3 dB — does it move a spectral-MSE arch too?
  H2 (updates): batch 64 gives only 16 updates/epoch; batch 32 doubles
      the update count at identical data.
  H3 (capacity/overfit): the recorded signature (train 0.0015 vs CV
      0.029 at epoch 30) says memorization. If it is REALLY the corpus
      size, 4x the data (4096 utts, new seeds, same generator) must
      shrink the CV gap at matched updates. This is the decisive probe:
      schedule tweaks cannot fake it.

Losses are magnitude-STFT MSE (not dB). Prints a JSON table; transcribe
into demo/RESULTS.md (RSH root-cause section). The winners get full
tuned runs in run_demo_rsh_tuned.py / run_demo_upit_tuned.py.
Run from demo/ on the chip:  PYTHONPATH=..:/root/.axon_site \
    python sweep_spectral.py   (SWEEP_ARCHS=RSH to subset)
"""
import json, os, time
os.chdir(os.path.dirname(os.path.abspath(__file__)))

from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
from speech_separation_tpu.dsp import STFTConfig
from speech_separation_tpu.train.loop import TrainLoopConfig, train
from speech_separation_tpu.utils.compile_cache import enable_compilation_cache
from speech_separation_tpu.utils.synthetic import (make_synthetic_corpus,
                                                   write_id_list)

enable_compilation_cache()

NTR, NCV = 1024, 64
sets = {"fs_tr": (NTR, 10, "fstr"), "fs_cv": (NCV, 11, "fscv"),
        "fs_tt": (64, 12, "fstt"),
        # H3 probe corpus: 4x the training data, fresh seed, same generator
        "fsbig_tr": (4 * NTR, 40, "fsbig")}
missing = [ds for ds in sets if not os.path.isfile(f"data/{ds}/wav.scp")]
if missing:
    print(f"== corpus ({missing}) ==", flush=True)
    for ds in missing:
        n, seed, prefix = sets[ds]
        ids = make_synthetic_corpus(f"corpus/{ds}", n, seed=seed,
                                    min_sec=2.0, max_sec=4.0, prefix=prefix)
        write_id_list("id_lists", ds, ids)
    reg = DatasetRegistry({ds: f"corpus/{ds}" for ds in sets})
    for ds in missing:
        prepare_data_dir(ds, reg)

MK = {"hidden": "600", "num_layers": "2", "compute_dtype": "bfloat16"}
# tag -> (arch, train dir, loop kwargs)
VARIANTS = {
    # control: the shipped full-size recipe (run_demo_rsh_fullsize.py)
    "RSH_base_b64": ("RSH", "data/fs_tr", dict(batch_size=64)),
    # H2: double the updates at identical data
    "RSH_b32": ("RSH", "data/fs_tr", dict(batch_size=32)),
    # H1: the time-domain tuned schedule
    "RSH_clip5_b64": ("RSH", "data/fs_tr", dict(batch_size=64, grad_clip=5.0)),
    "RSH_clip5_decay_b64": ("RSH", "data/fs_tr",
                            dict(batch_size=64, grad_clip=5.0, lr_decay=0.99)),
    # H3: 4x data at the same batch = 4x updates/epoch. cv_every=1 so the
    # decisive comparison exists at MATCHED update count (data4x epoch 4
    # ~= 256 updates vs the control's 240 at epoch 15) and the curve shows
    # whether more data keeps CV improving where the controls regress.
    "RSH_data4x_b64": ("RSH", "data/fsbig_tr",
                       dict(batch_size=64, num_epochs=15, cv_every=1)),
    # uPIT: is the untuned 30-epoch 23.45 dB schedule-limited too?
    "uPIT_base_b64": ("uPIT", "data/fs_tr", dict(batch_size=64)),
    "uPIT_clip5_decay_b64": ("uPIT", "data/fs_tr",
                             dict(batch_size=64, grad_clip=5.0,
                                  lr_decay=0.99)),
}

EPOCHS = int(os.environ.get("SWEEP_EPOCHS", 15))
only = os.environ.get("SWEEP_ARCHS")
tags = os.environ.get("SWEEP_TAGS")  # exact-tag subset, comma-separated
rows = {}
for tag, (arch, data_dir, loop_kw) in VARIANTS.items():
    if only and not any(tag.startswith(a) for a in only.split(",")):
        continue
    if tags and tag not in tags.split(","):
        continue
    cfg_kw = dict(num_epochs=EPOCHS, cv_every=5)
    cfg_kw.update(loop_kw)
    epochs = cfg_kw["num_epochs"]
    exp = f"exp/sweep_{tag}"
    t0 = time.time()
    out = train(data_dir, exp,
                TrainLoopConfig(arch=arch, seed=0,
                                checkpoint_every=100,
                                time_pad_multiple=64,
                                on_device_features=True, stft=STFTConfig(),
                                make_plots=False, **cfg_kw),
                cv_data_dir="data/fs_cv", model_kwargs=MK)
    wall = time.time() - t0
    losses = [float(l.split()[1]) for l in
              open(f"{exp}/train_stats/train_loss.txt") if l.strip()]
    cv = [(int(l.split()[0]), float(l.split()[1])) for l in
          open(f"{exp}/train_stats/cv_loss.txt") if l.strip()]
    rows[tag] = {"train_final": losses[-1],
                 "train_ep5": losses[min(4, len(losses) - 1)],
                 "cv": {f"ep{e}": v for e, v in cv},
                 "epochs": epochs, "wall_s": round(wall),
                 "utts_per_sec": round(out["utts_per_sec"], 1)}
    cv_str = " ".join(f"cv@{e}={v:.4f}" for e, v in cv)
    print(f"{tag}: train {losses[-1]:.5f} {cv_str} wall {wall:.0f}s",
          flush=True)

print(json.dumps(rows, indent=1))
