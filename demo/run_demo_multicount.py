#!/usr/bin/env python3
"""Variable-speaker-count demonstration on the real TPU: RSH's core
capability (one model, 1/2/3-speaker mixtures — archs/RSH.py:197-259 runs
num_spk extraction passes per sub-batch) driven end-to-end: mixed-count
corpus -> train -> masks -> wavs -> BSS-eval per count. Appends to
demo/RESULTS.md.

The reference corpora are all 2-speaker; this exercises the paths the
reference has but never ships data for: speaker-count sub-batching at
train, per-count mask passes at eval, per-utterance num_src scoring.
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
from speech_separation_tpu.utils.synthetic import (make_synthetic_corpus_var,
                                                   write_id_list)

enable_compilation_cache()
t_all = time.time()

NTR, NCV, NTT = 384, 48, 48
if not os.path.isfile("data/mc_tt/feats_test.scp"):
    print("== corpus (1/2/3-speaker mixtures) ==", flush=True)
    sets = {}
    # train/cv carry 1/2/3-speaker mixtures (exercises count sub-batching
    # incl. the degenerate source1=mix rule); the scored test set uses 2/3
    # only — a 1-speaker 'mixture' IS its source, making SI-SDR of the
    # mixture baseline infinite and the improvement metric degenerate
    for name, n, seed, counts in (("mc_tr", NTR, 20, (1, 2, 3)),
                                  ("mc_cv", NCV, 21, (1, 2, 3)),
                                  ("mc_tt", NTT, 22, (2, 3))):
        ids = make_synthetic_corpus_var(f"corpus/{name}", n, seed=seed,
                                        min_sec=0.8, max_sec=1.6,
                                        prefix=name.replace("_", ""),
                                        counts=counts)
        write_id_list("id_lists", name, ids)
        sets[name] = f"corpus/{name}"
    reg = DatasetRegistry(sets)
    for ds in sets:
        prepare_data_dir(ds, reg)
    cfg = STFTConfig()
    extract_features("data/mc_tr", "train", "feats/mc_tr_train", cfg,
                     compress=False)
    extract_features("data/mc_cv", "train", "feats/mc_cv_train", cfg,
                     compress=False)
    extract_features("data/mc_tt", "test", "feats/mc_tt_test", cfg,
                     compress=False)

print("== train RSH on mixed counts ==", flush=True)
mk = {"hidden": "128", "num_layers": "2", "compute_dtype": "bfloat16"}
start_epoch = latest_intermediate_epoch("exp/RSH_mc_tr")
if start_epoch:
    print(f"== resuming from epoch {start_epoch} ==", flush=True)
t0 = time.time()
out = train_with_restarts(
    "data/mc_tr", "exp/RSH_mc_tr",
    TrainLoopConfig(arch="RSH", batch_size=32, num_epochs=40,
                    time_pad_multiple=64, seed=0, start_epoch=start_epoch),
    max_restarts=4, cv_data_dir="data/mc_cv", model_kwargs=mk)
train_wall = time.time() - t0
print(f"train wall: {train_wall:.0f}s", flush=True)

print("== eval ==", flush=True)
out_dir = "exp/RSH_mc_tr/output_final/mc_tt"
generate_masks("exp/RSH_mc_tr/final.mdl", "data/mc_tt",
               os.path.join(out_dir, "masks"), model_kwargs=mk,
               batch_size=32, time_pad_multiple=64, arch_name="RSH")
reconstruct_sources("data/mc_tt", out_dir)
means = evaluate_sources("data/mc_tt", out_dir)

# per-count breakdown from the per-utterance result files
from speech_separation_tpu.datadir.scp import read_utt2num_spk
n_spk = read_utt2num_spk("data/mc_tt/utt2num_spk")
per_count = {}
with open(os.path.join(out_dir, "results", "session_SI-SDRis.txt")) as f:
    for line in f:
        utt, val = line.split()
        per_count.setdefault(n_spk[utt], []).append(float(val))
breakdown = {c: sum(v) / len(v) for c, v in sorted(per_count.items())}
print("per-count SI-SDRi:", breakdown, flush=True)

with open("RESULTS.md", "a") as f:
    f.write("\n## Variable speaker counts (RSH, one model for 1/2/3-speaker"
            " mixtures)\n\n")
    f.write("The reference corpora are all 2-speaker; this drives the "
            "variable-count paths\n(speaker-count sub-batching, per-count "
            "extraction passes, per-utterance num_src\nscoring) end-to-end "
            f"on the TPU. Corpus: {NTR}/{NCV}/{NTT} mixtures cycling "
            "1/2/3\nspectrally-disjoint voices; RSH 2x128, 40 epochs.\n\n")
    f.write(f"- train wall: {train_wall:.0f}s "
            f"({out['utts_per_sec']:.1f} utts/sec end-to-end)\n\n")
    f.write("| metric | all | 2-spk | 3-spk |\n|---|---|---|---|\n")
    f.write(f"| SI-SDRi | {means['SI-SDRi']:.2f} dB | "
            + " | ".join(f"{breakdown.get(c, float('nan')):.2f} dB"
                         for c in (2, 3)) + " |\n")
    f.write(f"\nmean SDR {means['SDR']:.2f} / SIR {means['SIR']:.2f} / "
            f"SAR {means['SAR']:.2f} dB over all sources.\n")
print(json.dumps({"means": means, "per_count_si_sdri": breakdown,
                  "train_wall_s": train_wall}))
print(f"total wall: {time.time()-t_all:.0f}s", flush=True)
