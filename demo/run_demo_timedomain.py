#!/usr/bin/env python3
"""Time-domain end-to-end learning demonstration: Conv-TasNet and DPRNN
(the beyond-reference DOMAIN='time' archs, models/convtasnet.py +
models/dprnn.py) trained waveform-direct on the same synthetic 2-speaker
corpus as the uPIT/RSH/TCN demos (run_demo.py), same recipe (40 epochs,
batch 32, bf16 perf path, ~0.9M params each to match the demo uPIT
BLSTM), scored through the fused wav->separated-wavs pipeline with the
same BSS-eval — so the RESULTS.md table compares all five archs
like-for-like. Appends one section to RESULTS.md. Idempotent; resumes
from checkpoints."""
import json, os, time
os.chdir(os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from demo_corpus import ensure_demo_corpus, replace_results_section
from speech_separation_tpu.train.loop import TrainLoopConfig, train
from speech_separation_tpu.eval.pipeline import SeparationPipeline
from speech_separation_tpu.eval.score import evaluate_sources
from speech_separation_tpu.datadir.scp import read_scp
from speech_separation_tpu.utils.audio import (limit_peak, load_wav,
                                               wav_num_samples,
                                               write_wav_int16)

HEADER = "## Time-domain archs (Conv-TasNet, DPRNN) on the same corpus"
ensure_demo_corpus()

# ~0.9M params each, comparable to the demo's uPIT 2x128 BLSTM (~0.92M)
MODELS = {
    "ConvTasNet": {"n_filters": "128", "filter_len": "16", "stride": "8",
                   "channels": "128", "hidden": "256", "blocks": "4",
                   "repeats": "2", "compute_dtype": "bfloat16"},
    "DPRNN": {"n_filters": "64", "filter_len": "16", "stride": "8",
              "channels": "64", "rnn_hidden": "128", "chunk": "100",
              "blocks": "2", "compute_dtype": "bfloat16"},
}

results, walls = {}, {}
for arch, mk in MODELS.items():
    exp = f"exp/{arch}_syn_tr"
    start_epoch = 0
    if os.path.isdir(f"{exp}/intermediate_models"):
        done = [int(f[:3]) for f in os.listdir(f"{exp}/intermediate_models")
                if f[:3].isdigit()]
        if done:
            start_epoch = max(done)
            print(f"== {arch}: resuming from epoch {start_epoch} ==",
                  flush=True)

    print(f"== {arch}: train (waveform-direct, SI-SNR uPIT) ==", flush=True)
    t0 = time.time()
    train("data/syn_tr", exp,
          TrainLoopConfig(arch=arch, batch_size=32, num_epochs=40, seed=0,
                          on_device_features=True, start_epoch=start_epoch),
          cv_data_dir="data/syn_cv", model_kwargs=mk)
    walls[arch] = time.time() - t0
    print(f"{arch} train wall: {walls[arch]:.0f}s", flush=True)

    print(f"== {arch}: fused separation + scoring ==", flush=True)
    out_dir = f"{exp}/output_final/syn_tt"
    pipe = SeparationPipeline(f"{exp}/final.mdl", model_kwargs=mk,
                              batch_size=32)
    entries = read_scp("data/syn_tt/wav.scp")
    lengths = [wav_num_samples(p) for _, p in entries]
    loader = lambda i: load_wav(entries[i][1], sr=8000)[0]
    for i, ests in pipe.separate_stream(loader, lengths):
        utt = entries[i][0]
        # SI-SNR-trained tracks are arbitrarily scaled; one shared gain
        # keeps them in int16 range (scoring is scale-invariant)
        for s, est in enumerate(limit_peak(ests)):
            d = os.path.join(out_dir, "wav", f"s{s + 1}")
            os.makedirs(d, exist_ok=True)
            write_wav_int16(os.path.join(d, f"{utt}.wav"), 8000, est)
    results[arch] = evaluate_sources("data/syn_tt", out_dir)

import jax
section = [f"\n{HEADER}\n\n"]
section.append(
    "Same corpus and recipe (40 epochs, batch 32, bf16, ~0.9M params),\n"
    "but trained waveform-direct with uPIT negative SI-SNR — no STFT, no\n"
    "masks, no iSTFT; the whole wav -> separated-wavs program is one XLA\n"
    "executable (models/convtasnet.py, models/dprnn.py), served through\n"
    f"the fused pipeline. Trained/run on {jax.devices()[0].platform}.\n")
section.append("\n| metric | Conv-TasNet | DPRNN |\n|---|---|---|\n")
for m in ("SDR", "SIR", "SAR", "SI-SDR", "SI-SDRi"):
    section.append(f"| {m} | {results['ConvTasNet'][m]:.2f} dB "
                   f"| {results['DPRNN'][m]:.2f} dB |\n")
section.append(
    f"\nTrain wall: Conv-TasNet {walls['ConvTasNet']:.0f}s, DPRNN "
    f"{walls['DPRNN']:.0f}s (incl. host pipeline + compiles).\n"
    "\nThe scored SI-SDR matches each model's training/CV SI-SNR to\n"
    "~0.1 dB — the fused serving + int16 wav + scoring chain is lossless\n"
    "(the shared-gain `limit_peak` write keeps SI-SNR-scaled tracks inside\n"
    "the wav range). On THIS corpus the spectral archs score higher (uPIT\n"
    "BLSTM 24.81 dB SDR above): its spectrally-disjoint tone voices are\n"
    "the ideal case for STFT masking, the regime time-domain bases exist\n"
    "to escape on real speech (Luo & Mesgarani 2019 report the reverse\n"
    "ordering on WSJ0-2mix by a wide margin).\n")
replace_results_section(HEADER, section)
print(json.dumps({k: {m: round(v, 2) for m, v in r.items()}
                  for k, r in results.items()}))
