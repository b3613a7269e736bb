#!/usr/bin/env python3
"""Online-separation demonstration: train the CAUSAL TCN on the shared
demo corpus, then separate every held-out test mixture through the
real-time streaming engine (50 ms microphone-style pushes) and score the
streamed output with BSS-eval — the numbers a live deployment would get.
Appends/updates a section in RESULTS.md. Idempotent; resumes."""
import json, os, time
os.chdir(os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from demo_corpus import ensure_demo_corpus, replace_results_section
from speech_separation_tpu.train.loop import TrainLoopConfig, train
from speech_separation_tpu.eval.streaming import StreamingSeparator
from speech_separation_tpu.eval.score import evaluate_sources
from speech_separation_tpu.datadir.scp import read_scp
from speech_separation_tpu.utils.audio import load_wav, write_wav_int16

HEADER = "## Online streaming separation (causal TCN) on the same corpus"
ensure_demo_corpus()

exp = "exp/TCNc_syn_tr"
start_epoch = 0
if os.path.isdir(f"{exp}/intermediate_models"):
    done = [int(f[:3]) for f in os.listdir(f"{exp}/intermediate_models")
            if f[:3].isdigit()]
    if done:
        start_epoch = max(done)
        print(f"== resuming from epoch {start_epoch} ==", flush=True)

print("== train (causal) ==", flush=True)
mk = {"channels": "128", "hidden": "256", "blocks": "4", "repeats": "2",
      "causal": "1", "compute_dtype": "bfloat16"}
t0 = time.time()
out = train("data/syn_tr", exp,
            TrainLoopConfig(arch="TCN", batch_size=32, num_epochs=40,
                            time_pad_multiple=64, seed=0,
                            start_epoch=start_epoch),
            cv_data_dir="data/syn_cv", model_kwargs=mk)
train_wall = time.time() - t0
print(f"train wall: {train_wall:.0f}s", flush=True)

print("== stream the test set (50 ms pushes) ==", flush=True)
out_dir = f"{exp}/output_final/syn_tt"
entries = read_scp("data/syn_tt/wav.scp")
wall = audio = 0.0
for utt, mix_path in entries:
    x, sr = load_wav(mix_path, sr=8000)
    sep = StreamingSeparator(f"{exp}/final.mdl", chunk_frames=8,
                             model_kwargs=mk)
    outs = [[], []]
    t0 = time.time()
    for i in range(0, len(x), 400):           # 50 ms blocks
        tr = sep.push(x[i: i + 400])
        for s in range(2):
            outs[s].append(tr[s])
    tr = sep.close()
    wall += time.time() - t0
    audio += len(x) / 8000
    for s in range(2):
        outs[s].append(tr[s])
        y = np.concatenate(outs[s])
        d = os.path.join(out_dir, "wav", f"s{s + 1}")
        os.makedirs(d, exist_ok=True)
        write_wav_int16(os.path.join(d, f"{utt}.wav"), 8000, y)

print("== score the STREAMED output ==", flush=True)
means = evaluate_sources("data/syn_tt", out_dir)

import jax
section = [f"\n{HEADER}\n\n"]
section.append(
    "The causal TCN (same corpus/recipe, `causal=1`) separated every test\n"
    "mixture through the real-time engine (`eval/streaming.py`) in 50 ms\n"
    "microphone-style pushes; the STREAMED output is what is scored —\n"
    "structural latency 128 ms chunk + 32 ms STFT lookahead. Trained/run\n"
    f"on {jax.devices()[0].platform}.\n")
section.append("\n| metric | streamed (causal TCN) |\n|---|---|\n")
for m in ("SDR", "SIR", "SAR", "SI-SDR", "SI-SDRi"):
    section.append(f"| {m} | {means[m]:.2f} dB |\n")
section.append(f"\nTrain wall: {train_wall:.0f}s; streaming wall "
               f"{wall:.1f}s for {audio:.1f}s of audio "
               f"({audio / wall:.1f}x realtime on this host).\n")
replace_results_section(HEADER, section)
print(json.dumps({"means": means, "stream_realtime_x": round(audio / wall, 2)}))
