#!/usr/bin/env python3
"""20k-utterance scale benchmark: the 100k-class input-pipeline story.

The reference shipped 100k-utterance id_lists (.MISSING_LARGE_BLOBS); its
input path is one compressed npz per utterance, re-inflated every epoch by
a single DataLoader worker (steps/train_qsub.py:81). This harness measures
this framework's input path at real scale on the current host + chip:

  1. synthesize an N-utterance 2-speaker corpus (wavs, reference layout)
  2. extract features end-to-end (device-batched STFT), timed
  3. pack the mmap feature cache (train/feature_cache.py), timed
  4. input-only epoch: npz-python vs npz-native vs packed-cache collation
  5. two full training epochs at reference model scale (2x600 uPIT, bf16 +
     Pallas) through the real trainer; epoch 2 (warm compile) is the number

Writes scale_test/RESULTS_<N>.json and prints a markdown summary.
Usage: python tools/scale_benchmark.py [--num-utts 20000] [--reuse]
       [--work /tmp/sepsep_scale] [--skip-train]
"""

import argparse
import json
import os
import re
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-utts", type=int, default=20000)
    ap.add_argument("--work", default="/tmp/sepsep_scale")
    ap.add_argument("--reuse", action="store_true",
                    help="reuse an existing corpus/features in --work")
    ap.add_argument("--min-sec", type=float, default=2.0)
    ap.add_argument("--max-sec", type=float, default=4.0)
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--train-f16", action="store_true",
                    help="also train 2 epochs from the f16 cache "
                         "(half the host->device bytes)")
    ap.add_argument("--input-only-batches", type=int, default=0,
                    help="cap batches in the input-only passes (0 = all)")
    args = ap.parse_args()

    from speech_separation_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from speech_separation_tpu.datadir import DatasetRegistry, prepare_data_dir
    from speech_separation_tpu.dsp import STFTConfig
    from speech_separation_tpu.dsp.extract import extract_features
    from speech_separation_tpu.train.feature_cache import pack_features
    from speech_separation_tpu.utils.synthetic import (make_synthetic_corpus,
                                                       write_id_list)

    N = args.num_utts
    work = args.work
    corpus = os.path.join(work, "corpus")
    feat_dir = os.path.join(work, "feats")
    results: dict = {"num_utts": N, "batch_size": args.batch_size}

    # ---- 1. corpus ----
    done_marker = os.path.join(work, f".corpus_done_{N}")
    if args.reuse and os.path.isfile(done_marker):
        with open(os.path.join(work, "id_lists", "scale_tr.txt")) as f:
            ids = f.read().split()
        print(f"# reusing corpus ({len(ids)} utts)")
    else:
        t0 = time.time()
        ids = make_synthetic_corpus(corpus, N, min_sec=args.min_sec,
                                    max_sec=args.max_sec, seed=0, prefix="sc")
        write_id_list(os.path.join(work, "id_lists"), "scale_tr", ids)
        results["corpus_gen_s"] = round(time.time() - t0, 1)
        open(done_marker, "w").close()
        print(f"# corpus: {N} utts in {results['corpus_gen_s']}s")

    reg = DatasetRegistry({"scale_tr": corpus})
    data_dir = prepare_data_dir("scale_tr", reg,
                                data_root=os.path.join(work, "data"),
                                id_lists_dir=os.path.join(work, "id_lists"))

    # ---- 2. extract (uncompressed npz: the CPU-scarce-host setting) ----
    scp = os.path.join(data_dir, "feats_train.scp")
    if not (args.reuse and os.path.isfile(scp)
            and sum(1 for _ in open(scp)) == N):
        t0 = time.time()
        extract_features(data_dir, "train", feat_dir, STFTConfig(),
                         compress=False)
        results["extract_s"] = round(time.time() - t0, 1)
        results["extract_utts_per_sec"] = round(N / results["extract_s"], 1)
        print(f"# extract: {results['extract_utts_per_sec']} utts/s")

    # ---- 3. pack cache ----
    from speech_separation_tpu.train.feature_cache import open_cache
    existing = open_cache(data_dir, "train") if args.reuse else None
    if existing is not None and existing.dtype == np.float32:
        bin_path = existing.bin_path
    else:
        t0 = time.time()
        bin_path = pack_features(data_dir, "train")
        results["pack_s"] = round(time.time() - t0, 1)
    results["cache_gb"] = round(os.path.getsize(bin_path) / 1e9, 2)

    # ---- 4. input-only epoch per mode ----
    from speech_separation_tpu.train.data import (BatchPlan, FeatureDataset,
                                                  iter_batches)
    plan = BatchPlan(batch_size=args.batch_size, bucket_by_length=True)

    def input_epoch(label, disable_cache=False, disable_native=False):
        if disable_native:
            os.environ["SEPSEP_NATIVE"] = "0"
            from speech_separation_tpu.utils import native
            native._tried, native._lib = False, None
        ds = FeatureDataset(data_dir, "train")
        if disable_cache:
            ds.cache = None
        n_b = 0
        checksum = 0.0
        t0 = time.time()
        for batch in iter_batches(ds, plan, epoch=1, shuffle=True):
            checksum += float(batch["mix"][0, 0, 0])  # touch the data
            n_b += 1
            if args.input_only_batches and n_b >= args.input_only_batches:
                break
        dt = time.time() - t0
        utts = n_b * args.batch_size
        if disable_native:
            os.environ["SEPSEP_NATIVE"] = "1"
            from speech_separation_tpu.utils import native
            native._tried, native._lib = False, None
        rate = utts / dt
        print(f"# input-only [{label}]: {rate:.0f} utts/s "
              f"({dt / n_b * 1e3:.1f} ms/batch, {n_b} batches)")
        return {"utts_per_sec": round(rate, 1),
                "ms_per_batch": round(dt / n_b * 1e3, 2), "batches": n_b}

    results["input_only"] = {
        "npz_python": input_epoch("npz python", disable_cache=True,
                                  disable_native=True),
        "npz_native": input_epoch("npz native", disable_cache=True),
        "packed_cache": input_epoch("packed cache"),
    }
    # f16 cache: half the bytes through the page cache and memcpy
    from speech_separation_tpu.train.feature_cache import pointer_path
    f16_bin = os.path.join(feat_dir, "feats_train.f16.bin")
    if not os.path.isfile(f16_bin + ".idx.npz"):
        pack_features(data_dir, "train", cache_path=f16_bin, dtype="float16")
    with open(pointer_path(data_dir, "train"), "w") as f:
        f.write(f16_bin + "\n")
    results["input_only"]["packed_cache_f16"] = input_epoch("packed cache f16")
    with open(pointer_path(data_dir, "train"), "w") as f:  # restore f32
        f.write(bin_path + "\n")

    # ---- 5. full training epochs on the device ----
    def train_epochs(tag, exp_name):
        from speech_separation_tpu.train.loop import TrainLoopConfig, train
        exp_dir = os.path.join(work, "exp", exp_name)
        lines: list[str] = []

        def log(msg):
            lines.append(str(msg))
            if "wall" in str(msg) or "loss is" in str(msg):
                print(f"# [{tag}] {msg}")

        cfg = TrainLoopConfig(arch="uPIT", batch_size=args.batch_size,
                              num_epochs=2, cv_every=1000,
                              checkpoint_every=1000, make_plots=False,
                              bucket_by_length=True)
        t0 = time.time()
        train(data_dir, exp_dir, cfg,
              model_kwargs={"compute_dtype": "bfloat16"}, log=log)
        out = {"total_s": round(time.time() - t0, 1)}
        walls = [float(m.group(1)) for line in lines
                 for m in [re.search(r"wall: ([\d.]+)s", line)] if m]
        if len(walls) >= 2:
            out["epoch1_s"], out["epoch2_s"] = walls[0], walls[1]
            out["utts_per_sec_warm"] = round(N / walls[1], 1)
            print(f"# [{tag}] full-epoch (warm): {out['utts_per_sec_warm']}"
                  f" utts/s end-to-end")
        return out

    if not args.skip_train:
        results["train_f32_cache"] = train_epochs("f32", "scale_upit")
    if args.train_f16:
        from speech_separation_tpu.train.feature_cache import pointer_path
        f16_bin = os.path.join(feat_dir, "feats_train.f16.bin")
        if not os.path.isfile(f16_bin + ".idx.npz"):
            pack_features(data_dir, "train", cache_path=f16_bin,
                          dtype="float16")
        with open(pointer_path(data_dir, "train"), "w") as f:
            f.write(f16_bin + "\n")
        try:
            results["train_f16_cache"] = train_epochs("f16", "scale_upit_f16")
        finally:  # restore the f32 pointer (the bin is already on disk)
            with open(pointer_path(data_dir, "train"), "w") as f:
                f.write(os.path.join(feat_dir, "feats_train.cache.bin") + "\n")

    out_dir = os.path.join(os.path.dirname(HERE), "scale_test")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"RESULTS_{N}.json")
    if os.path.isfile(out):  # merge over prior runs (e.g. --skip-train rerun)
        with open(out) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    print(f"# written to {out}")


if __name__ == "__main__":
    main()
