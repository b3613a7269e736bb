#!/usr/bin/env python3
"""100k-utterance input-path benchmark (the reference's stripped id_lists
scale — combo_100k_tr / mixer6_*_tr_100k, .MISSING_LARGE_BLOBS:1-3).

tools/scale_benchmark.py measures the WHOLE pipeline (wav synthesis ->
device extraction -> npz -> pack -> epochs) and is practical up to ~20k
utterances on this host (extraction is D2H-transfer-bound at ~12 utts/s —
2+ hours for 100k). This tool isolates the question that changes at 100k —
does repeated-epoch collation hold up when the cache is 30-60 GB? — by
synthesizing magnitude spectra DIRECTLY into the packed cache format
(train/feature_cache.py layout, same writer invariants) and timing
input-only epochs exactly like scale_benchmark.py does.

Usage: python tools/scale100k_benchmark.py [--num-utts 100000]
       [--dtypes float16,float32] [--epochs 2]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from speech_separation_tpu.train.feature_cache import _MAGIC, pointer_path


def synthesize_cache(work, N, dtype, feat_dim=257, min_frames=126,
                     max_frames=251, seed=0, log=print):
    """Write a synthetic packed cache + minimal data dir. Spectra are
    |N(0,1)| blocks — the collation path only cares about bytes/layout."""
    dt = np.dtype(dtype)
    data_dir = os.path.join(work, f"data_{dt.name}")
    feat_dir = os.path.join(work, f"feats_{dt.name}")
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(feat_dir, exist_ok=True)
    cache_path = os.path.join(feat_dir, "feats_train.cache.bin")

    rng = np.random.default_rng(seed)
    frames = rng.integers(min_frames, max_frames + 1, size=N)
    ids = [f"sc{i:06d}" for i in range(N)]
    if (os.path.isfile(cache_path) and os.path.isfile(cache_path + ".idx.npz")
            and os.path.isfile(os.path.join(data_dir, "utt2num_spk"))
            and os.path.isfile(os.path.join(data_dir, "feats_train.scp"))):
        with np.load(cache_path + ".idx.npz") as idx:
            if len(idx["ids"]) == N and str(idx["dtype"]) == dt.name:
                log(f"reusing existing {dt.name} cache "
                    f"({os.path.getsize(cache_path) / 1e9:.2f} GB)")
                with open(pointer_path(data_dir, "train"), "w") as f:
                    f.write(cache_path + "\n")
                return (data_dir, cache_path,
                        os.path.getsize(cache_path), 0.0)
    offsets = np.zeros(N, np.int64)
    t0 = time.time()
    off = 0
    # ONE shared random pool, per-record scalar-scaled: the bytes must be
    # written and read (disk honesty) but generating 30-60 GB of fresh
    # gaussians on one CPU would dominate the run. All records are
    # scalings of this matrix — fine for the collation-throughput path
    # being measured; do NOT use this cache for numeric/compression
    # studies
    pool = np.abs(rng.standard_normal((max_frames, feat_dim))
                  ).astype(np.float32)
    with open(cache_path + ".partial", "wb") as out:
        for i in range(N):
            T = int(frames[i])
            rec = (pool[:T] * (0.5 + (i % 17) / 16.0)).astype(dt)
            offsets[i] = off
            for _ in range(3):  # mix, s1, s2
                out.write(rec.tobytes())
                off += rec.nbytes
            if (i + 1) % 20000 == 0:
                log(f"  wrote {i + 1}/{N} ({off / 1e9:.1f} GB)")
    os.replace(cache_path + ".partial", cache_path)
    np.savez(cache_path + ".idx",
             magic=_MAGIC, ids=np.asarray(ids),
             offsets=offsets, num_frames=frames.astype(np.int32),
             num_spk=np.full(N, 2, np.int32),
             feat_dim=np.int32(feat_dim), dtype=str(dt.name))
    with open(pointer_path(data_dir, "train"), "w") as f:
        f.write(cache_path + "\n")
    with open(os.path.join(data_dir, "feats_train.scp"), "w") as f:
        for u in ids:
            f.write(f"{u} {feat_dir}/{u}.npz\n")  # never read (cache wins)
    with open(os.path.join(data_dir, "utt2num_spk"), "w") as f:
        for u in ids:
            f.write(f"{u} 2\n")
    gen_s = time.time() - t0
    log(f"synthesized {dt.name} cache: {off / 1e9:.2f} GB in {gen_s:.0f}s")
    return data_dir, cache_path, off, gen_s


def input_epochs(data_dir, batch_size, epochs, log=print):
    from speech_separation_tpu.train.data import (BatchPlan, FeatureDataset,
                                                  iter_batches)
    ds = FeatureDataset(data_dir, "train")
    assert ds.cache is not None, "cache pointer not picked up"
    plan = BatchPlan(batch_size=batch_size, bucket_by_length=True)
    rates = []
    for ep in range(1, epochs + 1):
        n_b = 0
        checksum = 0.0
        t0 = time.time()
        for batch in iter_batches(ds, plan, epoch=ep, shuffle=True):
            checksum += float(batch["mix"][0, 0, 0])
            n_b += 1
        dt = time.time() - t0
        rate = n_b * batch_size / dt
        rates.append(rate)
        log(f"  epoch {ep}: {rate:.0f} utts/s ({dt / n_b * 1e3:.1f} ms/batch,"
            f" {n_b} batches, checksum {checksum:.1f})")
    return rates


def full_train_epoch(work, data_dir, N, batch_size, log=print):
    """ONE measured end-to-end training epoch at 100k scale (VERDICT
    round-3 item 6): packed-f16 input -> collation -> H2D -> full bf16
    2x600 uPIT train step, peak host RSS tracked. Same TrainLoopConfig
    shape as tools/scale_benchmark.py's 20k full-epoch rows."""
    import re
    import resource

    from speech_separation_tpu.train.loop import TrainLoopConfig, train

    lines: list[str] = []

    def tlog(msg):
        lines.append(str(msg))
        if "wall" in str(msg) or "epoch" in str(msg).lower():
            log(f"# [train] {msg}")

    cfg = TrainLoopConfig(arch="uPIT", batch_size=batch_size, num_epochs=1,
                          cv_every=1000, checkpoint_every=1000,
                          make_plots=False, bucket_by_length=True)
    t0 = time.time()
    train(data_dir, os.path.join(work, "exp", "scale100k_upit"), cfg,
          model_kwargs={"compute_dtype": "bfloat16"}, log=tlog)
    total_s = time.time() - t0
    walls = [float(m.group(1)) for line in lines
             for m in [re.search(r"wall: ([\d.]+)s", line)] if m]
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = {"total_s": round(total_s, 1), "peak_rss_gb": round(rss_gb, 2)}
    if walls:
        out["epoch_s"] = walls[0]
        out["utts_per_sec"] = round(N / walls[0], 1)
    log(f"# [train] 100k epoch: {out}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-utts", type=int, default=100000)
    ap.add_argument("--work", default="/tmp/sepsep_scale100k")
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--dtypes", default="float16,float32")
    ap.add_argument("--train-epoch", action="store_true",
                    help="run ONE full training epoch (f16 cache, bf16 "
                         "2x600 uPIT, RSS tracked) instead of input-only "
                         "epochs; writes RESULTS_<N>_train.json")
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    if args.train_epoch:
        data_dir, cache_path, nbytes, gen_s = synthesize_cache(
            args.work, args.num_utts, "float16")
        results = {"num_utts": args.num_utts, "batch_size": args.batch_size,
                   "cache_gb": round(nbytes / 1e9, 2),
                   "train_f16_cache": full_train_epoch(
                       args.work, data_dir, args.num_utts, args.batch_size)}
        print(json.dumps(results))
        out = os.path.join("scale_test",
                           f"RESULTS_{args.num_utts}_train.json")
        if os.path.isdir("scale_test"):
            with open(out, "w") as f:
                json.dump(results, f, indent=1)
            print(f"# wrote {out}")
        return

    results = {"num_utts": args.num_utts, "batch_size": args.batch_size,
               "modes": {}}
    for dtype in args.dtypes.split(","):
        print(f"# --- {dtype} ---")
        data_dir, cache_path, nbytes, gen_s = synthesize_cache(
            args.work, args.num_utts, dtype)
        rates = input_epochs(data_dir, args.batch_size, args.epochs)
        results["modes"][dtype] = {
            "cache_gb": round(nbytes / 1e9, 2),
            "write_s": round(gen_s, 1),
            "epoch_utts_per_sec": [round(r, 1) for r in rates],
            "warm_utts_per_sec": round(max(rates), 1),
        }
    print(json.dumps(results))
    out = os.path.join("scale_test", f"RESULTS_{args.num_utts}_input.json")
    if os.path.isdir("scale_test"):
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"# wrote {out}")


if __name__ == "__main__":
    main()
