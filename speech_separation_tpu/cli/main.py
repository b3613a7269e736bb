"""sepsep — the framework CLI.

Replaces the reference's six layers of bash/SGE plumbing (run_train.sh,
run_eval.sh, steps/*.sh, tools/*.sh, cmd.sh — SURVEY.md §1 L0/L6) with one
staged Python CLI on a single TPU host. The reference's observable
conventions survive:

- the data-dir / id_lists / exp-dir layouts and the ``stage=N`` skip-ahead
  convention (run_train.sh:6-18, run_eval.sh:6-15);
- the ``key=value``-per-line model config file, snapshotted into the exp dir
  as ``conf`` and auto-reused at eval (run_train.sh:57, run_eval.sh:25);
- ``--nj`` sharded feature extraction / oracle eval (as host worker
  processes instead of SGE array jobs — extract_feats.sh:41-53).

Subcommands: prepare, validate, split, extract, pack-features, train,
eval-masks, reconstruct, stage-data, separate, serve, score, oracle, info,
bench, doctor, warmup, import-model, export-model, run-train, run-eval.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil


def read_model_config(path: str) -> dict:
    """key=value-per-line model config (reference train_qsub.py:87-91)."""
    kwargs = {}
    if path:
        with open(path) as f:
            for line in f:
                line = line.rstrip("\n")
                if line and "=" in line:
                    k, _, v = line.partition("=")
                    kwargs[k] = v
    return kwargs


def _registry(args):
    from ..datadir import DatasetRegistry
    return DatasetRegistry.load(getattr(args, "registry", None)
                                or os.path.join(args.id_lists_dir, "path.json"))


# --------------------------------------------------------------------- steps

def cmd_prepare(args):
    from ..datadir import prepare_data_dir
    out = prepare_data_dir(args.dataset, _registry(args),
                           data_root=args.data_root,
                           id_lists_dir=args.id_lists_dir)
    print(f"prepared {out}")


def cmd_validate(args):
    from ..datadir import validate_data_dir
    validate_data_dir(args.data_dir)
    print(f"Data directory {args.data_dir} is OK.")


def cmd_split(args):
    from ..datadir import split_data_dir
    print(split_data_dir(args.data_dir, args.num_shards))


def _extract(data_dir, data_type, feat_dir, args):
    from functools import partial
    from ..datadir import validate_data_dir, split_data_dir
    from ..dsp import STFTConfig
    from ..dsp import extract as _ex
    extract_features = partial(_ex.extract_features,
                               compress=not getattr(args, "no_compress", False))
    merge_shard_outputs = _ex.merge_shard_outputs
    cfg = STFTConfig(n_fft=args.fft_dim, hop=args.step_size,
                     sample_rate=args.sample_rate)
    nj = getattr(args, "nj", 1)
    mj = getattr(args, "mj", 1)
    if nj > 1:
        validate_data_dir(data_dir)
        split_dir = split_data_dir(data_dir, nj)
        if mj > 1:
            # spawn (not fork): the parent holds initialized JAX/TPU state
            # which must never be forked into workers
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor
            ctx = mp.get_context("spawn")
            with ProcessPoolExecutor(max_workers=mj, mp_context=ctx) as pool:
                futures = [pool.submit(extract_features, split_dir, data_type,
                                       feat_dir, cfg, f".{i}")
                           for i in range(1, nj + 1)]
                for f in futures:
                    f.result()
        else:
            for i in range(1, nj + 1):
                extract_features(split_dir, data_type, feat_dir, cfg, f".{i}")
        merge_shard_outputs(data_dir, split_dir, data_type, nj)
    else:
        extract_features(data_dir, data_type, feat_dir, cfg)
    if getattr(args, "pack_cache", False) and data_type == "train":
        from ..train.feature_cache import pack_features
        pack_features(data_dir, data_type, dtype=getattr(
            args, "cache_dtype", "float32"))


def cmd_extract(args):
    _extract(args.data_dir, args.data_type, args.feat_dir, args)


def cmd_pack_features(args):
    from ..train.feature_cache import pack_features
    pack_features(args.data_dir, args.data_type,
                  cache_path=args.cache_path or None, dtype=args.dtype)


def cmd_train(args):
    from ..dsp import STFTConfig
    from ..train.loop import TrainLoopConfig
    stft = STFTConfig(n_fft=getattr(args, "fft_dim", 512),
                      hop=getattr(args, "step_size", 128),
                      sample_rate=getattr(args, "sample_rate", 8000))
    loop_cfg = TrainLoopConfig(
        stft=stft,
        arch=args.arch, batch_size=args.batch_size,
        num_epochs=args.num_epochs, learning_rate=args.learning_rate,
        grad_clip=args.grad_clip, lr_decay=args.lr_decay,
        start_epoch=args.start_epoch, seed=args.seed,
        time_pad_multiple=args.time_pad_multiple,
        bucket_by_length=args.bucket_by_length,
        reference_resume=args.reference_resume,
        reference_batching=args.reference_batching,
        make_plots=not args.no_plots,
        profile_dir=args.profile_dir,
        train_copy_location=args.train_copy_location,
        on_device_features=args.on_device_features)
    _run_training(args, args.data_dir, args.exp_dir, loop_cfg,
                  args.cv_data_dir)


def _run_training(args, data_dir, exp_dir, loop_cfg, cv_data_dir):
    """Route to the crash-recovering driver, or — with --hang-watchdog-sec
    — the supervised driver that also recovers wedged device dispatches
    (train/watchdog.py)."""
    from ..train.loop import train_with_restarts
    mk = read_model_config(args.model_config)
    watchdog = getattr(args, "hang_watchdog_sec", 0.0)
    if watchdog > 0:
        from ..train.watchdog import train_supervised
        train_supervised(data_dir, exp_dir, loop_cfg,
                         hang_timeout_s=watchdog,
                         first_timeout_s=args.hang_first_timeout_sec,
                         max_restarts=args.max_restarts,
                         cv_data_dir=cv_data_dir, model_kwargs=mk)
    else:
        train_with_restarts(data_dir, exp_dir, loop_cfg,
                            max_restarts=args.max_restarts,
                            cv_data_dir=cv_data_dir, model_kwargs=mk)


def cmd_eval_masks(args):
    from ..eval import generate_masks
    generate_masks(args.model, args.data_dir, args.out_dir,
                   arch_name=args.arch,
                   model_kwargs=read_model_config(args.model_config),
                   batch_size=args.batch_size)


def cmd_reconstruct(args):
    from ..eval import reconstruct_sources
    reconstruct_sources(args.data_dir, args.exp_dir, hop=args.step_size,
                        sample_rate=args.sample_rate)


def _data_mesh(args):
    """Mesh for --data-parallel inference, or None when the flag is off
    (or only one device is visible)."""
    if not getattr(args, "data_parallel", False):
        return None
    from ..parallel.mesh import data_parallel_mesh
    return data_parallel_mesh()


def cmd_separate(args):
    """Fused waveform->waveforms separation (the serving path)."""
    if args.server:
        # hand the work to a resident `sepsep serve` daemon: no model load,
        # no compile — milliseconds instead of seconds per invocation
        import time
        from ..eval.serve import request
        # the daemon's own model/STFT/batch configuration wins; flags that
        # only configure a locally-built pipeline are NOT forwarded — say
        # so instead of silently producing wrong-parameter output
        ignored = [(f, v) for f, v, d in (
            ("--model-config", args.model_config, ""),
            ("--batch-size", args.batch_size, 16),
            ("--fft-dim", args.fft_dim, 512),
            ("--step-size", args.step_size, 128),
            ("--sample-rate", args.sample_rate, 8000),
            ("--data-parallel", args.data_parallel, False),
        ) if v != d]
        if ignored:
            print("note: --server forwards only wavs/out_dir/num_spk/"
                  "long-form; the daemon's own configuration wins over: "
                  + ", ".join(f"{f}={v}" for f, v in ignored))
        payload = {"wavs": [os.path.abspath(w) for w in args.wavs],
                   "out_dir": os.path.abspath(args.out_dir)}
        if args.num_spk:
            payload["num_spk"] = args.num_spk
        if args.long_form:
            payload.update(long_form=True, window_sec=args.window_sec,
                           overlap_sec=args.overlap_sec)
        # the daemon takes seconds to load+bind after `sepsep serve ... &`;
        # wait for the socket (bounded) instead of crashing on the race
        deadline = time.monotonic() + args.server_wait
        waited = False
        while True:
            try:
                reply = request(args.server, payload)
                break
            except (FileNotFoundError, ConnectionRefusedError) as e:
                if time.monotonic() >= deadline:
                    raise SystemExit(
                        f"no server at {args.server} after "
                        f"{args.server_wait:.0f}s ({e})")
                if not waited:
                    print(f"waiting for server at {args.server} ...",
                          flush=True)
                    waited = True
                time.sleep(0.5)
        print(json.dumps(reply))
        if not reply.get("ok"):
            raise SystemExit(1)
        return
    from ..dsp import STFTConfig
    from ..eval.pipeline import SeparationPipeline
    from ..utils.audio import load_wav, write_wav_int16

    cfg = STFTConfig(n_fft=args.fft_dim, hop=args.step_size,
                     sample_rate=args.sample_rate)
    pipe = SeparationPipeline(args.model,
                              model_kwargs=read_model_config(args.model_config),
                              stft_cfg=cfg, batch_size=args.batch_size,
                              num_spk=args.num_spk or None,
                              mesh=_data_mesh(args))
    os.makedirs(args.out_dir, exist_ok=True)

    from ..utils.audio import limit_peak, separated_track_paths

    def write(path, ests):
        # one shared gain per utterance keeps SI-SNR-scaled time-domain
        # tracks inside the int16 wav range (scoring-invariant)
        for out_path, est in zip(
                separated_track_paths(args.out_dir, path, len(ests)),
                limit_peak(ests)):
            write_wav_int16(out_path, cfg.sample_rate, est)

    if args.long_form:
        for path in args.wavs:
            x, _ = load_wav(path, sr=cfg.sample_rate)
            write(path, pipe.separate_long(x, window_sec=args.window_sec,
                                           overlap_sec=args.overlap_sec))
    else:
        # streaming: audio loads batch-by-batch (bounded memory at any
        # input-list size), ordered by wav-header lengths
        from ..utils.audio import wav_num_samples
        lengths = [wav_num_samples(p) for p in args.wavs]
        loader = lambda i: load_wav(args.wavs[i], sr=cfg.sample_rate)[0]
        for i, ests in pipe.separate_stream(loader, lengths):
            write(args.wavs[i], ests)
    print(f"separated {len(args.wavs)} files -> {args.out_dir}")


def cmd_serve(args):
    """Resident separation server: warm model + compiled programs behind a
    Unix socket (newline-JSON protocol, eval/serve.py). Clients:
    ``sepsep separate --server <socket> ...`` or any JSON-capable peer."""
    from ..dsp import STFTConfig
    from ..eval.pipeline import SeparationPipeline
    from ..eval.serve import SeparationServer

    cfg = STFTConfig(n_fft=args.fft_dim, hop=args.step_size,
                     sample_rate=args.sample_rate)
    pipe = SeparationPipeline(args.model,
                              model_kwargs=read_model_config(args.model_config),
                              stft_cfg=cfg, batch_size=args.batch_size,
                              num_spk=args.num_spk or None,
                              mesh=_data_mesh(args))
    stream_pool = None
    if args.streaming_model:
        from ..eval.streaming import StreamingPool
        stream_pool = StreamingPool(
            args.streaming_model, capacity=args.stream_capacity,
            chunk_frames=args.stream_chunk_frames,
            model_kwargs=read_model_config(args.streaming_model_config),
            n_fft=args.fft_dim, hop=args.step_size)
        print(f"streaming: {args.streaming_model} "
              f"({args.stream_capacity} slots, "
              f"{args.stream_chunk_frames}-frame chunks)", flush=True)
    server = SeparationServer(pipe, args.socket_path,
                              coalesce=args.coalesce,
                              stream_pool=stream_pool)
    # daemon managers stop services with SIGTERM, which would otherwise
    # kill the process without draining in-flight requests or removing
    # the socket file; route it (and Ctrl-C) through the clean shutdown
    import signal

    def _stop(signum, _frame):
        print(f"signal {signal.Signals(signum).name}: shutting down",
              flush=True)
        server.shutdown()

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)
    if args.warmup_sec:
        try:
            secs = [float(s) for s in args.warmup_sec.split(",") if s.strip()]
        except ValueError:
            raise SystemExit(f"--warmup-sec expects comma-separated seconds "
                             f"(got {args.warmup_sec!r})")
        n = server.warmup(secs)
        print(f"warmup: {n} shape buckets compiled", flush=True)
    print(f"serving {args.model} on {args.socket_path}", flush=True)
    server.serve_forever()


def cmd_score(args):
    from ..eval import evaluate_sources
    evaluate_sources(args.data_dir, args.exp_dir, num_workers=args.nj,
                     device=args.device_scoring,
                     data_parallel=getattr(args, "data_parallel", False))


def cmd_oracle(args):
    from ..datadir import validate_data_dir, split_data_dir
    from ..eval import evaluate_oracle, merge_oracle_shards
    from ..dsp import STFTConfig
    cfg = STFTConfig(n_fft=args.fft_dim, hop=args.step_size,
                     sample_rate=args.sample_rate)
    if args.mj > 1:
        # oracle workers ALWAYS use the device (the masked STFT/iSTFT runs
        # as jnp programs, device scoring or not); on single-client TPU
        # runtimes concurrent spawned clients hang or serialize
        # unpredictably — run shards in-process there. CPU backends
        # multi-process fine.
        import jax
        if jax.default_backend() == "tpu":
            print("warning: oracle shards run in one process on this "
                  f"single-client TPU (ignoring --mj {args.mj})")
            args.mj = 1
    if args.nj > 1:
        validate_data_dir(args.data_dir)
        split_dir = split_data_dir(args.data_dir, args.nj)
        # oracle reads wav.scp.<i> from the split dir but writes into
        # <data-dir>/oracle_*; run each shard against the split dir
        if args.mj > 1:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor
            ctx = mp.get_context("spawn")  # never fork initialized JAX
            with ProcessPoolExecutor(max_workers=args.mj, mp_context=ctx) as pool:
                futs = [pool.submit(evaluate_oracle, split_dir, args.hard_mask,
                                    cfg, f".{i}",
                                    device=args.device_scoring,
                                    data_parallel=args.data_parallel)
                        for i in range(1, args.nj + 1)]
                for f in futs:
                    f.result()
        else:
            for i in range(1, args.nj + 1):
                evaluate_oracle(split_dir, args.hard_mask, cfg, f".{i}",
                                device=args.device_scoring,
                                data_parallel=args.data_parallel)
        # move shard outputs up before merging
        kind = "hard" if args.hard_mask else "soft"
        src = os.path.join(split_dir, f"oracle_{kind}_mask_eval")
        dst = os.path.join(args.data_dir, f"oracle_{kind}_mask_eval")
        os.makedirs(dst, exist_ok=True)
        for name in os.listdir(src):
            shutil.move(os.path.join(src, name), os.path.join(dst, name))
        means = merge_oracle_shards(args.data_dir, args.hard_mask, args.nj)
    else:
        evaluate_oracle(args.data_dir, args.hard_mask, cfg,
                        device=args.device_scoring,
                        data_parallel=args.data_parallel)
        means = merge_oracle_shards(args.data_dir, args.hard_mask, 1)
    print(" ".join(f"oracle mean {k}: {v:.2f}" for k, v in means.items()))


def cmd_info(args):
    """Inspect a checkpoint: arch, hyperparameters, training state."""
    import numpy as np
    from ..train.checkpoint import load_checkpoint
    ckpt = load_checkpoint(args.model)
    meta = ckpt.get("meta", {}) or {}
    print(f"arch: {meta.get('arch', '?')}")
    for k, v in sorted((meta.get("model_kwargs") or {}).items()):
        print(f"  {k} = {v}")
    if meta.get("imported_from"):
        print(f"imported from: {meta['imported_from']}")
    if ckpt.get("epoch") is not None:
        print(f"epoch: {ckpt['epoch']}")
    import jax
    leaves = [np.asarray(x)
              for x in jax.tree_util.tree_leaves(ckpt.get("params"))]
    if leaves:
        print(f"parameters: {sum(int(l.size) for l in leaves):,} "
              f"({len(leaves)} arrays)")
    print("optimizer state: "
          + ("present" if ckpt.get("opt_state") is not None else "absent"))
    print("rng state: "
          + ("present" if ckpt.get("rng") is not None else "absent"))


def cmd_doctor(args):
    """Environment health check: python/JAX stack, accelerator backend
    (probed in a KILLABLE child process — the TPU tunnel's known failure
    mode is an indefinite hang at PJRT init, which an in-process probe
    could neither detect nor survive), native IO library, compile cache.
    Exits non-zero if the backend probe fails."""
    import subprocess
    import sys

    ok = True
    print(f"python: {sys.version.split()[0]} ({sys.executable})")
    try:
        import jax
        print(f"jax: {jax.__version__}")
    except Exception as e:
        print(f"jax: IMPORT FAILED ({e})")
        raise SystemExit(1)

    probe_src = ("import time,jax,jax.numpy as jnp;t=time.time();"
                 "d=jax.devices();x=float(jnp.ones((8,8)).sum());"
                 "print(d[0].platform, d[0].device_kind.replace(' ','_'),"
                 "len(d), round(time.time()-t,3))")
    try:
        r = subprocess.run([sys.executable, "-c", probe_src],
                           capture_output=True, text=True,
                           timeout=args.probe_timeout)
        # find the probe's own report line (other lines may be plugin
        # banners); a parse failure must yield a diagnosis, not a traceback
        report = None
        if r.returncode == 0:
            for line in reversed((r.stdout or "").strip().splitlines()):
                parts = line.split()
                if len(parts) == 4:
                    try:
                        float(parts[3])
                    except ValueError:
                        continue
                    report = parts
                    break
        if report:
            plat, kind, n, lat = report
            print(f"backend: {plat} ({kind}), {n} device(s), "
                  f"trivial-op latency {lat}s (incl. init)")
        else:
            ok = False
            tail = ((r.stderr or "").strip().splitlines()
                    or (r.stdout or "").strip().splitlines())[-1:]
            print(f"backend: PROBE FAILED (exit {r.returncode})"
                  + (f" — {tail[0]}" if tail else ""))
    except subprocess.TimeoutExpired:
        ok = False
        print(f"backend: HUNG — no device init within {args.probe_timeout:.0f}s "
              "(the tunnel/plugin is down; CPU fallback: "
              "JAX_PLATFORMS=cpu with the plugin off PYTHONPATH)")

    from ..utils.native import _load_library
    print("native io (libsepio.so): "
          + ("loaded" if _load_library() is not None else
             "unavailable (pure-Python fallback active; make -C native)"))
    env_cache = os.environ.get("SEPSEP_COMPILE_CACHE", "")
    if env_cache.lower() in ("0", "off", "none"):
        print(f"compile cache: disabled (SEPSEP_COMPILE_CACHE={env_cache})")
    else:
        d = env_cache or os.path.join(os.path.expanduser("~"), ".cache",
                                      "sepsep_jax_cache")
        n = len(os.listdir(d)) if os.path.isdir(d) else 0
        print(f"compile cache: {d} ({n} entries)")
    if not ok:
        raise SystemExit(1)


def cmd_warmup(args):
    """Pre-populate the persistent compile cache for a training config.

    AOT-compiles (``jit(...).lower(...).compile()`` — no execution, no
    training data needed) the full train step for each requested arch at
    the exact batch shapes a run would hit, so the first real step of
    `sepsep run-train` — or a later `sepsep bench` — deserializes the
    executable in seconds instead of recompiling for minutes (measured
    cold compiles on the tunnel backend: uPIT 287 s, SepFormer 504 s —
    docs/performance.md). Serving programs are pre-compiled separately by
    `sepsep serve --warmup-sec`. Cache hits are cross-process: the cache
    key covers program HLO + compile options + backend, so any process on
    this machine with the same config reuses the entry
    (utils/compile_cache.py; cross-process hit is regression-tested in
    tests/test_compile_cache.py)."""
    import time as _time

    import jax
    import numpy as _np

    from ..models.registry import ARCHS, get_arch
    from ..train.loop import TrainLoopConfig, make_optimizer, make_update_step
    from ..utils.compile_cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    names = args.archs.split(",") if args.archs else sorted(ARCHS)
    model_kwargs = read_model_config(args.model_config) if args.model_config \
        else {}
    B = args.batch_size
    for name in names:
        arch = get_arch(name.strip())
        cfg = arch.Config.from_kwargs(compute_dtype=args.compute_dtype,
                                      **model_kwargs)
        t0 = _time.time()
        params, state = arch.init(jax.random.PRNGKey(0), cfg)
        optimizer = make_optimizer(TrainLoopConfig())
        opt_state = optimizer.init(params)
        step = make_update_step(arch, cfg, optimizer)
        if getattr(arch, "DOMAIN", "spectrum") == "time":
            L = int(args.seconds * 8000)
            batch = {
                "mix_wav": _np.zeros((B, L), _np.float32),
                "source_wavs": _np.zeros((B, cfg.num_spk, L), _np.float32),
                "sample_lengths": _np.full(B, L, _np.int32),
                "row_mask": _np.ones(B, _np.float32),
            }
        else:
            T, F, S = args.frames, cfg.feat_dim, cfg.num_spk
            batch = {
                "mix": _np.zeros((B, T, F), _np.float32),
                "sources": _np.zeros((B, S, T, F), _np.float32),
                "lengths": _np.full(B, T, _np.int32),
                "row_mask": _np.ones(B, _np.float32),
            }
        n_before = len(os.listdir(cache_dir)) if cache_dir else 0
        step.lower(params, state, opt_state, batch,
                   jax.random.PRNGKey(1)).compile()
        dt = _time.time() - t0
        wrote = (len(os.listdir(cache_dir)) - n_before) if cache_dir else 0
        # new cache entries written => this shape was cold; none => the
        # executable deserialized from a prior run's entry
        status = (f"cold compile, {wrote} cache entr"
                  f"{'y' if wrote == 1 else 'ies'} written"
                  if wrote else "cache hit")
        print(f"warmup {arch.NAME}: train step ready in {dt:.1f}s ({status})",
              flush=True)
    print(f"compile cache: {cache_dir or 'DISABLED'}")


def cmd_bench(args):
    """Run the repo's benchmark harness (bench.py at the repo root): the
    reference-scale train-step throughput + DSP-bandwidth JSON line."""
    import runpy
    import sys
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(os.path.dirname(here))
    bench_path = os.path.join(root, "bench.py")
    if not os.path.isfile(bench_path):
        raise SystemExit("bench.py not found next to the package "
                         f"(looked at {bench_path}); run it from a source "
                         "checkout")
    sys.argv = [bench_path] + (["--rsh"] if args.rsh else [])
    runpy.run_path(bench_path, run_name="__main__")


# ------------------------------------------------------------------- recipes

def cmd_import_model(args):
    """Torch .mdl -> native checkpoint (steps/eval_qsub.py:67 migration)."""
    from ..utils.import_torch import import_reference_model
    import_reference_model(args.mdl_path, args.out_path)


def cmd_export_model(args):
    """Native checkpoint -> reference torch .mdl (the reverse migration:
    train here, evaluate with the reference recipe or any torch stack)."""
    from ..utils.import_torch import export_reference_model
    export_reference_model(args.ckpt_path, args.out_path)


def cmd_run_train(args):
    """Staged training recipe (reference run_train.sh)."""
    datasets = [args.train_set] + ([args.cv_set] if args.cv_set else [])

    if args.stage <= 0:
        print("### Preparing data directories (stage 0) ###")
        from ..datadir import prepare_data_dir
        for ds in datasets:
            prepare_data_dir(ds, _registry(args), data_root=args.data_root,
                             id_lists_dir=args.id_lists_dir)

    if args.stage <= 1:
        if args.on_device_features:
            print("### Skipping feature extraction (on-device features) ###")
        else:
            print("### Extracting features (stage 1) ###")
            for ds in datasets:
                _extract(os.path.join(args.data_root, ds), "train",
                         os.path.join(args.featdir, f"{ds}_train"), args)

    if args.stage <= 2:
        print("### Training model (stage 2) ###")
        exp_dir = os.path.join("exp", f"{args.arch}_{args.train_set}")
        os.makedirs(exp_dir, exist_ok=True)
        # snapshot the model config (run_train.sh:57) and the arch identity
        # (the reference snapshots the arch *source*, run_train.sh:56)
        if args.model_config:
            shutil.copy(args.model_config, os.path.join(exp_dir, "conf"))
        from ..models.registry import get_arch
        arch_mod = get_arch(args.arch)
        with open(os.path.join(exp_dir, "arch.json"), "w") as f:
            json.dump({"arch": arch_mod.NAME, "module": arch_mod.__name__}, f)
        if getattr(arch_mod, "__file__", None):
            shutil.copy(arch_mod.__file__, os.path.join(exp_dir, "arch.py"))

        from ..train.loop import TrainLoopConfig
        from ..dsp import STFTConfig
        loop_cfg = TrainLoopConfig(
            arch=args.arch, batch_size=args.batch_size,
            num_epochs=args.num_epochs, learning_rate=args.learning_rate,
            grad_clip=args.grad_clip, lr_decay=args.lr_decay,
            start_epoch=args.start_epoch, seed=args.seed,
            time_pad_multiple=args.time_pad_multiple,
            bucket_by_length=args.bucket_by_length,
            reference_batching=args.reference_batching,
            on_device_features=args.on_device_features,
            stft=STFTConfig(n_fft=args.fft_dim, hop=args.step_size,
                            sample_rate=args.sample_rate))
        cv_dir = os.path.join(args.data_root, args.cv_set) if args.cv_set else ""
        _run_training(args, os.path.join(args.data_root, args.train_set),
                      exp_dir, loop_cfg, cv_dir)


def _ensure_utt2num_spk(data_dir: str) -> None:
    """Write utt2num_spk from the corpus layout (/mix/ -> /*/ glob) when no
    feature-extraction stage ran to produce it."""
    path = os.path.join(data_dir, "utt2num_spk")
    if os.path.isfile(path):
        return
    from ..datadir.scp import read_scp, write_utt2num_spk, source_wavs_for_mix
    entries = read_scp(os.path.join(data_dir, "wav.scp"))
    write_utt2num_spk(path, ((u, max(len(source_wavs_for_mix(p)) - 1, 1))
                             for u, p in entries))


def _run_eval_fused(args, test_sets, model, model_path, model_config):
    """Waveform-direct evaluation: mixtures stream through the fused
    wav->separated-wavs program (eval/pipeline.py); no feature files, no
    mask npz, no separate reconstruction stage. Output wavs and scoring are
    identical in layout to the staged path. Streaming: only a couple of
    prefetched batches of audio are ever resident (bounded peak RSS at
    100k-utterance scale), ordered by wav-header lengths."""
    from ..datadir.scp import read_scp
    from ..dsp import STFTConfig
    from ..eval.pipeline import SeparationPipeline
    from ..utils.audio import (limit_peak, load_wav, wav_num_samples,
                               write_wav_int16)

    cfg = STFTConfig(n_fft=args.fft_dim, hop=args.step_size,
                     sample_rate=args.sample_rate)
    pipe = SeparationPipeline(model_path,
                              model_kwargs=read_model_config(model_config),
                              stft_cfg=cfg, batch_size=min(args.batch_size, 32),
                              mesh=_data_mesh(args))
    for ds in test_sets:
        data_dir = os.path.join(args.data_root, ds)
        out_dir = os.path.join(args.model_dir, f"output_{model}", ds)
        entries = read_scp(os.path.join(data_dir, "wav.scp"))
        lengths = [wav_num_samples(p) for _, p in entries]
        loader = lambda i: load_wav(entries[i][1], sr=cfg.sample_rate)[0]
        n = 0
        for i, ests in pipe.separate_stream(loader, lengths):
            utt = entries[i][0]
            # shared per-utterance gain: SI-SNR-scaled time-domain tracks
            # can peak past 1.0 and would saturate the int16 wavs
            # (scoring is scale-invariant, so the gain is free)
            for s, est in enumerate(limit_peak(ests)):
                path = os.path.join(out_dir, "wav", f"s{s + 1}", utt + ".wav")
                os.makedirs(os.path.dirname(path), exist_ok=True)
                write_wav_int16(path, cfg.sample_rate, est)
            n += 1
        print(f"separated {n} mixtures -> {out_dir}/wav")


def _models_to_eval(args):
    """[(label, checkpoint_path)] for run-eval. One model normally
    (final, or --intermediate-model-num N — qsub_eval.sh:47-53); every
    saved checkpoint with --sweep-intermediates (the reference user's
    manual which-epoch-is-best loop, automated)."""
    inter_dir = os.path.join(args.model_dir, "intermediate_models")
    if getattr(args, "sweep_intermediates", False):
        models = []
        if os.path.isdir(inter_dir):
            for name in sorted(os.listdir(inter_dir)):
                if name.endswith(".mdl"):
                    epoch = os.path.splitext(name)[0]
                    # reference output-dir convention is the un-padded
                    # epoch number (run_eval.sh model=$intermediate_model_num)
                    label = str(int(epoch)) if epoch.isdigit() else epoch
                    models.append((label, os.path.join(inter_dir, name)))
        final = os.path.join(args.model_dir, "final.mdl")
        if os.path.isfile(final):
            models.append(("final", final))
        if not models:
            raise SystemExit(f"--sweep-intermediates: no checkpoints under "
                             f"{args.model_dir}")
        return models
    if args.intermediate_model_num:
        n = int(args.intermediate_model_num)
        return [(args.intermediate_model_num,
                 os.path.join(inter_dir, f"{n:03d}.mdl"))]
    return [("final", os.path.join(args.model_dir, "final.mdl"))]


def _write_sweep_results(model_dir, ds, rows):
    """rows: [(label, means dict)]. One table per test set; the best model
    by SDR is flagged so the pick is one grep away."""
    out_dir = os.path.join(model_dir, "sweep_results")
    os.makedirs(out_dir, exist_ok=True)
    best = max(rows, key=lambda r: r[1]["SDR"])[0]
    path = os.path.join(out_dir, f"{ds}.txt")
    keys = ("SDR", "SIR", "SAR", "SI-SDR", "SI-SDRi")
    with open(path, "w") as f:
        f.write("model " + " ".join(keys) + " best\n")
        for label, means in rows:
            vals = " ".join(f"{means[k]:.4f}" for k in keys)
            f.write(f"{label} {vals}{' *' if label == best else ''}\n")
    print(f"{ds}: best model by SDR is {best} -> {path}")
    return best


def cmd_run_eval(args):
    """Staged evaluation recipe (reference run_eval.sh)."""
    test_sets = args.test_sets.split()
    model_config = args.model_config
    conf = os.path.join(args.model_dir, "conf")
    if not model_config and os.path.isfile(conf):
        model_config = conf  # auto-reuse snapshot (run_eval.sh:25)

    models = _models_to_eval(args)
    sweep = getattr(args, "sweep_intermediates", False)
    fused = getattr(args, "on_device_features", False)

    if args.stage <= 0:
        print("### Preparing data directories (stage 0) ###")
        from ..datadir import prepare_data_dir
        for ds in test_sets:
            prepare_data_dir(ds, _registry(args), data_root=args.data_root,
                             id_lists_dir=args.id_lists_dir)

    if not fused and args.stage <= 1:
        print("### Extracting features (stage 1) ###")
        for ds in test_sets:
            _extract(os.path.join(args.data_root, ds), "test",
                     os.path.join(args.featdir, f"{ds}_test"), args)

    results = {ds: [] for ds in test_sets}
    for model, model_path in models:
        tag = f" [{model}]" if sweep else ""
        if fused:
            if args.stage <= 3:
                print(f"### Fused separation (stages 1-3 combined){tag} ###")
                _run_eval_fused(args, test_sets, model, model_path,
                                model_config)
        else:
            if args.stage <= 2:
                print(f"### Generating masks (stage 2){tag} ###")
                from ..eval import generate_masks
                for ds in test_sets:
                    out_dir = os.path.join(args.model_dir,
                                           f"output_{model}", ds)
                    generate_masks(model_path,
                                   os.path.join(args.data_root, ds),
                                   os.path.join(out_dir, "masks"),
                                   model_kwargs=read_model_config(model_config),
                                   batch_size=args.batch_size)

            if args.stage <= 3:
                print("### Generating estimated source wav files "
                      f"(stage 3){tag} ###")
                from ..eval import reconstruct_sources
                for ds in test_sets:
                    reconstruct_sources(
                        os.path.join(args.data_root, ds),
                        os.path.join(args.model_dir, f"output_{model}", ds),
                        hop=args.step_size, sample_rate=args.sample_rate)

        if args.stage <= 4:
            print(f"### Evaluating estimated sources (stage 4){tag} ###")
            from ..eval import evaluate_sources
            for ds in test_sets:
                data_dir = os.path.join(args.data_root, ds)
                if fused:
                    # utt2num_spk comes from the corpus layout, not features
                    _ensure_utt2num_spk(data_dir)
                means = evaluate_sources(
                    data_dir,
                    os.path.join(args.model_dir, f"output_{model}", ds),
                    num_workers=args.nj, device=args.device_scoring,
                    data_parallel=getattr(args, "data_parallel", False))
                print(f"{ds} mean SDR: {means['SDR']:.2f}")
                results[ds].append((model, means))

    if sweep and args.stage <= 4:
        for ds in test_sets:
            _write_sweep_results(args.model_dir, ds, results[ds])


# --------------------------------------------------------------------- main

def _add_common(p):
    p.add_argument("--data-root", default="data")
    p.add_argument("--id-lists-dir", default="id_lists")
    p.add_argument("--registry", default="",
                   help="dataset registry JSON (default id_lists/path.json)")


def _add_stft(p):
    p.add_argument("--fft-dim", type=int, default=512)
    p.add_argument("--step-size", type=int, default=128)
    p.add_argument("--sample-rate", type=int, default=8000)
    p.add_argument("--nj", type=int, default=1,
                   help="number of shards (reference array-job compat)")
    p.add_argument("--mj", type=int, default=1,
                   help="max concurrent worker processes (1 = in-process)")
    p.add_argument("--no-compress", action="store_true",
                   help="write stored (uncompressed) npz features — "
                        "removes zlib inflate from the training input path")


def _add_train(p):
    p.add_argument("--cv-data-dir", default="")
    p.add_argument("--model-config", default="")
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--start-epoch", type=int, default=0)
    p.add_argument("--num-epochs", type=int, default=200)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--grad-clip", type=float, default=0.25,
                   help="global-norm gradient clip (reference fixed 0.25, "
                        "train_qsub.py:121). The recurrent time-domain "
                        "archs train better at the literature's 5.0 — see "
                        "docs/performance.md DPRNN anatomy")
    p.add_argument("--lr-decay", type=float, default=1.0,
                   help="per-epoch multiplicative lr decay (1.0 = constant "
                        "like the reference; DPRNN's recipe uses ~0.99)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--time-pad-multiple", type=int, default=128)
    p.add_argument("--bucket-by-length", action="store_true")
    p.add_argument("--reference-resume", action="store_true",
                   help="drop optimizer state on resume, like the reference")
    p.add_argument("--reference-batching", action="store_true",
                   help="RSH fidelity mode: shuffled mixed batches split "
                        "into speaker-count sub-batches with gradient "
                        "accumulation and one optimizer step per batch, "
                        "exactly like the reference (archs/RSH.py:46-70)")
    p.add_argument("--no-plots", action="store_true")
    p.add_argument("--profile-dir", default="",
                   help="write a device trace of the first few steps here")
    p.add_argument("--train-copy-location", default="",
                   help="stage training features here first (reference flag)")
    p.add_argument("--max-restarts", type=int, default=2,
                   help="auto-resume from the newest checkpoint after a "
                        "transient crash, up to N times")
    p.add_argument("--hang-watchdog-sec", type=float, default=0.0,
                   help="supervise training in a child process and restart "
                        "it from the newest checkpoint if no optimizer "
                        "step/CV batch/checkpoint completes for N seconds "
                        "— recovers wedged device dispatches (a hang, "
                        "which --max-restarts alone cannot catch: it only "
                        "sees crashes). 0 = off")
    p.add_argument("--hang-first-timeout-sec", type=float, default=2400.0,
                   help="watchdog allowance before the FIRST heartbeat of "
                        "an attempt (cold XLA compiles legitimately block "
                        "for minutes on the tunnel backend)")
    p.add_argument("--on-device-features", action="store_true",
                   help="waveform-direct training: read wav.scp, compute "
                        "STFT features inside the train step (no feature "
                        "files, ~4x less host->device traffic)")


def build_parser():
    ap = argparse.ArgumentParser(prog="sepsep", description=__doc__)
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("prepare", help="build data/<set>/wav.scp")
    p.add_argument("dataset")
    _add_common(p)
    p.set_defaults(fn=cmd_prepare)

    p = sub.add_parser("validate", help="check data-dir consistency")
    p.add_argument("data_dir")
    p.set_defaults(fn=cmd_validate)

    p = sub.add_parser("split", help="shard a data dir")
    p.add_argument("data_dir")
    p.add_argument("num_shards", type=int)
    p.set_defaults(fn=cmd_split)

    p = sub.add_parser("extract", help="extract STFT features")
    p.add_argument("data_dir")
    p.add_argument("data_type", choices=["train", "test"])
    p.add_argument("feat_dir")
    _add_stft(p)
    p.add_argument("--pack-cache", action="store_true",
                   help="also pack a flat mmap feature cache (train only)")
    p.add_argument("--cache-dtype", default="float32",
                   choices=["float32", "float16"])
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("pack-features",
                       help="pack npz features into one mmap cache file "
                            "(fast repeated-epoch input at 100k scale)")
    p.add_argument("data_dir")
    p.add_argument("data_type", choices=["train"])
    p.add_argument("--cache-path", default="")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float16"])
    p.set_defaults(fn=cmd_pack_features)

    p = sub.add_parser("train", help="train a separation model")
    p.add_argument("arch")
    p.add_argument("data_dir")
    p.add_argument("exp_dir")
    _add_train(p)
    # STFT params matter in --on-device-features mode
    p.add_argument("--fft-dim", type=int, default=512)
    p.add_argument("--step-size", type=int, default=128)
    p.add_argument("--sample-rate", type=int, default=8000)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval-masks", help="generate masks for a test set")
    p.add_argument("model")
    p.add_argument("data_dir")
    p.add_argument("out_dir")
    p.add_argument("--arch", default="")
    p.add_argument("--model-config", default="")
    p.add_argument("--batch-size", type=int, default=100)
    p.set_defaults(fn=cmd_eval_masks)

    p = sub.add_parser("reconstruct", help="masked iSTFT -> wavs")
    p.add_argument("data_dir")
    p.add_argument("exp_dir")
    p.add_argument("--step-size", type=int, default=128)
    p.add_argument("--sample-rate", type=int, default=8000)
    p.set_defaults(fn=cmd_reconstruct)

    p = sub.add_parser("stage-data", help="copy scp-referenced files to fast local storage")
    p.add_argument("scp")
    p.add_argument("target_dir")
    p.add_argument("--bwlimit", type=float, default=0,
                   help="KB/s cap (reference rsync --bwlimit)")
    p.set_defaults(fn=lambda a: __import__(
        "speech_separation_tpu.datadir.stage", fromlist=["stage_scp_data"]
    ).stage_scp_data(a.scp, a.target_dir, a.bwlimit or None))

    p = sub.add_parser("separate", help="fused waveform->waveforms separation")
    p.add_argument("model")
    p.add_argument("out_dir")
    p.add_argument("wavs", nargs="+")
    p.add_argument("--model-config", default="")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-spk", type=int, default=0)
    p.add_argument("--fft-dim", type=int, default=512)
    p.add_argument("--step-size", type=int, default=128)
    p.add_argument("--sample-rate", type=int, default=8000)
    p.add_argument("--long-form", action="store_true",
                   help="window + permutation-align + crossfade (for "
                        "minutes-long recordings; one compiled shape)")
    p.add_argument("--window-sec", type=float, default=8.0)
    p.add_argument("--overlap-sec", type=float, default=1.0)
    p.add_argument("--server", default="",
                   help="socket of a running `sepsep serve` daemon: send "
                        "the request there instead of loading the model")
    p.add_argument("--server-wait", type=float, default=60.0,
                   help="seconds to wait for the server socket to appear")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each batch over all visible devices "
                        "(params replicated); batch-size is rounded up "
                        "to a device multiple")
    p.set_defaults(fn=cmd_separate)

    p = sub.add_parser("serve", help="resident separation server (warm "
                                     "model + compiled programs on a Unix "
                                     "socket; JSON-line protocol)")
    p.add_argument("model")
    p.add_argument("socket_path")
    p.add_argument("--model-config", default="")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--num-spk", type=int, default=0)
    p.add_argument("--fft-dim", type=int, default=512)
    p.add_argument("--step-size", type=int, default=128)
    p.add_argument("--sample-rate", type=int, default=8000)
    p.add_argument("--coalesce", type=int, default=32,
                   help="max queued requests merged into one device batch")
    p.add_argument("--streaming-model", default="",
                   help="causal checkpoint (TCN or Conv-TasNet) enabling the "
                        "live-stream protocol (stream_open/push/close; "
                        "docs/api.md)")
    p.add_argument("--streaming-model-config", default="",
                   help="key=value config for the streaming model")
    p.add_argument("--stream-capacity", type=int, default=8,
                   help="max concurrent live streams (one batched chunk "
                        "program)")
    p.add_argument("--stream-chunk-frames", type=int, default=16,
                   help="chunk size in STFT frames (latency = chunk + "
                        "n_fft/2 samples)")
    p.add_argument("--warmup-sec", default="",
                   help="comma-separated audio lengths (seconds) to "
                        "pre-compile at startup, e.g. '4,8'")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each device batch over all visible devices "
                        "(params replicated); batch-size is rounded up "
                        "to a device multiple")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("score", help="BSS-eval + SI-SDR scoring")
    p.add_argument("data_dir")
    p.add_argument("exp_dir")
    p.add_argument("--nj", type=int, default=0)
    p.add_argument("--device-scoring", action="store_true",
                   help="batched BSS-eval on the accelerator (two-float "
                        "arithmetic, within 0.1 dB of host float64; the "
                        "fast path for large test sets)")
    p.add_argument("--data-parallel", action="store_true",
                   help="(with --device-scoring) shard each scoring slab "
                        "over all visible devices")
    p.set_defaults(fn=cmd_score)

    p = sub.add_parser("oracle", help="oracle-mask upper bound eval")
    p.add_argument("data_dir")
    p.add_argument("--hard-mask", action="store_true")
    p.add_argument("--device-scoring", action="store_true",
                   help="batched BSS-eval on the accelerator (two-float; "
                        "host-f64 fallback via the trust gate)")
    p.add_argument("--data-parallel", action="store_true",
                   help="(with --device-scoring) shard each scoring slab "
                        "over all visible devices")
    _add_stft(p)
    p.set_defaults(fn=cmd_oracle)

    p = sub.add_parser("doctor", help="environment health check (backend "
                                      "probe in a killable child, native "
                                      "io, compile cache)")
    p.add_argument("--probe-timeout", type=float, default=60.0,
                   help="seconds before declaring the accelerator backend "
                        "hung")
    p.set_defaults(fn=cmd_doctor)

    p = sub.add_parser("info", help="inspect a checkpoint (arch, "
                                    "hyperparameters, state)")
    p.add_argument("model")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("bench", help="reference-scale throughput benchmark "
                                     "(one JSON line; bench.py)")
    p.add_argument("--rsh", action="store_true",
                   help="measure the RSH full train step instead of uPIT")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("warmup",
                       help="pre-populate the persistent compile cache: "
                            "AOT-compile train steps for the given archs "
                            "and shapes (serving shapes: `sepsep serve "
                            "--warmup-sec`)")
    p.add_argument("--archs", default="",
                   help="comma-separated arch names (default: all "
                        "registered)")
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--frames", type=int, default=384,
                   help="padded frame count for spectral archs")
    p.add_argument("--seconds", type=float, default=4.0,
                   help="utterance length for time-domain archs")
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--model-config",
                   help="key=value file of model hyperparameters")
    p.set_defaults(fn=cmd_warmup)

    p = sub.add_parser("import-model",
                       help="convert a reference torch .mdl state-dict into "
                            "a native checkpoint (arch and hyperparameters "
                            "inferred from the weight shapes)")
    p.add_argument("mdl_path")
    p.add_argument("out_path")
    p.set_defaults(fn=cmd_import_model)

    p = sub.add_parser("export-model",
                       help="convert a native checkpoint (uPIT/RSH) into a "
                            "reference torch .mdl state-dict, loadable by "
                            "the reference recipe or any torch pipeline")
    p.add_argument("ckpt_path")
    p.add_argument("out_path")
    p.set_defaults(fn=cmd_export_model)

    p = sub.add_parser("run-train", help="staged training recipe")
    p.add_argument("--stage", type=int, default=0)
    p.add_argument("--arch", default="uPIT")
    p.add_argument("--train-set", required=True)
    p.add_argument("--cv-set", default="")
    p.add_argument("--featdir", default="feats")
    _add_common(p)
    _add_stft(p)
    _add_train(p)
    p.set_defaults(fn=cmd_run_train)

    p = sub.add_parser("run-eval", help="staged evaluation recipe")
    p.add_argument("--stage", type=int, default=0)
    p.add_argument("--model-dir", required=True)
    p.add_argument("--test-sets", required=True,
                   help="space-separated dataset names")
    p.add_argument("--intermediate-model-num", default="")
    p.add_argument("--sweep-intermediates", action="store_true",
                   help="evaluate EVERY saved checkpoint (intermediate "
                        "epochs + final); writes per-test-set "
                        "sweep_results/<set>.txt tables and flags the best "
                        "model by SDR")
    p.add_argument("--model-config", default="")
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--featdir", default="feats")
    p.add_argument("--on-device-features", action="store_true",
                   help="fused wav->wav separation (no feature/mask files)")
    p.add_argument("--device-scoring", action="store_true",
                   help="batched BSS-eval on the accelerator")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard device batches over all visible devices "
                        "(applies to --on-device-features separation and "
                        "--device-scoring)")
    _add_common(p)
    _add_stft(p)
    p.set_defaults(fn=cmd_run_eval)

    return ap


def main(argv=None):
    # every distinct batch shape costs one XLA compile (up to minutes on a
    # TPU tunnel); the persistent cache makes that a once-per-machine cost
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
