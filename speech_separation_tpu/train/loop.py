"""Training driver: the reference's steps/train_qsub.py as one jit'd step.

Per-batch work (reference train_qsub.py:116-122) — forward, PIT loss,
backward, global-norm clip at 0.25, Adam(lr=1e-3) — compiles into a single
XLA program; the host only feeds batches and logs scalars. Reference
behaviors kept for interface parity:

- epoch losses are norm-weighted means accumulated exactly like
  train_qsub.py:118-119 and appended to train_stats/train_loss.txt /
  cv_loss.txt as ``NNN <loss>`` lines (:143-145); on resume the logs are
  truncated to epochs <= start_epoch (qsub_train.sh:71-75) and replayed;
- CV every 5 epochs (epoch % 5 == 4) in eval mode (BN running stats, no
  update), with spectrogram plots of the first CV batch (:124-141);
- checkpoints: init.mdl at epoch 0, intermediate_models/NNN.mdl every 5
  epochs, final.mdl at the end (:104-110,148-155). Unlike the reference,
  checkpoints carry optimizer + RNG state so resume is bit-continuous
  (SURVEY.md §3.5 divergence, deliberate); ``reference_resume=True``
  restores weights only.

TPU specifics: batches are padded to static shapes (see train.data); one
executable per distinct (T, B, S) shape; when the process sees multiple
devices, the batch is sharded over the 'data' mesh axis and XLA derives the
gradient all-reduce (psum over ICI) from the sharding annotations — the
replacement for the reference's single-GPU-only training (SURVEY.md §2
parallelism table).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .checkpoint import (save_checkpoint, load_checkpoint,
                         intermediate_model_path, final_model_path)
from .data import FeatureDataset, BatchPlan, iter_batches
from ..dsp.stft import STFTConfig
from ..models.registry import get_arch
from ..parallel.mesh import get_mesh, shard_batch


@dataclasses.dataclass(frozen=True)
class TrainLoopConfig:
    arch: str = "uPIT"
    batch_size: int = 100
    num_epochs: int = 200
    learning_rate: float = 1e-3
    grad_clip: float = 0.25
    # per-epoch multiplicative lr decay (1.0 = constant, the reference's
    # behavior). The time-domain literature trains with decay — e.g. DPRNN
    # (Luo et al. 2020) uses 0.98 every 2 epochs = 0.99 per epoch — and the
    # recurrent time-domain archs here converge measurably further with it
    # (docs/performance.md DPRNN anatomy). Applied as a staircase schedule
    # stepped once per epoch (train() passes steps_per_epoch).
    lr_decay: float = 1.0
    start_epoch: int = 0
    checkpoint_every: int = 5
    cv_every: int = 5
    seed: int = 0
    time_pad_multiple: int = 128
    bucket_by_length: bool = False
    reference_resume: bool = False  # drop optimizer state on resume, like the reference
    # RSH mixed-batch fidelity (archs/RSH.py:46-70 + steps/train_qsub.py:
    # 116-122): draw ONE shuffled batch, split it into speaker-count
    # sub-batches, sum loss/norm across them, take ONE optimizer step —
    # instead of this framework's default epoch-level speaker-count
    # grouping. Identical on single-speaker-count corpora; changes batch
    # composition and step count on mixed corpora.
    reference_batching: bool = False
    make_plots: bool = True
    # stage training features to fast local storage first
    # (reference --train-copy-location, archs/uPIT.py:56-58)
    train_copy_location: str = ""
    # observability (the reference has none — SURVEY.md §5): device trace of
    # the first profile_steps batches written to profile_dir
    profile_dir: str = ""
    profile_steps: int = 5
    # waveform-direct training: read wav.scp, ship audio to the device, and
    # compute the STFT features inside the jit'd train step — ~4x less
    # host->device traffic and no feature files (see train/wav_data.py).
    # Numerically identical to precomputed features (same STFT program).
    on_device_features: bool = False
    stft: STFTConfig = STFTConfig()
    # hang-watchdog liveness: when set, the loop touches this file after
    # every optimizer step, CV batch, and checkpoint write so a supervisor
    # (train/watchdog.py) can distinguish a wedged device dispatch from a
    # long-but-legitimate compile. Set by train_supervised, not by hand.
    heartbeat_file: str = ""


def make_optimizer(cfg: TrainLoopConfig, steps_per_epoch: int | None = None):
    """Reference optimizer (clip -> Adam, train_qsub.py:95,121), optionally
    with a per-epoch staircase lr decay (cfg.lr_decay < 1.0). The schedule
    steps on the optimizer's update count, so steps_per_epoch converts the
    per-epoch rate; without it (step-factory callers: bench, dryrun) decay
    is ignored and the lr is constant, matching the reference."""
    lr = cfg.learning_rate
    if cfg.lr_decay != 1.0 and steps_per_epoch:
        lr = optax.exponential_decay(cfg.learning_rate,
                                     transition_steps=steps_per_epoch,
                                     decay_rate=cfg.lr_decay, staircase=True)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(lr),
    )


def _step_compiler_options(arch, model_cfg) -> dict | None:
    """RSH's bf16 backward Pallas kernel needs ~17 MB of scoped VMEM at
    reference scale (B=100, H=600): the cross-pass hidden carryover keeps
    the dh0/dc0 kernel outputs alive, pushing the stack past the 16 MB
    default by ~5%. Raise the limit for that configuration only (TPU-only
    flag; uPIT fits the default and is left untouched)."""
    if (arch.NAME == "RSH"
            and getattr(model_cfg, "compute_dtype", "") == "bfloat16"
            and jax.devices()[0].platform == "tpu"):
        return {"xla_tpu_scoped_vmem_limit_kib": "20480"}
    return None


def _upcast_features(batch: dict) -> dict:
    """Features may ship half-precision (an f16 packed cache — half the
    host->device bytes); the loss math runs f32, so upcast on device."""
    out = dict(batch)
    for k in ("mix", "sources", "combo"):
        if k in out and out[k].dtype == jnp.float16:
            out[k] = out[k].astype(jnp.float32)
    return out


def make_update_step(arch, model_cfg, optimizer, stft_cfg: STFTConfig | None = None):
    """One jit'd train step: grads of (loss/norm), clip, Adam, BN update.
    With stft_cfg set, the batch carries waveforms and the feature
    extraction fuses into the same XLA program (waveform-direct mode)."""

    time_domain = getattr(arch, "DOMAIN", "spectrum") == "time"

    # donate params/state/opt_state: their HBM buffers are updated in place
    # instead of double-buffered (the caller reassigns them every step)
    @partial(jax.jit, donate_argnums=(0, 1, 2),
             compiler_options=_step_compiler_options(arch, model_cfg))
    def step(params, state, opt_state, batch, rng):
        if stft_cfg is not None:
            from .wav_data import audio_to_feature_batch, audio_to_wave_batch
            batch = (audio_to_wave_batch if time_domain
                     else audio_to_feature_batch)(batch, stft_cfg)
        batch = _upcast_features(batch)

        def lossf(p):
            loss, aux = arch.loss_fn(model_cfg, p, state, batch, rng, True)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(lossf, has_aux=True)(params)
        updates, opt_state_new = optimizer.update(grads, opt_state, params)
        params_new = optax.apply_updates(params, updates)
        return params_new, aux["new_state"], opt_state_new, loss, aux["norm"]

    return step


def make_grad_step(arch, model_cfg):
    """Gradient-accumulation piece of the reference mixed-batch semantics:
    grads of the UNNORMALIZED loss for one speaker-count sub-batch. Since
    the reference backprops (sum_sb total_sb) / (sum_sb norm_sb) and the
    norms are data-only, d/dp = (sum_sb d total_sb/dp) / total_norm — the
    caller sums these grads and apply_step divides once."""

    @partial(jax.jit, compiler_options=_step_compiler_options(arch, model_cfg))
    def gstep(params, state, batch, rng):
        batch = _upcast_features(batch)

        def lossf(p):
            _, aux = arch.loss_fn(model_cfg, p, state, batch, rng, True)
            return aux["total"], aux

        (total, aux), grads = jax.value_and_grad(lossf, has_aux=True)(params)
        return total, aux["norm"], aux["new_state"], grads

    return gstep


def make_apply_step(optimizer):
    """Apply one optimizer step from accumulated unnormalized grads:
    scale by 1/total_norm, then clip 0.25 + Adam (the clip sees exactly the
    gradient torch's clip_grad_norm_ saw after backward of loss/norm)."""

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def astep(params, opt_state, grads, total_norm):
        grads = jax.tree_util.tree_map(lambda g: g / total_norm, grads)
        updates, opt_state_new = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state_new

    return astep


def make_eval_step(arch, model_cfg, stft_cfg: STFTConfig | None = None):
    time_domain = getattr(arch, "DOMAIN", "spectrum") == "time"

    @jax.jit
    def step(params, state, batch, rng):
        if stft_cfg is not None:
            from .wav_data import audio_to_feature_batch, audio_to_wave_batch
            batch = (audio_to_wave_batch if time_domain
                     else audio_to_feature_batch)(batch, stft_cfg)
        batch = _upcast_features(batch)
        loss, aux = arch.loss_fn(model_cfg, params, state, batch, rng, False)
        return loss, aux["norm"]

    return step


def _truncate_loss_file(path: str, max_epoch: int) -> list[tuple[int, float]]:
    """Reference resume semantics (qsub_train.sh:71-75 + train_qsub.py:55-60):
    keep only epochs <= max_epoch, rewrite the file, return the history."""
    history = []
    if os.path.isfile(path):
        with open(path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2 and int(parts[0]) <= max_epoch:
                    history.append((int(parts[0]), float(parts[1])))
        with open(path, "w") as f:
            for ep, loss in history:
                f.write(f"{ep:03d} {loss}\n")
    return history


def _device_put_batch(batch: dict, mesh) -> dict:
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    if mesh is not None:
        arrays = shard_batch(arrays, mesh)
    else:
        arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
    return arrays


class ExpDirLocked(RuntimeError):
    pass


class _ExpLock:
    """Concurrent-run guard: two trainers writing one exp dir corrupt the
    checkpoints and loss logs. The reference guarded the analogous hazard
    (two jobs sharing a staging dir) with an existence-check abort
    (qsub_train.sh:64-69); this is the same idea with stale-lock recovery:
    a lock owned by a dead PID is silently replaced."""

    def __init__(self, exp_dir: str):
        self.path = os.path.join(exp_dir, ".train.lock")

    def __enter__(self):
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        # the PID is written to a private file first and hard-linked into
        # place: the lock always APPEARS with its content (no reader can
        # see a half-written lock), and link() is atomic-fail-if-exists
        tmp = f"{self.path}.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(str(os.getpid()))
        try:
            while True:
                try:
                    os.link(tmp, self.path)
                    return self
                except FileExistsError:
                    pass
                try:
                    pid = int(open(self.path).read().strip())
                except FileNotFoundError:
                    time.sleep(0.05)
                    continue  # released between attempts; retry
                except OSError as e:
                    # a persistent read error (EACCES on a cross-uid 0600
                    # lock, EIO, stale NFS handle) would otherwise spin
                    # this loop forever — treat unreadable as locked
                    raise ExpDirLocked(
                        f"{os.path.dirname(self.path)} has a lock file "
                        f"this process cannot read ({e}); refusing to run "
                        "concurrently") from e
                except ValueError:
                    pid = -1  # unparsable => stale (content is atomic)
                if pid > 0:
                    try:
                        os.kill(pid, 0)  # raises if the owner is gone
                        live = True
                    except ProcessLookupError:
                        live = False
                    except PermissionError:
                        live = True  # exists under another uid
                    if live:
                        raise ExpDirLocked(
                            f"{os.path.dirname(self.path)} is being trained "
                            f"by live pid {pid}; refusing to run "
                            "concurrently")
                # stale: steal via rename — atomic, so exactly ONE waiter
                # wins the steal; the rest see FileNotFoundError and retry
                steal = f"{self.path}.stale.{os.getpid()}"
                try:
                    os.rename(self.path, steal)
                    os.remove(steal)
                except OSError:
                    pass  # another waiter stole it first; retry the link
        finally:
            try:
                os.remove(tmp)
            except OSError:
                pass

    def __exit__(self, *exc):
        try:
            os.remove(self.path)
        except OSError:
            pass


def latest_intermediate_epoch(exp_dir: str) -> int:
    """Highest saved intermediate checkpoint epoch, 0 if none."""
    int_dir = os.path.join(exp_dir, "intermediate_models")
    if not os.path.isdir(int_dir):
        return 0
    epochs = [int(f[:3]) for f in os.listdir(int_dir)
              if f.endswith(".mdl") and f[:3].isdigit()]
    return max(epochs, default=0)


def train_with_restarts(data_dir: str, exp_dir: str,
                        loop_cfg: TrainLoopConfig, max_restarts: int = 0,
                        log=print, **kwargs) -> dict:
    """Failure-recovering driver: on a crash (e.g. a transient TPU-runtime
    error), resume from the newest intermediate checkpoint, up to
    max_restarts times. The reference had no recovery at all (SGE -r no;
    manual start_epoch — SURVEY.md §5)."""
    attempt = 0
    cfg = loop_cfg
    while True:
        try:
            return train(data_dir, exp_dir, cfg, log=log, **kwargs)
        except (ExpDirLocked, KeyboardInterrupt):
            raise
        except Exception as e:
            if attempt >= max_restarts:
                raise
            attempt += 1
            resume_from = max(latest_intermediate_epoch(exp_dir),
                              cfg.start_epoch)
            log(f"training crashed ({type(e).__name__}: {e}); "
                f"restart {attempt}/{max_restarts} from epoch {resume_from}")
            cfg = dataclasses.replace(cfg, start_epoch=resume_from)


def train(data_dir: str, exp_dir: str, loop_cfg: TrainLoopConfig,
          cv_data_dir: str = "", model_kwargs: dict | None = None,
          use_mesh: bool = True, log=print) -> dict:
    """Run the full training loop. Returns {'params', 'state', 'model_cfg'}."""
    with _ExpLock(exp_dir):
        return _train_locked(data_dir, exp_dir, loop_cfg, cv_data_dir,
                             model_kwargs, use_mesh, log)


def _train_locked(data_dir: str, exp_dir: str, loop_cfg: TrainLoopConfig,
                  cv_data_dir: str = "", model_kwargs: dict | None = None,
                  use_mesh: bool = True, log=print) -> dict:
    arch = get_arch(loop_cfg.arch)
    model_cfg = arch.Config.from_kwargs(**(model_kwargs or {}))
    if (getattr(arch, "DOMAIN", "spectrum") == "time"
            and not loop_cfg.on_device_features):
        raise ValueError(
            f"{arch.NAME} is a time-domain architecture: it trains on "
            "waveforms, not spectral feature files. Run with "
            "--on-device-features (wav.scp input; no extraction stage).")
    # embedded in every checkpoint so eval can reconstruct the model
    # without a separate config file (the reference needs the conf
    # snapshot + frozen arch.py for this)
    ckpt_meta = {"arch": arch.NAME,
                 "model_kwargs": {k: str(v) for k, v in (model_kwargs or {}).items()}}
    for k, v in (model_kwargs or {}).items():
        log(f"modelparam: {k} {v}")

    stats_dir = os.path.join(exp_dir, "train_stats")
    plot_dir = os.path.join(stats_dir, "plots")
    os.makedirs(stats_dir, exist_ok=True)
    loss_file = os.path.join(stats_dir, "train_loss.txt")
    cv_loss_file = os.path.join(stats_dir, "cv_loss.txt")

    collate_fn = cv_collate_fn = None
    if loop_cfg.on_device_features:
        # waveform-direct mode: data_dir needs only wav.scp; features are
        # computed inside the train step (train/wav_data.py)
        from .wav_data import WavDataset, collate_wav_batch
        dataset = WavDataset(data_dir, loop_cfg.stft)
        cv_dataset = WavDataset(cv_data_dir, loop_cfg.stft) if cv_data_dir else None
        collate_fn = lambda idxs: collate_wav_batch(dataset, idxs,
                                                    loop_cfg.batch_size)
        if cv_dataset:
            cv_collate_fn = lambda idxs: collate_wav_batch(
                cv_dataset, idxs, loop_cfg.batch_size)
    else:
        dataset = FeatureDataset(data_dir, "train",
                                 copy_location=loop_cfg.train_copy_location)
        cv_dataset = (FeatureDataset(cv_data_dir, "train")
                      if cv_data_dir else None)
    reference_batching = loop_cfg.reference_batching and arch.NAME == "RSH"
    plan = BatchPlan(batch_size=loop_cfg.batch_size,
                     time_pad_multiple=loop_cfg.time_pad_multiple,
                     bucket_by_length=loop_cfg.bucket_by_length,
                     group_by_num_spk=(arch.NAME == "RSH"
                                       and not reference_batching),
                     seed=loop_cfg.seed)
    def _spk_counts(ds):
        if ds is None or not (plan.group_by_num_spk or reference_batching):
            return None
        if ds.num_spks is not None:
            return ds.num_spks
        # legacy feature dirs without utt2num_spk: inspect the npz
        return np.asarray([s["sources"].shape[0] if "sources" in s else 1
                           for s in map(ds.load, range(len(ds)))])

    num_spks = _spk_counts(dataset)
    cv_num_spks = _spk_counts(cv_dataset)

    mesh = get_mesh() if use_mesh and len(jax.devices()) > 1 else None

    key = jax.random.PRNGKey(loop_cfg.seed)
    key, init_key = jax.random.split(key)
    params, state = arch.init(init_key, model_cfg)
    # steps per epoch for the (optional) per-epoch lr-decay staircase; the
    # Adam update count in opt_state carries the schedule across resumes
    steps_per_epoch = max(1, -(-len(dataset) // loop_cfg.batch_size))
    optimizer = make_optimizer(loop_cfg, steps_per_epoch)
    opt_state = optimizer.init(params)

    epoch_losses: list[tuple[int, float]] = []
    cv_losses: list[tuple[int, float]] = []

    if loop_cfg.start_epoch == 0:
        save_checkpoint(intermediate_model_path(exp_dir, "init"),
                        params=params, state=state, opt_state=opt_state,
                        rng=jax.random.key_data(key), epoch=0,
                        meta=ckpt_meta)
        # fresh run: reference appends to existing logs only on resume
        open(loss_file, "w").close()
        if cv_dataset:
            open(cv_loss_file, "w").close()
    else:
        ckpt = load_checkpoint(
            intermediate_model_path(exp_dir, loop_cfg.start_epoch),
            template={"params": params, "state": state, "opt_state": opt_state},
            reset_optimizer=loop_cfg.reference_resume)
        params, state = ckpt["params"], ckpt["state"]
        if ckpt["opt_state"] is not None:
            opt_state = ckpt["opt_state"]
        if ckpt["rng"] is not None and not loop_cfg.reference_resume:
            key = jax.random.wrap_key_data(jnp.asarray(ckpt["rng"]))
        epoch_losses = _truncate_loss_file(loss_file, loop_cfg.start_epoch)
        cv_losses = _truncate_loss_file(cv_loss_file, loop_cfg.start_epoch)

    stft_for_step = loop_cfg.stft if loop_cfg.on_device_features else None
    update_step = make_update_step(arch, model_cfg, optimizer, stft_for_step)
    eval_step = make_eval_step(arch, model_cfg, stft_for_step)

    grad_step = apply_step = None
    if reference_batching:
        if loop_cfg.on_device_features:
            raise ValueError("reference_batching needs feature-file input "
                             "(the mixed-batch split is a collation rule)")
        from .data import collate_mixed_batch
        grad_step = make_grad_step(arch, model_cfg)
        apply_step = make_apply_step(optimizer)
        collate_fn = lambda idxs: collate_mixed_batch(dataset, idxs, plan,
                                                      num_spks)
        if cv_dataset:
            cv_collate_fn = lambda idxs: collate_mixed_batch(
                cv_dataset, idxs, plan, cv_num_spks)

    def transfer_fn(batch):
        # runs in the prefetch thread: H2D overlaps device compute
        if isinstance(batch, list):  # mixed batch: list of sub-batches
            # shard_batch row-pads indivisible sub-batches, so every
            # sub-batch gets real data parallelism
            subs = [_device_put_batch(sb, mesh) for sb in batch]
            return {"_subs": subs,
                    "_n_real": float(sum(sb["row_mask"].sum() for sb in batch))}
        dev = _device_put_batch(batch, mesh)
        dev["_n_real"] = float(batch["row_mask"].sum())  # host-side count
        return dev

    lossF = open(loss_file, "a")
    cv_lossF = open(cv_loss_file, "a") if cv_dataset else None

    hb_path = loop_cfg.heartbeat_file
    if hb_path:
        open(hb_path, "a").close()

    def _beat():
        if hb_path:
            try:
                os.utime(hb_path, None)
            except OSError:
                pass

    profiling = bool(loop_cfg.profile_dir)
    utts_seen = 0
    t_start = time.time()
    for epoch in range(loop_cfg.start_epoch, loop_cfg.num_epochs):
        epoch_loss, epoch_norm = 0.0, 0.0
        epoch_utts = 0
        t_epoch = time.time()
        for i_batch, dev_batch in enumerate(
                iter_batches(dataset, plan, epoch, num_spks=num_spks,
                             collate_fn=collate_fn, transfer_fn=transfer_fn)):
            if profiling and i_batch == 1:  # skip the compile batch
                try:
                    jax.profiler.start_trace(loop_cfg.profile_dir)
                except Exception as e:
                    log(f"warning: profiler unavailable: {e}")
                    profiling = False
            key, step_key = jax.random.split(key)
            n_real = dev_batch.pop("_n_real")
            if "_subs" in dev_batch:
                # reference mixed-batch semantics: grads accumulate over the
                # speaker-count sub-batches (BN state threads through them in
                # order), then ONE clip+Adam step on the summed gradient
                # scaled by the summed norm (train_qsub.py:116-122).
                # totals/norms stay device scalars so dispatch is never
                # serialized by a per-sub-batch host sync — the only
                # host transfer is the logging read after the step
                total_sum = norm_sum = acc = None
                for sb in dev_batch["_subs"]:
                    key, sub_key = jax.random.split(key)
                    total, norm_sb, state, grads = grad_step(
                        params, state, sb, sub_key)
                    total_sum = (total if total_sum is None
                                 else total_sum + total)
                    norm_sum = (norm_sb if norm_sum is None
                                else norm_sum + norm_sb)
                    acc = (grads if acc is None else
                           jax.tree_util.tree_map(jnp.add, acc, grads))
                params, opt_state = apply_step(params, opt_state, acc,
                                               norm_sum)
                norm = float(norm_sum)
                loss = float(total_sum) / norm
            else:
                params, state, opt_state, loss, norm = update_step(
                    params, state, opt_state, dev_batch, step_key)
                loss, norm = float(loss), float(norm)
            if profiling and i_batch == loop_cfg.profile_steps:
                try:
                    jax.profiler.stop_trace()
                    log(f"profiler trace written to {loop_cfg.profile_dir}")
                except Exception:
                    pass
                profiling = False
            epoch_loss += loss * norm
            epoch_norm += norm
            epoch_utts += int(n_real)
            _beat()
        utts_seen += epoch_utts
        epoch_wall = time.time() - t_epoch
        log(f"epoch {epoch + 1:03d} wall: {epoch_wall:.1f}s "
            f"({epoch_utts / max(epoch_wall, 1e-9):.1f} utts/sec)")

        if cv_dataset and (epoch + 1) % loop_cfg.cv_every == 0:
            cv_loss_sum, cv_norm_sum = 0.0, 0.0
            first = True
            for dev_batch in iter_batches(cv_dataset, plan, 0, shuffle=False,
                                          num_spks=cv_num_spks,
                                          collate_fn=cv_collate_fn,
                                          transfer_fn=transfer_fn):
                key, step_key = jax.random.split(key)
                dev_batch.pop("_n_real", None)
                sub_batches = dev_batch.get("_subs", [dev_batch])
                for sb in sub_batches:
                    key, sub_key = jax.random.split(key)
                    loss, norm = eval_step(params, state, sb, sub_key)
                    cv_loss_sum += float(loss) * float(norm)
                    cv_norm_sum += float(norm)
                    _beat()
                if first and loop_cfg.make_plots:
                    _plot_cv_batch(arch, model_cfg, params, state,
                                   sub_batches[0], step_key,
                                   os.path.join(plot_dir, f"epoch{epoch + 1:03d}"))
                    first = False
            cv_avg = cv_loss_sum / cv_norm_sum
            log(f"For epoch: {epoch + 1:03d} cv set loss is: {cv_avg}")
            cv_lossF.write(f"{epoch + 1:03d} {cv_avg}\n")
            cv_lossF.flush()
            cv_losses.append((epoch + 1, cv_avg))

        avg = epoch_loss / epoch_norm
        log(f"For epoch: {epoch + 1:03d} loss is: {avg}")
        lossF.write(f"{epoch + 1:03d} {avg}\n")
        lossF.flush()
        epoch_losses.append((epoch + 1, avg))

        if (epoch + 1) % loop_cfg.checkpoint_every == 0:
            log(f"Saving model for epoch {epoch + 1:03d}")
            save_checkpoint(intermediate_model_path(exp_dir, epoch + 1),
                            params=params, state=state, opt_state=opt_state,
                            rng=jax.random.key_data(key), epoch=epoch + 1,
                            meta=ckpt_meta)
            _beat()
            if loop_cfg.make_plots and epoch_losses:
                from ..utils.plot import plot_loss
                first_ep = epoch_losses[0][0]
                plot_loss(list(zip(*epoch_losses)), list(zip(*cv_losses)) if cv_losses else None,
                          os.path.join(plot_dir, f"epoch{epoch + 1:03d}",
                                       f"Loss_{first_ep:03d}-{epoch + 1:03d}.png"))
        sys.stdout.flush()

    save_checkpoint(final_model_path(exp_dir),
                    params=params, state=state, opt_state=opt_state,
                    rng=jax.random.key_data(key),
                    epoch=loop_cfg.num_epochs, meta=ckpt_meta)
    if loop_cfg.make_plots and epoch_losses:
        from ..utils.plot import plot_loss
        first_ep = epoch_losses[0][0]
        plot_loss(list(zip(*epoch_losses)), list(zip(*cv_losses)) if cv_losses else None,
                  os.path.join(plot_dir, f"Loss_{first_ep:03d}-{loop_cfg.num_epochs:03d}.png"))

    wall = time.time() - t_start
    log(f"trained {utts_seen} utterance-steps in {wall:.1f}s "
        f"({utts_seen / max(wall, 1e-9):.2f} utts/sec)")
    return {"params": params, "state": state, "model_cfg": model_cfg,
            "utts_per_sec": utts_seen / max(wall, 1e-9)}


def _plot_cv_batch(arch, model_cfg, params, state, dev_batch, rng, plotdir):
    """Reference CV plots (archs/uPIT.py:199-204): mixture, masked mixture,
    chosen permutation for the first CV utterance."""
    try:
        if "mix" not in dev_batch:
            return  # waveform-direct batches: spectra live on device only
        from ..utils.plot import plot_spec
        loss, aux = arch.loss_fn(model_cfg, params, state, dev_batch, rng, False)
        mix = np.asarray(dev_batch["mix"][0])
        plot_spec(mix, os.path.join(plotdir, "Mixture.png"))
        if arch.NAME != "RSH":
            # uPIT-contract archs (uPIT, TCN): aux carries masked/best_perm
            masked = np.asarray(aux["masked"][0])  # (T, S, F)
            T, S, F = masked.shape
            plot_spec(masked.reshape(T, S * F),
                      os.path.join(plotdir, "Masked_Mixture.png"))
            from ..ops.pit import make_permutations
            perm = make_permutations(model_cfg.num_spk)[int(aux["best_perm"][0])]
            sources = np.asarray(dev_batch["sources"][0])  # (S, T, F)
            chosen = np.concatenate([sources[i] for i in perm], axis=1)
            plot_spec(chosen, os.path.join(plotdir, "Chosen_Permutation.png"))
        else:
            # RSH per-pass artifacts (reference archs/RSH.py:243-252):
            # Mix, and per pass Input/Attenmask/Mask_Out/Masked_Mix/
            # Chosen_Source, named by the sub-batch speaker count
            masks = np.asarray(aux["masks"][0])        # (S, T, F)
            assigns = np.asarray(aux["assignments"][0])  # (S,)
            sources = np.asarray(dev_batch["sources"][0])
            S, T, F = masks.shape
            n = sources.shape[0]
            plot_spec(mix, os.path.join(plotdir, f"{n}-Spk_Mix.png"))
            atten = np.ones_like(mix)
            for p in range(S):
                prefix = os.path.join(plotdir, f"{n}-Spk_Pass-{p + 1}_")
                plot_spec(np.concatenate([mix, atten], axis=1), prefix + "Input.png")
                plot_spec(atten, prefix + "Attenmask.png")
                plot_spec(masks[p], prefix + "Mask_Out.png")
                plot_spec(masks[p] * mix, prefix + "Masked_Mix.png")
                plot_spec(sources[assigns[p]], prefix + "Chosen_Source.png")
                atten = np.maximum(atten - masks[p], 0.0)
    except Exception as e:  # plotting must never kill training
        print(f"warning: cv plotting failed: {e}")
