"""Hang watchdog: supervise training in a child process via a heartbeat.

`train_with_restarts` (train/loop.py) recovers CRASHES — an exception
surfaces in-process and the driver resumes from the newest checkpoint.
It cannot recover HANGS: on the TPU-tunnel backend a client process can
wedge forever at a device dispatch (observed live: a training process
sat 26 minutes at its first dispatch with ~0 CPU and no output while
freshly started processes ran the same op in under 2 s — the failure is
per-CLIENT connection, so killing the process and starting a new one
fixes it). No in-process try/except can interrupt a blocked runtime RPC,
so hang recovery needs a process boundary: the training loop runs in a
spawned child that touches a heartbeat file after every optimizer step,
CV batch, and checkpoint write; the supervisor SIGKILLs the child when
the heartbeat goes stale and restarts from the newest intermediate
checkpoint, exactly as if it had crashed.

Two staleness allowances, because long silences are sometimes legitimate:
before the FIRST heartbeat of an attempt the child may be inside a cold
XLA compile (minutes on the tunnel — BENCH_r04 measured 287-504 s), so
`first_timeout_s` is generous; once steps are flowing, anything beyond
`hang_timeout_s` (default 900 s, above the worst compile ever measured
here, so a mid-run CV/bucket-shape compile never trips it) is a wedge.

The reference has no recovery of either kind (SGE `-r no`; manual
start_epoch — SURVEY.md §5, steps/qsub_train.sh). Enable with
`sepsep train/run-train --hang-watchdog-sec N`.
"""

from __future__ import annotations

import dataclasses
import json
import multiprocessing
import os
import time


class HangRecoveryExhausted(RuntimeError):
    """Supervised training kept hanging/crashing past max_restarts."""


def _supervise(target, args_for_attempt, heartbeat_file: str,
               hang_timeout_s: float, first_timeout_s: float,
               max_restarts: int, poll_s: float = 2.0, log=print) -> int:
    """Run `target(*args_for_attempt(attempt))` in spawned children until
    one exits cleanly; returns the number of restarts used. A child whose
    heartbeat file goes stale — `first_timeout_s` before its first beat
    (cold compiles legitimately block for minutes), `hang_timeout_s`
    after — is SIGKILLed. Kills and crashes both count against
    `max_restarts`. Generic over `target` so tests can drive it with
    stub children; training uses `train_supervised` below."""
    ctx = multiprocessing.get_context("spawn")
    attempt = 0
    while True:
        open(heartbeat_file, "w").close()
        t_start = os.path.getmtime(heartbeat_file)
        proc = ctx.Process(target=target, args=args_for_attempt(attempt))
        proc.start()
        killed = False
        while True:
            proc.join(timeout=poll_s)
            if proc.exitcode is not None:
                break
            try:
                mtime = os.path.getmtime(heartbeat_file)
            except OSError:  # deleted out from under us: treat as stale
                mtime = t_start
            allowed = hang_timeout_s if mtime > t_start else first_timeout_s
            stale = time.time() - mtime
            if stale > allowed:
                log(f"watchdog: heartbeat stale {stale:.0f}s "
                    f"(> {allowed:.0f}s allowed); killing wedged child "
                    f"pid {proc.pid}")
                proc.kill()
                proc.join(30)
                killed = True
                break
        if proc.exitcode == 0:
            return attempt
        reason = "hang-killed" if killed else f"died rc={proc.exitcode}"
        if attempt >= max_restarts:
            raise HangRecoveryExhausted(
                f"supervised child {reason}; max_restarts={max_restarts} "
                "exhausted")
        attempt += 1
        log(f"watchdog: child {reason}; restart {attempt}/{max_restarts}")


def _train_child(data_dir, exp_dir, loop_cfg, cv_data_dir, model_kwargs,
                 result_path) -> None:
    """Spawned-child entry: run the real training loop, leave a small JSON
    summary for the supervisor (model artifacts land on disk as always)."""
    from .loop import train
    out = train(data_dir, exp_dir, loop_cfg, cv_data_dir=cv_data_dir,
                model_kwargs=model_kwargs)
    with open(result_path, "w") as f:
        json.dump({"utts_per_sec": out.get("utts_per_sec")}, f)


def train_supervised(data_dir: str, exp_dir: str, loop_cfg,
                     hang_timeout_s: float = 900.0,
                     first_timeout_s: float = 2400.0,
                     max_restarts: int = 2, cv_data_dir: str = "",
                     model_kwargs: dict | None = None, log=print) -> dict:
    """Hang-AND-crash-recovering train driver (see module docstring).
    Returns {'utts_per_sec', 'restarts'}; the trained model is on disk in
    exp_dir (final.mdl), like every CLI training path. Each restart
    resumes from the newest intermediate checkpoint (a hang before any
    checkpoint simply restarts the attempt from start_epoch — the wedge
    is per-process, so a fresh child is the fix)."""
    from .loop import latest_intermediate_epoch

    os.makedirs(exp_dir, exist_ok=True)
    hb = os.path.join(exp_dir, ".heartbeat")
    result_path = os.path.join(exp_dir, ".train_result.json")
    try:
        os.remove(result_path)
    except OSError:
        pass

    def args_for_attempt(attempt: int):
        resume = loop_cfg.start_epoch
        if attempt:
            resume = max(latest_intermediate_epoch(exp_dir), resume)
            log(f"watchdog: resuming from epoch {resume}")
        cfg = dataclasses.replace(loop_cfg, start_epoch=resume,
                                  heartbeat_file=hb)
        return (data_dir, exp_dir, cfg, cv_data_dir, model_kwargs,
                result_path)

    restarts = _supervise(_train_child, args_for_attempt, hb,
                          hang_timeout_s, first_timeout_s, max_restarts,
                          log=log)
    res: dict = {"restarts": restarts}
    if os.path.isfile(result_path):
        with open(result_path) as f:
            res.update(json.load(f))
        os.remove(result_path)
    return res
