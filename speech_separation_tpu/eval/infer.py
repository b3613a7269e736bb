"""Mask inference: the reference's steps/eval_qsub.py + compute_masks.

Loads a checkpoint, streams the test set through the eval-mode forward in
static-shape batches, and writes per-utterance mask npz files (keys
's1'..'sN', (freq, time) float32, trimmed to true length — the exact format
of archs/uPIT.py:220-225 / archs/RSH.py:283-287).

For RSH, batches are grouped by utterance speaker count (from utt2num_spk)
so the number of extraction passes is static per executable — the host-side
replacement for the reference's MultiSpkBatch.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..datadir.scp import read_utt2num_spk
from ..models.registry import get_arch
from ..train.checkpoint import load_checkpoint
from ..train.data import FeatureDataset, BatchPlan, make_device_batch, plan_batches


def load_model(model_path: str, arch_name: str = "",
               model_kwargs: dict | None = None):
    """Load (arch, cfg, params, state) from a checkpoint. The arch name and
    model hyperparameters come from the checkpoint meta (embedded at train
    time), overridable by the explicit arguments — so eval works without a
    separate config file (the reference needs its conf snapshot)."""
    ckpt = load_checkpoint(model_path)
    name = arch_name or ckpt["meta"].get("arch", "uPIT")
    arch = get_arch(name)
    kwargs = dict(ckpt["meta"].get("model_kwargs", {}))
    kwargs.update(model_kwargs or {})
    cfg = arch.Config.from_kwargs(**kwargs)
    # restore onto correctly-structured templates
    params_t, state_t = arch.init(jax.random.PRNGKey(0), cfg)
    from flax import serialization
    params = serialization.from_state_dict(params_t, ckpt["params"])
    state = serialization.from_state_dict(state_t, ckpt["state"])
    return arch, cfg, params, state


def generate_masks(model_path: str, data_dir: str, out_dir: str,
                   arch_name: str = "", model_kwargs: dict | None = None,
                   batch_size: int = 100, time_pad_multiple: int = 128,
                   seed: int = 0, log=print) -> None:
    arch, cfg, params, state = load_model(model_path, arch_name, model_kwargs)
    if getattr(arch, "DOMAIN", "spectrum") == "time":
        raise ValueError(
            f"{arch.NAME} is a time-domain architecture — it has no spectral "
            "masks to write. Evaluate through the fused waveform path "
            "(run-eval --on-device-features) or `sepsep separate`.")
    os.makedirs(out_dir, exist_ok=True)

    dataset = FeatureDataset(data_dir, "test")
    batch_size = min(batch_size, len(dataset))
    plan = BatchPlan(batch_size=batch_size, time_pad_multiple=time_pad_multiple,
                     group_by_num_spk=(arch.NAME == "RSH"), seed=seed)

    num_spks = None
    utt2num = None
    if arch.NAME == "RSH":
        utt2num = read_utt2num_spk(os.path.join(data_dir, "utt2num_spk"))
        num_spks = np.asarray([utt2num[dataset.utt_id(i)] for i in range(len(dataset))])

    rng = jax.random.PRNGKey(seed)
    infer_jit = {}  # one executable per static num_spk (RSH)

    n_done = 0
    for idxs in plan_batches(dataset, plan, 0, num_spks=num_spks, shuffle=False):
        samples = [dataset.load(i) for i in idxs]
        batch_np = make_device_batch(samples, plan)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                 if isinstance(v, np.ndarray)}
        rng, step_rng = jax.random.split(rng)

        if arch.NAME == "RSH":
            S = int(num_spks[idxs[0]])
            if S not in infer_jit:
                infer_jit[S] = jax.jit(
                    lambda b, r, _S=S: arch.infer_masks(cfg, params, state, b, r, _S))
            masks = np.asarray(infer_jit[S](batch, step_rng))  # (B, S, T, F)
            for row, i in enumerate(idxs):
                T_i = int(batch_np["lengths"][row])
                name = batch_np["names"][row]
                np.savez_compressed(
                    os.path.join(out_dir, name),
                    **{f"s{p + 1}": masks[row, p, :T_i].T.astype(np.float32)
                       for p in range(S)})
        else:
            if "upit" not in infer_jit:
                infer_jit["upit"] = jax.jit(
                    lambda b, r: arch.infer_masks(cfg, params, state, b, r))
            masks = np.asarray(infer_jit["upit"](batch, step_rng))  # (B,T,F*S)
            F = cfg.feat_dim
            for row, i in enumerate(idxs):
                T_i = int(batch_np["lengths"][row])
                name = batch_np["names"][row]
                np.savez_compressed(
                    os.path.join(out_dir, name),
                    **{f"s{s + 1}": masks[row, :T_i, s * F:(s + 1) * F].T.astype(np.float32)
                       for s in range(cfg.num_spk)})
        n_done += len(idxs)
    log(f"wrote masks for {n_done} utterances -> {out_dir}")
