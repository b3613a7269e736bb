"""Checkpointing: params + model state + optimizer state + RNG + epoch.

The reference checkpoints the bare state_dict every 5 epochs as
``intermediate_models/NNN.mdl`` plus ``init.mdl`` / ``final.mdl``
(steps/train_qsub.py:104-110,148-155) and loses the Adam moments and RNG on
resume (SURVEY.md §3.5 — a divergence we fix). We keep the exact file
naming/cadence for interface parity and store the *full* training state so
resume is bit-continuous; a reference-compat mode that drops the optimizer
state on load is available (``reset_optimizer=True``).

Format: a single msgpack file (flax.serialization) with a small JSON header
of static metadata. No orbax dependency — checkpoints stay portable,
single-file, and trivially inspectable.
"""

from __future__ import annotations

import json
import os
import struct

import jax
import numpy as np
from flax import serialization

_MAGIC = b"SEPTPU01"


def save_checkpoint(path: str, *, params, state, opt_state=None,
                    rng=None, epoch: int = 0, meta: dict | None = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        # to_state_dict converts tuple/NamedTuple pytrees (BLSTM layers,
        # optax states) into msgpack-able nested dicts
        "params": serialization.to_state_dict(jax.device_get(params)),
        "state": serialization.to_state_dict(jax.device_get(state)),
    }
    if opt_state is not None:
        payload["opt_state"] = serialization.to_state_dict(jax.device_get(opt_state))
    if rng is not None:
        payload["rng"] = np.asarray(jax.device_get(rng))
    header = json.dumps({"epoch": int(epoch), "meta": meta or {}}).encode()
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(blob)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(path: str, *, template=None, reset_optimizer: bool = False) -> dict:
    """Load a checkpoint. If `template` (a dict with the same keys as the
    saved payload) is given, leaves are restored onto its pytree structure —
    required for custom dataclass configs inside opt_state."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a speech_separation_tpu checkpoint")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode())
        payload = serialization.msgpack_restore(f.read())
    for key in ("opt_state", "rng"):
        payload.setdefault(key, None)
    if template is not None:
        for key in ("params", "state", "opt_state"):
            if template.get(key) is not None and payload.get(key) is not None:
                payload[key] = serialization.from_state_dict(
                    template[key], payload[key])
    if reset_optimizer:
        payload["opt_state"] = None
    payload["epoch"] = header["epoch"]
    payload["meta"] = header["meta"]
    return payload


def intermediate_model_path(exp_dir: str, epoch: int | str) -> str:
    """Reference naming: intermediate_models/NNN.mdl, init.mdl
    (train_qsub.py:105-107)."""
    name = epoch if isinstance(epoch, str) else f"{epoch:03d}"
    return os.path.join(exp_dir, "intermediate_models", f"{name}.mdl")


def final_model_path(exp_dir: str) -> str:
    return os.path.join(exp_dir, "final.mdl")
