"""Architecture plugin registry.

The reference loads arch plugins by module name via ``__import__``
(steps/train_qsub.py:66, steps/eval_qsub.py:43-44) against a duck-typed
contract (TrainSet / TestSet / SepDNN / compute_loss / compute_masks).
Here the contract is a functional protocol — each arch module exposes:

  NAME        str
  Config      dataclass with .from_kwargs(**str_kwargs)
  init(key, cfg)                          -> (params, state)
  loss_fn(cfg, params, state, batch, rng, train) -> (scalar, aux)
  infer_masks(cfg, params, state, batch, rng, ...) -> masks

Third-party archs register via ``register()`` or are importable by dotted
module path, preserving the reference's plug-in extensibility.
"""

from __future__ import annotations

import importlib

from . import upit, rsh, tcn, convtasnet, dprnn, sepformer

ARCHS = {"uPIT": upit, "RSH": rsh, "TCN": tcn, "ConvTasNet": convtasnet,
         "DPRNN": dprnn, "SepFormer": sepformer}


def domain(arch) -> str:
    """'spectrum' (STFT-magnitude batches, infer_masks contract) or 'time'
    (waveform batches, separate() contract) — see models/convtasnet.py."""
    return getattr(arch, "DOMAIN", "spectrum")


def register(name: str, module) -> None:
    ARCHS[name] = module


def get_arch(name: str):
    """Resolve an arch by registry name (case-sensitive, like the reference's
    file names) or dotted module path."""
    if name in ARCHS:
        return ARCHS[name]
    lowered = {k.lower(): v for k, v in ARCHS.items()}
    if name.lower() in lowered:
        return lowered[name.lower()]
    try:
        return importlib.import_module(name)
    except ImportError:
        raise KeyError(f"Unknown architecture {name!r}; registered: {sorted(ARCHS)}")
