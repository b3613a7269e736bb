"""Import reference torch checkpoints (.mdl state-dicts) for evaluation.

The reference saves ``torch.save(model.state_dict(), ...)`` at train time
(steps/train_qsub.py:148-155) and evaluates those files with the frozen arch
source (steps/eval_qsub.py:67). A reference user migrating here has trained
.mdl files; this module maps them onto this framework's parameter pytrees so
``sepsep import-model old.mdl new.mdl`` produces a native checkpoint that
eval-masks / run-eval consume directly.

Layout mapping (torch LSTM/BatchNorm1d/Linear -> models/blstm + ops/batchnorm
+ linear head):
- ``blstm.weight_ih_l{i}[_reverse]`` (4H, in)  -> params['blstm'][i][dir]['w_ih'].T
- ``blstm.weight_hh_l{i}[_reverse]`` (4H, H)   -> ...['w_hh'].T
- ``blstm.bias_ih + bias_hh``                  -> ...['b'] (algebraically one
  bias; stored summed — models/blstm.py)
- ``lin.weight`` (out, 2H) -> params['lin']['w'].T;  ``lin.bias`` -> ['b']
- ``bn.weight/bias`` -> gamma/beta;  ``bn.running_mean/var`` -> state['bn']

Gate order: torch packs LSTM gates as (i, f, g, o) — the same order
models/blstm.py uses — verified by shape checks here and by the round-trip
parity test (tests/test_import_torch.py).

The architecture and hyperparameters are inferred from the shapes:
RSH has input_dim == 2 * lin_out (archs/RSH.py:155-157); uPIT has
lin_out == feat_dim * num_spk with input_dim == feat_dim
(archs/uPIT.py:115-117).
"""

from __future__ import annotations

import numpy as np


def _to_numpy_state_dict(obj) -> dict:
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):  # torch tensor
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def load_torch_state_dict(path: str) -> dict:
    """torch.load the reference .mdl (a pickled state_dict)."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # older torch without weights_only
        sd = torch.load(path, map_location="cpu")
    return _to_numpy_state_dict(sd)


def infer_model_info(sd: dict) -> dict:
    """Infer {arch, feat_dim, num_spk, hidden, num_layers} from shapes."""
    if "blstm.weight_ih_l0" not in sd or "lin.weight" not in sd:
        raise ValueError("not a reference SepDNN state dict "
                         "(expected blstm.*/lin.*/bn.* keys)")
    w0 = sd["blstm.weight_ih_l0"]
    if w0.shape[0] % 4:
        raise ValueError(f"weight_ih_l0 first dim {w0.shape[0]} is not 4*H "
                         "(unexpected gate layout)")
    hidden = w0.shape[0] // 4
    input_dim = w0.shape[1]
    num_layers = len([k for k in sd
                      if k.startswith("blstm.weight_ih_l")
                      and not k.endswith("_reverse")])
    if f"blstm.weight_ih_l0_reverse" not in sd:
        raise ValueError("state dict is not bidirectional")
    lin_out = sd["lin.weight"].shape[0]
    if input_dim == 2 * lin_out:
        # RSH: input = concat(mix, attention) of dim 2F, one mask of dim F
        return {"arch": "RSH", "feat_dim": lin_out, "num_spk": None,
                "hidden": hidden, "num_layers": num_layers}
    if lin_out % input_dim == 0:
        return {"arch": "uPIT", "feat_dim": input_dim,
                "num_spk": lin_out // input_dim,
                "hidden": hidden, "num_layers": num_layers}
    raise ValueError(f"cannot infer arch from shapes: input_dim={input_dim}, "
                     f"lin_out={lin_out}")


def params_from_state_dict(sd: dict):
    """Returns (params, state, info) in this framework's pytree layout."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    info = infer_model_info(sd)
    f32 = lambda a: np.ascontiguousarray(a.T).astype(np.float32)
    layers = []
    for li in range(info["num_layers"]):
        directions = {}
        for direction, sfx in (("fwd", ""), ("bwd", "_reverse")):
            directions[direction] = {
                "w_ih": f32(sd[f"blstm.weight_ih_l{li}{sfx}"]),
                "w_hh": f32(sd[f"blstm.weight_hh_l{li}{sfx}"]),
                "b": (sd[f"blstm.bias_ih_l{li}{sfx}"]
                      + sd[f"blstm.bias_hh_l{li}{sfx}"]).astype(np.float32),
            }
        layers.append(directions)
    params = {
        "blstm": tuple(layers),
        "bn": {"gamma": sd["bn.weight"].astype(np.float32),
               "beta": sd["bn.bias"].astype(np.float32)},
        "lin": {"w": f32(sd["lin.weight"]),
                "b": sd["lin.bias"].astype(np.float32)},
    }
    state = {"bn": {"mean": sd["bn.running_mean"].astype(np.float32),
                    "var": sd["bn.running_var"].astype(np.float32)}}
    return params, state, info


def state_dict_from_params(params, state) -> dict:
    """Inverse of params_from_state_dict: a numpy state dict in the
    reference SepDNN layout (archs/uPIT.py:97-127 attribute names: blstm /
    bn / lin), loadable by ``model.load_state_dict`` on either reference
    arch. The framework stores the algebraic sum of torch's two LSTM bias
    vectors (models/blstm.py), so the split back is non-unique; the full
    bias goes to ``bias_ih`` with ``bias_hh`` zeroed — torch adds them, so
    every forward is unchanged. ``bn.num_batches_tracked`` is synthesized
    (modern torch's strict load_state_dict requires it; eval never reads
    it)."""
    blstm = params["blstm"]
    if isinstance(blstm, dict):  # raw msgpack checkpoint: keys "0".."N-1"
        blstm = [blstm[k] for k in sorted(blstm, key=int)]
    tT = lambda a: np.ascontiguousarray(np.asarray(a, np.float32).T)
    f32 = lambda a: np.asarray(a, np.float32)
    sd = {}
    for li, directions in enumerate(blstm):
        for direction, sfx in (("fwd", ""), ("bwd", "_reverse")):
            d = directions[direction]
            sd[f"blstm.weight_ih_l{li}{sfx}"] = tT(d["w_ih"])
            sd[f"blstm.weight_hh_l{li}{sfx}"] = tT(d["w_hh"])
            sd[f"blstm.bias_ih_l{li}{sfx}"] = f32(d["b"])
            sd[f"blstm.bias_hh_l{li}{sfx}"] = np.zeros_like(f32(d["b"]))
    sd["bn.weight"] = f32(params["bn"]["gamma"])
    sd["bn.bias"] = f32(params["bn"]["beta"])
    sd["bn.running_mean"] = f32(state["bn"]["mean"])
    sd["bn.running_var"] = f32(state["bn"]["var"])
    sd["bn.num_batches_tracked"] = np.asarray(1, np.int64)
    sd["lin.weight"] = tT(params["lin"]["w"])
    sd["lin.bias"] = f32(params["lin"]["b"])
    return sd


def export_reference_model(ckpt_path: str, out_path: str, log=print) -> dict:
    """Native checkpoint -> reference torch .mdl: lets a model trained here
    be evaluated by the reference recipe (steps/eval_qsub.py:67 loads
    ``torch.load`` state-dicts) or any torch pipeline. Only the BLSTM
    mask-estimation archs (uPIT/RSH) have a reference counterpart; the
    time-domain archs raise. Returns the inferred model info (same shape
    inference as import)."""
    import torch

    from ..train.checkpoint import load_checkpoint

    payload = load_checkpoint(ckpt_path)
    arch = payload["meta"].get("arch", "uPIT")
    if arch not in ("uPIT", "RSH"):
        raise ValueError(
            f"{ckpt_path} holds a {arch!r} model; only the reference archs "
            "(uPIT, RSH) can be exported to the reference .mdl format")
    sd_np = state_dict_from_params(payload["params"], payload["state"])
    info = infer_model_info(sd_np)  # validates layout + round-trip shapes
    # copy: checkpoint leaves can be read-only views; torch wants writable
    sd = {k: torch.from_numpy(np.array(v)) for k, v in sd_np.items()}
    torch.save(sd, out_path)
    log(f"exported {info['arch']} model ({info['num_layers']}x"
        f"{info['hidden']} BLSTM, feat_dim {info['feat_dim']}) "
        f"-> {out_path} (reference torch state-dict)")
    if info["hidden"] != 600 or info["num_layers"] != 2:
        # the reference SepDNN hardcodes 2x600 (archs/uPIT.py:115,
        # archs/RSH.py:155); other sizes load in generic torch pipelines
        # but shape-mismatch inside the stock reference recipe
        log(f"note: the stock reference recipe builds a fixed 2x600 BLSTM; "
            f"this {info['num_layers']}x{info['hidden']} export loads via "
            "plain torch.load/state-dict APIs but NOT via the unmodified "
            "reference eval scripts")
    return info


def import_reference_model(mdl_path: str, out_path: str, log=print) -> dict:
    """Convert a reference .mdl into a native checkpoint ready for
    eval-masks / run-eval. Returns the inferred model info."""
    from ..train.checkpoint import save_checkpoint

    sd = load_torch_state_dict(mdl_path)
    params, state, info = params_from_state_dict(sd)
    model_kwargs = {"feat_dim": str(info["feat_dim"]),
                    "hidden": str(info["hidden"]),
                    "num_layers": str(info["num_layers"])}
    if info["num_spk"] is not None:
        model_kwargs["num_spk"] = str(info["num_spk"])
    save_checkpoint(out_path, params=params, state=state,
                    meta={"arch": info["arch"], "model_kwargs": model_kwargs,
                          "imported_from": mdl_path})
    log(f"imported {info['arch']} model ({info['num_layers']}x"
        f"{info['hidden']} BLSTM, feat_dim {info['feat_dim']}) "
        f"-> {out_path}")
    return info
