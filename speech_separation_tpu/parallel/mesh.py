"""Device mesh and sharding: the framework's distributed-execution story.

The reference's only multi-worker compute is file-sharded SGE array jobs,
and training is strictly single-GPU (SURVEY.md §2 parallelism table). The
TPU-native replacement is a ``jax.sharding.Mesh`` with two axes:

- ``data``:  batch sharding for data-parallel training. Batches are placed
  with NamedSharding(P('data')) on the leading axis; parameters are
  replicated. Under jit, XLA derives the gradient all-reduce (psum over
  ICI) from these annotations — no hand-written collectives.
- ``model``: tensor-parallel axis, unused (size 1) at this model scale
  (~13M params) but plumbed so TP is a mesh-reshape away: the mask head's
  Linear(1200 -> feat_dim*num_spk) and the LSTM gate matmuls accept a
  sharding rule along their output dimension via ``shard_params``.

All helpers work on any backend — the test suite exercises them on an
8-device virtual CPU mesh, and the driver's dryrun validates the same code
multi-chip (see __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    if data * model != len(devices):
        devices = devices[: data * model]
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def data_parallel_mesh(log=print) -> Mesh | None:
    """Mesh for data-parallel inference/scoring: all visible devices on
    the 'data' axis (params replicated, batch rows sharded). None when
    only one device is visible — the caller's single-device path is then
    both simpler and identical in output."""
    if len(jax.devices()) < 2:
        log("note: --data-parallel with one visible device; running "
            "single-device")
        return None
    return make_mesh()


_default_mesh: Mesh | None = None


def get_mesh() -> Mesh:
    """Process-wide default mesh over all visible devices (data-parallel)."""
    global _default_mesh
    if _default_mesh is None or _default_mesh.size != len(jax.devices()):
        _default_mesh = make_mesh()
    return _default_mesh


_pad_warned = False


def shard_batch(arrays: dict, mesh: Mesh) -> dict:
    """Place batch arrays with the leading (batch) axis sharded over 'data'.

    When the row count does not divide the data axis, the batch is padded
    with dummy rows (zeros + row_mask 0 — the input pipeline's own dummy-row
    convention, train/data.py make_device_batch) up to the next multiple, so
    every batch gets real data parallelism. Without this, an indivisible
    batch (e.g. the reference default 100 on 8 devices) would silently
    replicate and train single-device-slow. Dummy rows are loss-exact: the
    archs weight every total/norm/BN statistic by row_mask."""
    global _pad_warned
    n_data = mesh.shape["data"]
    B = arrays["row_mask"].shape[0] if "row_mask" in arrays else None
    if B is not None and B % n_data != 0:
        Bp = ((B + n_data - 1) // n_data) * n_data
        if not _pad_warned:
            _pad_warned = True
            print(f"note: batch rows {B} padded to {Bp} to shard over "
                  f"{n_data} data-parallel devices (pick batch sizes "
                  f"divisible by {n_data} to avoid the pad waste)")
        arrays = {k: (np.pad(v, [(0, Bp - B)] + [(0, 0)] * (v.ndim - 1))
                      if v.shape and v.shape[0] == B else v)
                  for k, v in arrays.items()}
    out = {}
    for k, v in arrays.items():
        if v.shape and v.shape[0] % n_data == 0:
            spec = P("data") if v.ndim == 1 else P("data", *([None] * (v.ndim - 1)))
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params / opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_params(params, mesh: Mesh, lstm_gates: bool = False):
    """Tensor-parallel placement over the 'model' axis.

    Default (head-only TP): the mask head's Linear weight/bias split their
    output dimension across model shards — a clean column-parallel matmul
    whose only collective is outside the recurrence — and the LSTM weights
    stay replicated. This is the profitable TP decomposition for this
    architecture: the recurrence is latency-bound, so sharding it trades
    one matmul's FLOPs for per-scan-step collectives.

    ``lstm_gates=True`` additionally splits the LSTM gate dimension
    (contiguous (i,f,g,o) columns) across shards. Numerically exact (GSPMD
    inserts the collectives; tests/test_multichip.py pins it against single
    device) but measured ~15x slower than dp-only on the virtual mesh —
    hundreds of per-step all-reduce/all-to-all ops inside the scan body
    (tools/measure_tp_overhead.py; docs/performance.md). Kept as an opt-in
    for models large enough that gate matmuls dominate; at the reference's
    13M params use data parallelism.

    With mesh model=1 both degenerate to replication.
    """
    if mesh.shape["model"] == 1:
        return replicate_tree(params, mesh)

    def place(path, x):
        names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        is_head = "lin" in names
        is_lstm = "blstm" in names
        if is_head and x.ndim == 2:
            spec = P(None, "model")
        elif is_head and x.ndim == 1:
            spec = P("model")
        elif lstm_gates and is_lstm and x.ndim == 2:
            spec = P(None, "model")
        elif lstm_gates and is_lstm and x.ndim == 1:
            spec = P("model")
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_params_convtasnet(params, mesh: Mesh):
    """Megatron-style tensor parallelism for the ConvTasNet separator
    (models/convtasnet.py tree). Within each residual block the hidden
    axis H is the sharded dimension: ``expand`` (B->H 1x1) is
    column-parallel, the depthwise conv / PReLU / layer-norm parameters
    live entirely in their own H-shard, and ``res``/``skip`` (H->B 1x1)
    are row-parallel — so GSPMD needs ONE all-reduce per block, at the
    res/skip output, not one per matmul. The mask head (B -> N*S) is
    column-parallel; encoder/decoder/bottleneck stay replicated (at most
    filter_len x n_filters — too small to pay a collective for).

    Numerically exact (tests/test_multichip_convtasnet.py pins dp x tp
    against single-device). POSTURE: like the LSTM archs, production
    time-domain training at 2-9M params is data-parallel — docs/design.md
    "Tensor parallelism" records the measurement-backed rationale — and
    this placement exists so TP is a config flip, not a rewrite, when an
    arch scales past what DP feeds. With mesh model=1: replication.
    """
    if mesh.shape["model"] == 1:
        return replicate_tree(params, mesh)

    def place(path, x):
        names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        spec = P()
        if "blocks" in names:
            if any(n in names for n in ("expand", "dw", "dw_b", "prelu1",
                                        "prelu2", "ln1", "ln2")):
                # H-resident tensors: (B,H) weights / (3,H) depthwise /
                # (H,) gains, biases, slopes — all split on H
                spec = P(None, "model") if x.ndim == 2 else P("model")
            elif any(n in names for n in ("res", "skip")):
                # row-parallel: weight (H,B) splits its input dim; the
                # bias is added after the psum, replicated
                spec = P("model", None) if x.ndim == 2 else P()
        elif "head" in names:  # head_prelu is its own key, stays replicated
            spec = P(None, "model") if x.ndim == 2 else P("model")
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
