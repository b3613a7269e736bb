"""Device mesh and sharding: the framework's distributed-execution story.

The reference's only multi-worker compute is file-sharded SGE array jobs,
and training is strictly single-GPU (SURVEY.md §2 parallelism table). The
TPU-native replacement is a ``jax.sharding.Mesh`` with two axes:

- ``data``:  batch sharding for data-parallel training. Batches are placed
  with NamedSharding(P('data')) on the leading axis; parameters are
  replicated. Under jit, XLA derives the gradient all-reduce (psum over
  ICI) from these annotations — no hand-written collectives.
- ``model``: tensor-parallel axis, unused (size 1) at this model scale
  (~9M params) but plumbed so TP is a mesh-reshape away: the mask head's
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


_default_mesh: Mesh | None = None


def get_mesh() -> Mesh:
    """Process-wide default mesh over all visible devices (data-parallel)."""
    global _default_mesh
    if _default_mesh is None or _default_mesh.size != len(jax.devices()):
        _default_mesh = make_mesh()
    return _default_mesh


def shard_batch(arrays: dict, mesh: Mesh) -> dict:
    """Place batch arrays with the leading (batch) axis sharded over 'data'.

    Rows must divide evenly — the input pipeline pads every batch to the
    full static batch size, so callers choose batch_size % mesh_data == 0.
    """
    n_data = mesh.shape["data"]
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


def shard_params(params, mesh: Mesh):
    """Tensor-parallel placement: output-dim sharding over 'model' for the
    large matmul weights, replication for everything else.

    With mesh model=1 this degenerates to replication; with model>1 the
    LSTM input/hidden projections and the mask head split their gate/output
    columns across chips and XLA inserts the activation all-gathers.
    """
    if mesh.shape["model"] == 1:
        return replicate_tree(params, mesh)

    def place(path, x):
        names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if x.ndim == 2 and any(n in ("w_ih", "w_hh", "w") for n in names):
            spec = P(None, "model")
        elif x.ndim == 1 and any(n in ("b",) for n in names):
            spec = P("model")
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
