"""Device mesh and sharding layout.

The reference is single-GPU (reference: cutorch.setDevice in train.lua);
parallelism here is first-class (SURVEY.md §2c): a 2-axis logical mesh
('data', 'model').  For this workload the model axis is size 1 (512-hidden
LSTMs don't need TP) but every sharding below is written against the named
axes so widening the model axis is a mesh-shape change, not a code change.

Layout of record:
  * params / optimizer state: replicated across the mesh;
  * every batch array: sharded along 'data' on dim 0 (the dialog axis);
  * gradient all-reduce: emitted by XLA from the sharded batch dim, riding
    ICI within the slice (no hand-written collectives — SURVEY.md §5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.tree import tree_path_str


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """('data', 'model') mesh.  data=-1 fills all devices; an explicit
    data*model smaller than the device count takes the first data*model
    devices — the recovery story (SURVEY.md §5) resumes a checkpoint on a
    replacement slice that may be SMALLER than the original mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if data == -1:
        # fill-all must actually fill all: a non-dividing model axis would
        # silently idle len % model chips
        assert len(devices) % model == 0, (
            f"model={model} does not divide the {len(devices)} devices; "
            f"pass explicit data= to train on a sub-slice")
        data = len(devices) // model
    assert data * model <= len(devices), (
        f"mesh {data}x{model} needs {data * model} devices, "
        f"found {len(devices)}")
    if data * model < len(devices):
        # legitimate for recovery on a smaller replacement slice, but loud:
        # a typo'd --mesh_data otherwise trains at a fraction of the machine
        import sys
        print(f"[mesh] NOTE: {data}x{model} mesh uses {data * model} of "
              f"{len(devices)} devices; the rest stay idle", file=sys.stderr)
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Dialog axis (dim 0) over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_pspec(path: str, ndim: int) -> P:
    """Sharding rule for one parameter leaf, by tree path.

    Vocab-dimensioned parameters go on the 'model' axis (the vocab-parallel
    embedding / output-projection layout): the embedding table is sharded by
    row, the gen decoder's output projection by column.  Everything else —
    the 512-hidden LSTM/fusion weights — is replicated: at this model scale
    tensor parallelism costs more in collectives than it saves (SURVEY.md
    §2c), but the rules live here so widening coverage is a rule change,
    not a redesign.  With a size-1 model axis every rule degrades to
    replicated.
    """
    if path.endswith("embed/table") and ndim == 2:
        return P("model", None)
    if path.endswith("out_proj/w") and ndim == 2:
        return P(None, "model")
    if path.endswith("out_proj/b") and ndim == 1:
        return P("model")
    return P()


def tree_shardings(template, mesh: Mesh):
    """Pytree of NamedShardings for a state/params template (abstract or
    concrete); leaves are matched by tree path via param_pspec.

    A dimension whose size is not divisible by its mesh axis (e.g. an odd
    vocab on a 2-wide model axis) degrades to replicated for that leaf:
    jax.device_put/pjit reject uneven shards outright, and padding the
    vocab would leak into checkpoints.  Divisible layouts are unaffected.
    """

    def to_sharding(path, leaf):
        shape = getattr(leaf, "shape", ())
        spec = param_pspec(tree_path_str(path), len(shape))
        fixed = tuple(
            axis if axis is None or shape[i] % mesh.shape[axis] == 0 else None
            for i, axis in enumerate(spec))
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(to_sharding, template)


def shard_batch(batch_dict: dict, mesh: Mesh) -> dict:
    """device_put every batch array with the data-axis sharding.

    A batch whose dialog dimension is not divisible by the data axis
    (e.g. `generate --batch_size 4` on an 8-device mesh) degrades to
    replicated, mirroring tree_shardings' documented policy — device_put
    rejects uneven shards outright, and the eval/generate CLIs must stay
    usable at any batch size.  Divisible (production) layouts are
    unaffected."""
    n = mesh.shape["data"]
    sh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    return {k: jax.device_put(
        v, sh if np.shape(v)[0] % n == 0 else rep)
        for k, v in batch_dict.items()}


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """For a stack of G per-step batches (multi-step dispatch): leading
    group axis replicated (it is scanned over), dialog axis (dim 1) on
    'data'."""
    return NamedSharding(mesh, P(None, "data"))


def shard_batch_stack(batch_dicts: list, mesh: Mesh) -> dict:
    """Stack G host batches along a new leading axis and device_put with
    the stacked sharding — ONE transfer per dispatch group instead of G."""
    sh = stacked_batch_sharding(mesh)
    keys = batch_dicts[0].keys()
    return {k: jax.device_put(np.stack([d[k] for d in batch_dicts]), sh)
            for k in keys}
