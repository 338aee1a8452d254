"""Checkpoint / resume.

The reference saves {opt, flat float weights} per epoch via torch.save and
cannot truly resume (no optimizer state — reference: train.lua checkpoint
block, SURVEY.md §5).  Here a checkpoint is the FULL training state:
params + optimizer moments + step + PRNG key + the serialized Config
(the reference's "opt table inside every checkpoint" design point), written
as an atomic directory (write to tmp, fsync, rename).

Format: one .npz per pytree (params / opt moments), keys are the flattened
tree paths; meta.json carries step, rng key, and config.  No orbax
dependency on the hot path keeps restores trivially portable.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import jax
import numpy as np

from ..config import Config
from .tree import tree_path_str
from ..parallel.optim import OptState
from ..parallel.train_step import TrainState


def _tree_to_dict(tree) -> dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {tree_path_str(path): np.asarray(leaf) for path, leaf in flat}


def _dict_to_tree(template, d: dict[str, np.ndarray]):
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = tree_path_str(path)
        if key not in d:
            raise ValueError(
                f"checkpoint is missing array '{key}' (corrupt file, or a "
                f"checkpoint whose meta.json was edited out from under its "
                f"arrays)")
        arr = d[key]
        # shape/dtype come from the template leaf's ATTRIBUTES — never
        # np.asarray(leaf), which would read the whole template back from
        # the device (twice per leaf, tens of seconds over the tunnel).
        want = tuple(getattr(leaf, "shape", ()) or ())
        if arr.shape != want:
            raise ValueError(
                f"checkpoint array '{key}' has shape {arr.shape}, expected "
                f"{want} from the embedded config — the arrays do not match "
                f"the config stored beside them")
        want_dtype = getattr(leaf, "dtype", None) or np.asarray(leaf).dtype
        leaves.append(np.asarray(arr, dtype=want_dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(directory: str, state: TrainState, cfg: Config,
                    extra: dict | None = None) -> str:
    """Atomic write of checkpoints/<step_N>/ under `directory`."""
    step = int(np.asarray(state.opt.step))
    final = os.path.join(directory, f"step_{step:08d}")
    os.makedirs(directory, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=directory, prefix=".tmp_ckpt_")
    try:
        np.savez(os.path.join(tmp, "params.npz"), **_tree_to_dict(state.params))
        np.savez(os.path.join(tmp, "opt_m.npz"), **_tree_to_dict(state.opt.m))
        np.savez(os.path.join(tmp, "opt_v.npz"), **_tree_to_dict(state.opt.v))
        meta = {
            "step": step,
            "rng": np.asarray(jax.random.key_data(state.rng)).tolist(),
            "config": json.loads(cfg.to_json()),
            "extra": extra or {},
        }
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return final


def latest_checkpoint(directory: str) -> str | None:
    if not os.path.isdir(directory):
        return None
    steps = sorted(d for d in os.listdir(directory) if d.startswith("step_"))
    return os.path.join(directory, steps[-1]) if steps else None


def load_checkpoint(path: str) -> tuple[TrainState, Config, dict]:
    """Rebuild TrainState (reconstructing the model from the embedded
    config, like evaluate.lua rebuilds the net from the saved opt)."""
    from ..parallel.train_step import init_train_state

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    cfg = Config.from_dict(meta["config"])
    template = init_train_state(cfg)

    def load_npz(name):
        with np.load(os.path.join(path, name)) as z:
            return dict(z)

    params = _dict_to_tree(template.params, load_npz("params.npz"))
    m = _dict_to_tree(template.opt.m, load_npz("opt_m.npz"))
    v = _dict_to_tree(template.opt.v, load_npz("opt_v.npz"))
    rng_data = np.asarray(meta["rng"], dtype=np.uint32)
    # key width identifies the PRNG impl (threefry2x32: 2 words; rbg: 4)
    rng = jax.random.wrap_key_data(
        rng_data, impl="threefry2x32" if rng_data.shape[-1] == 2 else "rbg")
    opt = OptState(np.asarray(meta["step"], np.int32), m, v)
    state = TrainState(params, opt, rng)
    return state, cfg, meta.get("extra", {})
