"""Checkpointing: full and slim saves (reference utils.py + train.py:252-282).

The reference saves Lightning .ckpt files and post-processes them with
`slim_ckpt` (drop float density grid / cached directions / poses, keep the
inference bitfield).  Here checkpoints are flat npz archives of the pytree
leaves — fast, dependency-free, and directly loadable on any backend.  Same
two modes: full (params + opt state + grid state + step) for resume, slim
(params + occupancy) for inference/GUI.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        key = prefix + jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def _unflatten_into(tree, data: Dict[str, np.ndarray], prefix=""):
    """Rebuild `tree`'s structure with values from `data` (partial update:
    missing keys keep the existing leaf, reference utils.py:21-26).

    Shape mismatches fail loudly: the hash-table geometry (n_levels /
    n_features / log2_hashmap_size) is baked into the parameter shapes, so a
    checkpoint trained with different flags cannot be partially loaded."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for path, leaf in flat:
        key = prefix + jax.tree_util.keystr(path)
        if key in data:
            new = data[key]
            if tuple(np.shape(new)) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"checkpoint leaf {key!r} has shape {np.shape(new)} but "
                    f"the model expects {np.shape(leaf)} — the checkpoint "
                    "was saved with a different model geometry (check "
                    "--n_levels/--n_features/--log2_hashmap_size and "
                    "--scale; they must match the training run)")
            leaves.append(new)
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, *, params, grid_state=None, opt_state=None,
                    pose_params=None, step: int = 0, extra: Optional[dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = _flatten(params, "params")
    if grid_state is not None:
        data.update(_flatten(grid_state, "grid"))
    if opt_state is not None:
        data.update(_flatten(opt_state, "opt"))
    if pose_params is not None:
        data.update(_flatten(pose_params, "pose"))
    data["__step__"] = np.asarray(step)
    if extra:
        for k, v in extra.items():
            data["extra/" + k] = np.asarray(v)
    np.savez(path, **data)


def load_checkpoint(path: str, *, params, grid_state=None, opt_state=None,
                    pose_params=None) -> Tuple[Any, ...]:
    """Partial-update load: templates supply structure, archive supplies
    values where present."""
    with np.load(path, allow_pickle=False) as f:
        data = dict(f)
    out = [_unflatten_into(params, data, "params")]
    if grid_state is not None:
        out.append(_unflatten_into(grid_state, data, "grid"))
    if opt_state is not None:
        out.append(_unflatten_into(opt_state, data, "opt"))
    if pose_params is not None:
        out.append(_unflatten_into(pose_params, data, "pose"))
    out.append(int(data.get("__step__", 0)))
    return tuple(out)


def save_slim_checkpoint(path: str, *, params, grid_state):
    """Inference-only checkpoint: params + uint8 occupancy (the analogue of
    dropping density_grid/directions/poses but keeping the bitfield,
    reference utils.py:29-39)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = _flatten(params, "params")
    data["occ_grid"] = np.asarray(grid_state.occ_grid)
    np.savez(path, **data)


def load_slim_checkpoint(path: str, *, params):
    with np.load(path, allow_pickle=False) as f:
        data = dict(f)
    new_params = _unflatten_into(params, data, "params")
    return new_params, data["occ_grid"]
