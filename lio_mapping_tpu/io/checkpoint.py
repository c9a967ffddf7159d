"""Checkpoint / resume for the LIO pipeline (net-new vs. the reference).

The reference has no state persistence (SURVEY §5: ``ClearState``
reinitializes in memory, map export is offline-only). Here the full device
state — window arrays, preintegrations, factored marginalization prior,
extrinsic, gravity, plus the active map stores — serializes to a single
npz; the unbounded host map archive saves separately via
native.GlobalVoxelMap.save_pcd.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree, prefix: str, out: Dict[str, Any]):
    leaves, treedef = jax.tree.flatten(tree)
    out[f"{prefix}.__treedef__"] = str(treedef)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}.{i}"] = np.asarray(leaf)


def save_state(path: str, **trees):
    """Save named pytrees (e.g. est_state=..., odom_state=...) to npz."""
    out: Dict[str, Any] = {}
    for name, tree in trees.items():
        _flatten(tree, name, out)
    np.savez_compressed(path, **out)


def load_state(path: str, **templates):
    """Load pytrees saved by ``save_state``; ``templates`` provide structure
    (e.g. est_state=EST.init_state(cfg)). Returns dict name -> pytree."""
    data = np.load(path, allow_pickle=False)
    result = {}
    for name, template in templates.items():
        leaves, treedef = jax.tree.flatten(template)
        new_leaves = []
        for i, leaf in enumerate(leaves):
            arr = data[f"{name}.{i}"]
            # leaf.dtype, NOT np.asarray(leaf).dtype: the template leaves
            # are device arrays, and np.asarray would read each one back —
            # a single D2H permanently degrades the tunnel's dispatch path,
            # so resume must stay strictly H2D-only.
            new_leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
        result[name] = jax.tree.unflatten(treedef, new_leaves)
    return result
