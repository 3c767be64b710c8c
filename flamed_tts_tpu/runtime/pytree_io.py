"""Flat .npz serialization for nested param pytrees (dicts/lists of arrays).

Keys are '/'-joined paths; list indices become numeric components.  This
keeps converted checkpoints dependency-free (numpy only) and loadable
without torch or orbax.
"""

from __future__ import annotations

import io
import os
from typing import Any, Dict

import numpy as np


def flatten_pytree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for key, value in tree.items():
            path = f"{prefix}/{key}" if prefix else str(key)
            out.update(flatten_pytree(value, path))
    elif isinstance(tree, (list, tuple)):
        for idx, value in enumerate(tree):
            path = f"{prefix}/{idx}" if prefix else str(idx)
            out.update(flatten_pytree(value, path))
    else:
        out[prefix] = np.asarray(tree)
    return out


def unflatten_pytree(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def listify(node: Any) -> Any:
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_pytree_npz(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = flatten_pytree(tree)
    # np.savez mangles '/' fine; compress to keep codec ckpts small.
    np.savez_compressed(path, **flat)


def load_pytree_npz(path: str) -> Any:
    with np.load(path) as data:
        flat = {key: data[key] for key in data.files}
    return unflatten_pytree(flat)


def pytree_num_params(tree: Any) -> int:
    # Shape metadata only — flatten_pytree would device_get every leaf
    # (~25 ms of tunnel round trip each on this platform).
    import jax

    return int(sum(np.prod(np.shape(l)) for l in jax.tree.leaves(tree)))
