#!/usr/bin/env python3
"""Average N checkpoints into one (reference avg_weights.py:69-103).

Works on converted .npz pytrees (our native format) and on PyTorch
checkpoints (Lightning 'state_dict' or raw weight dicts, converted
first).  Accumulation is float64; key sets, shapes, and dtypes must
agree; non-float parameters must be identical across checkpoints.

Usage:
  python avg_weights.py OUT.npz IN1.npz IN2.npz [...]
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flamed_tts_tpu.runtime.pytree_io import (
    flatten_pytree,
    load_pytree_npz,
    save_pytree_npz,
    unflatten_pytree,
)


def load_flat(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        return flatten_pytree(load_pytree_npz(path))
    import torch

    from tools.convert_torch_ckpt import convert_flamed_checkpoint

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return flatten_pytree(convert_flamed_checkpoint(sd))


def ensure_compatible(base: Dict[str, np.ndarray], other: Dict[str, np.ndarray], path: str) -> None:
    if base.keys() != other.keys():
        missing = base.keys() ^ other.keys()
        raise ValueError(f"{path}: key mismatch ({sorted(missing)[:5]} ...)")
    for key in base:
        if base[key].shape != other[key].shape:
            raise ValueError(f"{path}: shape mismatch at {key}")
        if base[key].dtype != other[key].dtype:
            raise ValueError(f"{path}: dtype mismatch at {key}")


def average_checkpoints(paths) -> Dict[str, np.ndarray]:
    flats = [load_flat(p) for p in paths]
    base = flats[0]
    for path, flat in zip(paths[1:], flats[1:]):
        ensure_compatible(base, flat, path)

    out: Dict[str, np.ndarray] = {}
    for key in base:
        if np.issubdtype(base[key].dtype, np.floating):
            acc = np.zeros(base[key].shape, dtype=np.float64)
            for flat in flats:
                acc += flat[key].astype(np.float64)
            out[key] = (acc / len(flats)).astype(base[key].dtype)
        else:
            for flat in flats[1:]:
                if not np.array_equal(base[key], flat[key]):
                    raise ValueError(
                        f"Non-float parameter {key} differs across checkpoints"
                    )
            out[key] = base[key]
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("output")
    parser.add_argument("inputs", nargs="+")
    args = parser.parse_args()
    if len(args.inputs) < 2:
        parser.error("Need at least two checkpoints to average.")
    averaged = average_checkpoints(args.inputs)
    save_pytree_npz(args.output, unflatten_pytree(averaged))
    print(f"Averaged {len(args.inputs)} checkpoints -> {args.output}")


if __name__ == "__main__":
    main()
