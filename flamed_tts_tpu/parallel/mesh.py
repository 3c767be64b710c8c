"""Device mesh construction.

The reference's only parallelism is Lightning DDP over CUDA devices
(reference train.py:87-97, SURVEY §2.11).  The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis (batch sharding over ICI) and
an optional ``model`` axis (tensor-sharding the denoiser's hidden
dimension).  Gradients reduce via the collectives XLA inserts for the
sharded program — no NCCL/DDP analogue needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data, model) mesh over the available devices.

    Defaults to all devices on the data axis.  ``n_data * n_model`` must
    equal the device count used.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices"
        )
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for input arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
