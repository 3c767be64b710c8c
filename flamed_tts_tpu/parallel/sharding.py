"""Parameter sharding rules (tensor parallelism over the 'model' axis).

The denoiser (hidden 1024) is the widest block and the RTF-critical one
(SURVEY §2.4); its pointwise Dense pairs follow the classic
column-parallel / row-parallel megatron split so a forward needs a single
reduction per block pair.  The depthwise ConvNeXt conv shards cleanly on
channels (feature_group_count == channels).  Everything else — the prior
transformer at hidden 384 and the small PVA convnets — replicates; at
this scale replicated weights + data parallelism is the right cost model
and matches how XLA overlaps the psum with compute.

With ``n_model == 1`` every rule degenerates to replication, so the same
code path serves pure data parallelism.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-substring, kernel PartitionSpec) — first match wins.
_DENOISER_RULES: Tuple[Tuple[str, P], ...] = (
    # column-parallel producers of hidden-width activations
    ("denoiser/proj_in/kernel", P(None, "model")),
    ("denoiser/cond_embed/kernel", P(None, "model")),
    ("time_embed/mlp_0/kernel", P(None, "model")),
    ("time_embed/mlp_2/kernel", P(None, "model")),
    ("adaLN_modulation/kernel", P(None, "model")),
    ("adaLN_modulation/bias", P("model",)),
    # ConvNeXt: depthwise conv shards on channels (last dim = features)
    ("conv_in/conv_1/kernel", P(None, None, "model")),
    ("conv_in/conv_1/bias", P("model")),
    ("conv_in/ln_1/scale", P("model")),
    ("conv_in/ln_1/bias", P("model")),
    ("conv_in/conv_2/kernel", P("model", None)),
    ("conv_in/conv_3/kernel", P(None, "model")),
    # gated MLP: column then row parallel
    ("mlp_0/kernel", P(None, "model")),
    ("mlp_0/bias", P("model")),
    ("mlp_2/kernel", P("model", None)),
    # per-hidden-channel LayerNorm params
    ("ln_conv/scale", P("model")),
    ("ln_conv/bias", P("model")),
    ("ln_mlp/scale", P("model")),
    ("ln_mlp/bias", P("model")),
    ("time_embed/mlp_0/bias", P("model")),
    ("time_embed/mlp_2/bias", P("model")),
    ("proj_in/bias", P("model")),
    ("cond_embed/bias", P("model")),
)


def _path_str(path) -> str:
    parts = []
    for entry in path:
        key = getattr(entry, "key", None)
        if key is None:
            key = getattr(entry, "idx", None)
        parts.append(str(key))
    return "/".join(parts)


def param_spec(path, leaf) -> P:
    """PartitionSpec for one parameter leaf by tree path."""
    path_s = _path_str(path)
    if "denoiser" in path_s or "time_embed" in path_s:
        for pattern, spec in _DENOISER_RULES:
            if pattern in path_s:
                if len(spec) <= leaf.ndim:
                    return spec
        # final_layer conv_out & friends stay replicated (tiny)
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a parameter pytree onto the mesh per the rules."""
    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, param_spec(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """The NamedSharding pytree (for jit in_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)), params
    )
