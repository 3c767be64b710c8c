"""Optax training step: AdamW + warmup-cosine, pjit over the device mesh.

Matches the reference's optimizer operating point (configs/optimizer.yaml,
flamed_lightning.py:31-42): AdamW lr 1e-4, betas (0.9, 0.98), eps 1e-9,
weight decay 1e-4, linear warmup 5k then cosine to 0 over 500k steps.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flamed_tts_tpu.train.losses import compute_losses


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def warmup_cosine_schedule(
    lr: float, warmup_steps: int, max_steps: int
) -> optax.Schedule:
    """transformers.get_cosine_schedule_with_warmup equivalent."""
    import numpy as np

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(1.0, max_steps - warmup_steps)
        cosine = 0.5 * (1.0 + jnp.cos(np.pi * jnp.clip(progress, 0.0, 1.0)))
        return lr * jnp.where(step < warmup_steps, warm, cosine)

    return schedule


def make_optimizer(optimizer_cfg) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    lr = float(optimizer_cfg["lr"])
    betas = optimizer_cfg["betas"]
    schedule = warmup_cosine_schedule(
        lr, int(optimizer_cfg["warmup_steps"]), int(optimizer_cfg["max_steps"])
    )
    tx = optax.adamw(
        learning_rate=schedule,
        b1=float(betas[0]),
        b2=float(betas[1]),
        eps=float(optimizer_cfg["eps"]),
        weight_decay=float(optimizer_cfg["weight_decay"]),
    )
    return tx, schedule


def make_train_step(
    prior_module,
    prob_module,
    tx: optax.GradientTransformation,
    sigma_min_pva: float = 1e-4,
    sigma_min_prob: float = 1e-6,
    loss_norm: str = "masked",
) -> Callable:
    """The un-jitted train step (state, batch, rng) -> (state, metrics)."""

    def loss_fn(params, batch, rng):
        losses = compute_losses(
            prior_module, prob_module, params, batch, rng,
            sigma_min_pva=sigma_min_pva, sigma_min_prob=sigma_min_prob,
            train=True, loss_norm=loss_norm,
        )
        return losses["total_loss"], losses

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))


def _leaf_sharding(mesh: Mesh, path, leaf) -> NamedSharding:
    from flamed_tts_tpu.parallel.sharding import param_spec

    if not hasattr(leaf, "ndim") or leaf.ndim == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, param_spec(path, leaf))


def place_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the state on the mesh: params (and the Adam moments, which
    mirror the param tree) per the TP rules; everything else replicated."""
    params_treedef = jax.tree_util.tree_structure(state.params)

    def place_params_like(tree):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: jax.device_put(x, _leaf_sharding(mesh, p, x)), tree
        )

    def place_opt(node):
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*[place_opt(x) for x in node])
        if isinstance(node, (tuple, list)):
            return type(node)(place_opt(x) for x in node)
        if jax.tree_util.tree_structure(node) == params_treedef:
            return place_params_like(node)
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), node
        )

    return TrainState(
        jax.device_put(state.step, NamedSharding(mesh, P())),
        place_params_like(state.params),
        place_opt(state.opt_state),
    )


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Shard every batch array on the 'data' (batch) axis."""
    data_sh = NamedSharding(mesh, P("data"))
    return {
        k: jax.device_put(jnp.asarray(v), data_sh) for k, v in batch.items()
    }


def jit_train_step_on_mesh(
    train_step: Callable,
    state: TrainState,
    mesh: Mesh,
) -> Tuple[Callable, TrainState]:
    """Returns (jitted step, mesh-placed state).

    Input shardings are committed on the arrays themselves
    (place_train_state / shard_batch); jit propagates them, and XLA
    inserts the data-axis gradient reductions and model-axis TP
    collectives from the sharding annotations alone.
    """
    sharded_state = place_train_state(state, mesh)
    jitted = jax.jit(train_step, donate_argnums=(0,))
    return jitted, sharded_state
