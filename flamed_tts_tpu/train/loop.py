"""Training loop: pjit data-parallel (+ optional TP) with checkpointing.

Replaces the reference's Lightning Trainer (reference train.py:87-104,
flamed_lightning.py) with an explicit JAX loop: bucketed batches, one
compiled step per bucket signature, metrics to JSONL (and wandb when
available), periodic orbax-style .npz checkpoints with top-k retention
on validation loss + save_last (reference train.py:71-77 semantics).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np

from flamed_tts_tpu.runtime.pytree_io import save_pytree_npz
from flamed_tts_tpu.train.step import TrainState, shard_batch


class MetricLogger:
    """JSONL metrics + optional wandb passthrough."""

    def __init__(self, log_dir: str, use_wandb: bool = False, wandb_kwargs=None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._fh = open(self.path, "a", encoding="utf-8")
        self._wandb = None
        if use_wandb:
            try:  # pragma: no cover - wandb not installed here
                import wandb

                wandb.init(**(wandb_kwargs or {}))
                self._wandb = wandb
            except Exception as exc:
                print(f"[train] wandb unavailable ({exc}); JSONL only")

    def log(self, metrics: Dict, step: int) -> None:
        payload = {"step": step, "time": time.time()}
        payload.update(
            {k: float(v) for k, v in metrics.items() if np.ndim(v) == 0}
        )
        self._fh.write(json.dumps(payload) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(payload, step=step)


class CheckpointManager:
    """Top-k (lowest val loss) + last .npz checkpoints."""

    def __init__(self, ckpt_dir: str, top_k: int = 10):
        self.ckpt_dir = ckpt_dir
        self.top_k = top_k
        self.best: List = []  # (val_loss, path)
        os.makedirs(ckpt_dir, exist_ok=True)

    def save_last(self, state: TrainState) -> str:
        path = os.path.join(self.ckpt_dir, "last.npz")
        save_pytree_npz(path, jax.device_get(state.params))
        return path

    def save_full_state(self, state: TrainState) -> str:
        """Full-state checkpoint (params + optimizer moments + step) for
        exact resume, msgpack-serialized (the Lightning-ckpt analogue)."""
        from flax import serialization

        path = os.path.join(self.ckpt_dir, "train_state.msgpack")
        with open(path, "wb") as fout:
            fout.write(serialization.to_bytes(jax.device_get(state)))
        return path

    def load_full_state(self, template: TrainState) -> TrainState:
        from flax import serialization

        path = os.path.join(self.ckpt_dir, "train_state.msgpack")
        with open(path, "rb") as fin:
            return serialization.from_bytes(template, fin.read())

    def save_topk(self, state: TrainState, val_loss: float, step: int) -> Optional[str]:
        path = os.path.join(self.ckpt_dir, f"step{step}-val{val_loss:.4f}.npz")
        save_pytree_npz(path, jax.device_get(state.params))
        self.best.append((val_loss, path))
        self.best.sort(key=lambda item: item[0])
        while len(self.best) > self.top_k:
            _, worst = self.best.pop()
            if os.path.exists(worst):
                os.remove(worst)
        return path


def run_training(
    jitted_step,
    state: TrainState,
    mesh,
    train_batches: Iterator[Dict],
    make_val_batches,
    rng: jax.Array,
    max_steps: int,
    log_every: int = 50,
    val_every: int = 1000,
    logger: Optional[MetricLogger] = None,
    ckpt: Optional[CheckpointManager] = None,
    eval_step=None,
    audio_logger=None,
) -> TrainState:
    step = int(jax.device_get(state.step))
    first_step = True
    t_last = time.time()
    for batch in train_batches:
        if step >= max_steps:
            break
        rng, sub = jax.random.split(rng)
        state, metrics = jitted_step(state, shard_batch(batch, mesh), sub)
        step += 1

        if first_step:
            # Block once: time-to-first-step is the compile wall (the
            # dominant cost on cold caches — docs/PERFORMANCE.md).
            first_step = False
            # A host read, not block_until_ready: the latter returns early
            # through the axon tunnel (CLAUDE.md / memory tpu-env-quirks).
            float(jax.device_get(metrics["total_loss"]))
            msg = f"first step done in {time.time() - t_last:.1f}s (trace+compile+step)"
            print(f"[train] {msg}", flush=True)
            if logger is not None:
                logger.log({"first_step_s": time.time() - t_last}, step)
            t_last = time.time()

        if logger is not None and step % log_every == 0:
            metrics = jax.device_get(metrics)
            metrics["steps_per_sec"] = log_every / max(time.time() - t_last, 1e-9)
            t_last = time.time()
            logger.log(metrics, step)

        if step % val_every == 0:
            if eval_step is not None and make_val_batches is not None:
                losses = []
                for val_batch in make_val_batches():
                    rng, sub = jax.random.split(rng)
                    out = eval_step(state.params, shard_batch(val_batch, mesh), sub)
                    losses.append(float(jax.device_get(out["total_loss"])))
                val_loss = float(np.mean(losses)) if losses else float("nan")
                if logger is not None:
                    logger.log({"total_loss_val": val_loss}, step)
                if ckpt is not None and np.isfinite(val_loss):
                    ckpt.save_topk(state, val_loss, step)
            if ckpt is not None:
                ckpt.save_last(state)
                ckpt.save_full_state(state)
            if audio_logger is not None:
                try:
                    audio_logger(state, step)
                except Exception as exc:  # audio logging must never kill a run
                    print(f"[train] validation audio logging failed: {exc}")
    if ckpt is not None:
        ckpt.save_last(state)
        ckpt.save_full_state(state)
    return state
