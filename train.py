#!/usr/bin/env python3
"""Training CLI: compose the five configs, build Flamed, train with pjit.

Mirrors the reference's train.py surface (reference train.py:37-104):
loads prior/prob/codec/optimizer/data YAMLs, saves the merged config.yaml
next to the experiment (the file the synthesis CLI consumes), then runs
the data-parallel (+ optional tensor-parallel) training loop.

Usage:
  python train.py --config-dir configs --exp-dir exp/run1 \
      [--devices data,model e.g. 4,1] [--max-steps N] [--resume ckpt.npz]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    # kill -USR1 <pid> dumps all thread stacks (long first-compile runs on
    # the relay are indistinguishable from hangs without this).
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1, all_threads=True)
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-dir", type=str, default="configs")
    parser.add_argument("--exp-dir", type=str, required=True)
    parser.add_argument("--devices", type=str, default=None,
                        help="data,model mesh shape (default: all devices data-parallel)")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--resume", type=str, default=None,
                        help="Converted .npz params to resume from (weights only).")
    parser.add_argument("--resume-full", action="store_true",
                        help="Resume params+optimizer+step from exp_dir/checkpoints/train_state.msgpack.")
    parser.add_argument("--val-every", type=int, default=1000)
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--codec-dir", type=str, default=None,
                        help="Converted codec ckpts for validation audio logging ('random' ok).")
    parser.add_argument("--audio-log-after", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--loss-norm", choices=["masked", "reference"],
                        default="masked",
                        help="Loss normalization: valid-position means "
                             "(default) or the reference's padded-buffer "
                             "means (comparable to reference loss curves).")
    args = parser.parse_args()

    import jax

    from flamed_tts_tpu.config import compose_training_config, save_yaml
    from flamed_tts_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from flamed_tts_tpu.data.dataset import (
        BucketedCollator,
        PrecomputedDataset,
        TextCodesDataset,
        batch_iterator,
    )
    from flamed_tts_tpu.models.flamed import Flamed
    from flamed_tts_tpu.parallel.mesh import make_mesh
    from flamed_tts_tpu.runtime.pytree_io import load_pytree_npz
    from flamed_tts_tpu.train.loop import CheckpointManager, MetricLogger, run_training
    from flamed_tts_tpu.train.losses import compute_losses
    from flamed_tts_tpu.train.step import (
        init_train_state,
        jit_train_step_on_mesh,
        make_optimizer,
        make_train_step,
        shard_batch,
    )

    d = args.config_dir
    cfg = compose_training_config(
        os.path.join(d, "prior.yaml"), os.path.join(d, "prob.yaml"),
        os.path.join(d, "codec.yaml"), os.path.join(d, "optimizer.yaml"),
        os.path.join(d, "data.yaml"),
    )
    os.makedirs(args.exp_dir, exist_ok=True)
    save_yaml(cfg, os.path.join(args.exp_dir, "config.yaml"))

    dataset_cfg = cfg["dataset_cfg"]
    optimizer_cfg = cfg["optimizer_cfg"]
    batch_size = args.batch_size or int(dataset_cfg["batch_size"])
    max_steps = args.max_steps or int(optimizer_cfg["max_steps"])

    # --- data ---
    common = dict(
        data_root=dataset_cfg["data_root"],
        dur_min=float(dataset_cfg["dur_min"]),
        dur_max=float(dataset_cfg["dur_max"]),
        n_words_min=int(dataset_cfg["n_words_min"]),
        seed=dataset_cfg.get("seed"),
    )
    if dataset_cfg.get("use_precomputed", False):
        trainset = PrecomputedDataset(manifest=dataset_cfg["train_manifest"], **common)
        validset = PrecomputedDataset(manifest=dataset_cfg["valid_manifest"], **common)
    else:
        tc = dict(
            common,
            cleaners=dataset_cfg["cleaners"],
            sampling_rate=int(dataset_cfg["sampling_rate"]),
            down_factors=dataset_cfg["down_factors"],
            sil_phones=dataset_cfg.get("sil_phones"),
        )
        trainset = TextCodesDataset(manifest=dataset_cfg["train_manifest"], **tc)
        validset = TextCodesDataset(manifest=dataset_cfg["valid_manifest"], **tc)

    sr = int(dataset_cfg["sampling_rate"])
    import numpy as np

    prompt_max_len = int(
        float(dataset_cfg["prompt_dur_max"]) * sr // np.prod(dataset_cfg["down_factors"])
    )
    collator = BucketedCollator(
        vocab_size=int(dataset_cfg["vocab_size"]),
        prompt_max_len=prompt_max_len,
        prompt_reduced_factor=float(dataset_cfg["prompt_reduced_factor"]),
        phoneme_buckets=dataset_cfg.get("phoneme_buckets", (64, 128, 192, 256)),
        frame_buckets=dataset_cfg.get("frame_buckets", (256, 512, 768, 1024, 1408)),
        # Static prompt shapes: without these, every distinct batch-min
        # crop length is a fresh train-step compile (docs/TRAINING.md).
        prompt_buckets=dataset_cfg.get("prompt_buckets"),
        seed=args.seed,
    )

    # --- model + mesh ---
    model = Flamed(cfg, rng=jax.random.PRNGKey(args.seed))
    if args.resume:
        model.params = load_pytree_npz(args.resume)
        print(f"Resumed params from {args.resume}")
    print(f"Parameters: {model.num_params() / 1e6:.2f} M")

    if args.devices:
        n_data, n_model = (int(x) for x in args.devices.split(","))
    else:
        n_data, n_model = len(jax.devices()), 1
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    print(f"Mesh: data={n_data} model={n_model} on {jax.devices()}")

    tx, _ = make_optimizer(optimizer_cfg)
    train_step = make_train_step(model.prior_module, model.prob_module, tx,
                                 loss_norm=args.loss_norm)
    state = init_train_state(model.params, tx)

    logger = MetricLogger(args.exp_dir, use_wandb=args.wandb,
                          wandb_kwargs={"project": "flamed-tts-tpu"})
    ckpt = CheckpointManager(os.path.join(args.exp_dir, "checkpoints"))

    # Validation audio logging (reference flamed_lightning.py:151-188
    # logs GT + synthesized audio to wandb once global_step >= 1000; we
    # write WAVs under exp_dir/val_audio and require converted codec
    # checkpoints to be present — skipped otherwise).
    audio_logger = None
    if args.codec_dir:
        try:
            from flamed_tts_tpu.models.codec_wrapper import FaCodec
            from flamed_tts_tpu.utils.audio import save_wav

            codec = (FaCodec.random_init(jax.random.PRNGKey(0))
                     if args.codec_dir == "random"
                     else FaCodec.from_pretrained(cfg["codec_cfg"], ckpt_dir=args.codec_dir))
            val_sample_cache = []

            def audio_logger(state, step):
                if step < args.audio_log_after:
                    return
                if not val_sample_cache:
                    val_sample_cache.append(next(make_val_batches(), None))
                val_sample = val_sample_cache[0]
                if val_sample is None:
                    return
                model.params = jax.device_get(state.params)
                out = model.sample_batch(
                    phonemes=val_sample["phonemes"][:1],
                    src_lens=val_sample["x_len"][:1],
                    prompts=val_sample["prompts"][:1],
                    timbres=val_sample["spks"][:1],
                    codec=codec, rng=jax.random.PRNGKey(step),
                    nsteps_durgen=16, nsteps_denoiser=32,
                )
                n = int(out["tgt_len"][0]) * codec.hop
                save_wav(os.path.join(args.exp_dir, "val_audio", f"step{step}_synth.wav"),
                         out["wav"][0, :n, 0])
                import jax.numpy as jnp
                m = int(val_sample["y_len"][0])
                gt = codec.decode(jnp.asarray(val_sample["embs"][:1, :m]),
                                  jnp.asarray(val_sample["spks"][:1]))
                save_wav(os.path.join(args.exp_dir, "val_audio", f"step{step}_gt.wav"),
                         jax.device_get(gt)[0, :, 0])
        except FileNotFoundError as exc:
            print(f"[train] no codec checkpoints; audio logging disabled ({exc})")

    def epochs():
        epoch = 0
        while True:
            yield from batch_iterator(
                trainset, collator, batch_size, shuffle=True,
                seed=args.seed + epoch,
            )
            epoch += 1

    def make_val_batches():
        # drop_last: a partial final val batch would be a SECOND
        # forward-compile signature (batch-dim change); validation loss
        # over the dropped remainder is not worth a full-size compile.
        return batch_iterator(
            validset, collator, batch_size, shuffle=False, drop_last=True
        )

    eval_fn = jax.jit(
        lambda params, batch, rng: compute_losses(
            model.prior_module, model.prob_module, params, batch, rng,
            train=False, loss_norm=args.loss_norm,
        )
    )

    if args.resume_full:
        state = ckpt.load_full_state(state)
        print(f"Resumed full train state at step {int(state.step)}")

    with mesh:
        jitted, state = jit_train_step_on_mesh(train_step, state, mesh)
        state = run_training(
            jitted, state, mesh,
            train_batches=epochs(),
            make_val_batches=make_val_batches,
            rng=jax.random.PRNGKey(args.seed),
            max_steps=max_steps,
            log_every=args.log_every,
            val_every=args.val_every,
            logger=logger,
            ckpt=ckpt,
            eval_step=eval_fn,
            audio_logger=audio_logger,
        )
    print(f"Training finished at step {int(jax.device_get(state.step))}")


if __name__ == "__main__":
    main()
