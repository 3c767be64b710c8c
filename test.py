#!/usr/bin/env python3
"""Smoke test: end-to-end loss + sampling on fabricated tensors, no codec.

Mirrors the reference's test.py contract (reference test.py:2-6): builds
the full Flamed model from the in-repo configs, fabricates a
deterministic dummy training batch (exact 9-tensor contract, shapes and
duration-sum == tgt_len invariant included), runs the loss path and the
sampling path, and prints parameter counts / losses / output shapes.

Usage:
  python test.py [--device cpu|tpu] [--nsteps 4] [--seed 0] [--small]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_cfg(small: bool):
    from flamed_tts_tpu.config import load_default_config

    cfg = load_default_config()
    if small:
        t = cfg["prior_generator"]["transformer"]
        t["encoder_layer"] = 2
        t["decoder_shared_layers"] = 1
        t["decoder_layers"] = [1, 1, 1, 1, 1, 1]
        cfg["prob_generator"]["n_layers"] = 2
    return cfg


def fabricate_dummy_training_batch(rng: np.random.RandomState, cfg):
    """The exact 9-tensor batch contract (reference test.py:87-146)."""
    import jax.numpy as jnp

    b, l, p = 2, 24, 40
    n_q = cfg["prior_generator"]["codec"]["n_quantizers"]
    vocab = cfg["prior_generator"]["codec"]["vocab_size"]
    emb_dim = cfg["prob_generator"]["target_dim"]
    spk_dim = cfg["prob_generator"]["spk_dim"]

    x_len = np.array([l, l - 6], dtype=np.int32)
    phonemes = rng.randint(1, 300, (b, l)).astype(np.int32)
    phone_dur = rng.randint(1, 6, (b, l)).astype(np.int32)
    sil_dur = rng.randint(0, 3, (b, l)).astype(np.int32)
    for i, n in enumerate(x_len):
        phonemes[i, n:] = 0
        phone_dur[i, n:] = 0
        sil_dur[i, n:] = 0
    # invariant: y_len == sum of durations (valid positions)
    y_len = (phone_dur.sum(axis=1) + sil_dur.sum(axis=1)).astype(np.int32)
    lf = int(y_len.max())
    codes = rng.randint(0, vocab, (b, n_q, lf)).astype(np.int32)
    embs = rng.randn(b, lf, emb_dim).astype(np.float32)
    for i, n in enumerate(y_len):
        codes[i, :, n:] = vocab
        embs[i, n:, :] = 0.0
    prompts = rng.randint(0, vocab, (b, n_q, p)).astype(np.int32)
    prompts[:, 1:3, :] = vocab  # content-quantizer masking (dataset.py:430)
    spks = rng.randn(b, spk_dim).astype(np.float32)

    return {
        "phonemes": jnp.asarray(phonemes),
        "x_len": jnp.asarray(x_len),
        "codes": jnp.asarray(codes),
        "y_len": jnp.asarray(y_len),
        "phone_dur": jnp.asarray(phone_dur),
        "sil_dur": jnp.asarray(sil_dur),
        "embs": jnp.asarray(embs),
        "prompts": jnp.asarray(prompts),
        "spks": jnp.asarray(spks),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    parser.add_argument("--nsteps", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--small", action="store_true",
                        help="Shrink layer counts for a fast smoke run.")
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    from flamed_tts_tpu.models.flamed import Flamed
    from flamed_tts_tpu.train.losses import compute_losses

    cfg = build_cfg(args.small)
    t0 = time.time()
    model = Flamed(cfg, rng=jax.random.PRNGKey(args.seed))
    print(f"Model built in {time.time() - t0:.1f}s")
    print(f"Parameter count: {model.num_params() / 1e6:.2f} M")

    rng = np.random.RandomState(args.seed)
    batch = fabricate_dummy_training_batch(rng, cfg)

    print("\n--- loss path ---")
    t0 = time.time()
    losses = jax.jit(
        lambda p, b, k: compute_losses(
            model.prior_module, model.prob_module, p, b, k, train=False
        )
    )(model.params, batch, jax.random.PRNGKey(args.seed))
    losses = {k: float(v) for k, v in losses.items()}
    for key, value in sorted(losses.items()):
        print(f"  {key}: {value:.4f}")
    print(f"  ({time.time() - t0:.1f}s)")
    assert all(np.isfinite(v) for v in losses.values()), "non-finite loss!"

    print("\n--- sampling path (no codec) ---")
    t0 = time.time()
    outputs = model.sample_batch(
        phonemes=np.asarray(batch["phonemes"]),
        src_lens=np.asarray(batch["x_len"]),
        prompts=np.asarray(batch["prompts"]),
        timbres=np.asarray(batch["spks"]),
        nsteps_durgen=args.nsteps,
        nsteps_denoiser=args.nsteps,
        rng=jax.random.PRNGKey(args.seed),
    )
    print(f"  latents: {outputs['latents'].shape}")
    print(f"  prior_embs: {outputs['prior_embs'].shape}")
    print(f"  prior_logits: {outputs['prior_logits'].shape}")
    print(f"  tgt_len: {outputs['tgt_len']}")
    print(f"  ({time.time() - t0:.1f}s)")
    assert np.isfinite(np.asarray(outputs["latents"])).all()
    print("\nSMOKE TEST PASSED")


if __name__ == "__main__":
    main()
