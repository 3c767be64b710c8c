#!/usr/bin/env python3
"""Train the FaCodec analysis-synthesis stack on the fabricated corpus.

The reference uses the *pretrained* NaturalSpeech3 FaCodec release
(configs/codec.yaml ckpt_repo) whose weights are not available in this
offline environment, so every in-repo quality loop so far ran on a
random-weight codec: analysis codes of real audio were near-random
(prior CE unlearnable, docs/TRAINING.md) and the decoder output carried
no phone structure (WER-on-synth meaningless).  This tool closes that
gap by fitting the SAME architecture (models/facodec/{encoder,decoder}.py,
reference facodec.py:136-661) to the fabricated corpus:

* reconstruction: waveform L1 + two-scale log-mel L1 through the full
  encoder -> RVQ (training path, straight-through + commit/codebook
  losses, extras.py::analyze_train) -> timbre-conditioned synthesis;
* phone CE on the content-group quantized sum (the reference trains the
  codec with exactly such a phone predictor on the content branch,
  facodec.py:442-466) using the corpus's exact frame alignments;
* speaker CE on the pooled timbre embedding (reference: adversarial +
  predictive speaker probes) so the timbre encoder becomes a real
  speaker embedder.

Speakers listed in --holdout-speakers are excluded from ALL training
(reconstruction included): stage-2 zero-shot prompts then come from
voices the codec never saw.

Checkpoints are written with the converted-release filenames
(ns3_facodec_{encoder,decoder}.npz) so every downstream tool accepts
``--codec-dir <out_dir>`` unchanged.

Usage:
  python tools/train_codec.py --corpus _work/corpus_r5 \
      --out-dir _work/codec_r5 --steps 4000 [--device tpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# The fused Pallas inference kernels define no VJP; training uses the
# numerically-identical differentiable XLA chain (ops/resample.py).
os.environ["FLAMED_NO_PALLAS"] = "1"

SR = 16000
HOP = 200
FPS = SR // HOP


def load_corpus(corpus_dir: str, holdout: set):
    """-> (wavs [list of float32], frame_labels [list of int32], spk_ids,
    n_speakers, holdout_utts).  Labels use the asr.py base-phone
    inventory (40 classes incl. silence)."""
    from flamed_tts_tpu import asr
    from flamed_tts_tpu.utils.audio import load_wav
    from flamed_tts_tpu.utils.textgrid import get_tier

    spk_of = {}
    with open(os.path.join(corpus_dir, "speakers.txt"), encoding="utf-8") as fin:
        for line in fin:
            if "|" in line:
                stem, s = line.strip().split("|", 1)
                spk_of[stem] = s
    train_speakers = sorted(set(spk_of.values()) - holdout)
    spk_ids = {s: i for i, s in enumerate(train_speakers)}

    wavs, labels, spks = [], [], []
    n_held = 0
    with open(os.path.join(corpus_dir, "fab_manifest.txt"), encoding="utf-8") as fin:
        for line in fin:
            parts = line.strip().split("|")
            if len(parts) < 3:
                continue
            stem = os.path.splitext(os.path.basename(parts[0]))[0]
            spk = spk_of.get(stem)
            if spk in holdout:
                n_held += 1
                continue
            wav = load_wav(parts[0])
            n_frames = len(wav) // HOP
            lab = np.zeros(n_frames, np.int32)
            for iv in get_tier(parts[1], "phones"):
                a = int(round(iv.start_time * FPS))
                b = min(int(round(iv.end_time * FPS)), n_frames)
                lab[a:b] = asr.phone_label(iv.text)
            wavs.append(wav[: n_frames * HOP].astype(np.float32))
            labels.append(lab)
            spks.append(spk_ids[spk])
    return wavs, labels, np.asarray(spks, np.int32), len(train_speakers), n_held


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--corpus", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--steps", type=int, default=4000)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--crop-frames", type=int, default=160,
                        help="Training crop length in code frames (static shape).")
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--save-every", type=int, default=1000)
    parser.add_argument("--quantizer-dropout", type=float, default=0.25)
    parser.add_argument("--revive-every", type=int, default=50,
                        help="Dead-code revival interval (steps).")
    parser.add_argument("--bypass-vq", action="store_true",
                        help="Diagnostic: decoder reconstructs from raw "
                             "latents (no quantization bottleneck).")
    parser.add_argument("--holdout-speakers", default="",
                        help="Comma-separated speaker ids (e.g. spk020,spk021) "
                             "excluded from all codec training.")
    parser.add_argument("--w-mel", type=float, default=1.0)
    parser.add_argument("--w-wav", type=float, default=10.0)
    parser.add_argument("--w-commit", type=float, default=1.0)
    parser.add_argument("--w-phone", type=float, default=2.0)
    parser.add_argument("--w-spk", type=float, default=1.0)
    parser.add_argument("--w-latreg", type=float, default=1.0,
                        help="latent log-RMS^2 scale pin (the codec is "
                             "scale-invariant in the latents; see loss_fn)")
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from flamed_tts_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from flamed_tts_tpu import asr
    from flamed_tts_tpu.models.facodec.decoder import init_decoder_params, synthesize
    from flamed_tts_tpu.models.facodec.encoder import encoder_forward, init_encoder_params
    from flamed_tts_tpu.models.facodec.extras import analyze_train, whitening_fold
    from flamed_tts_tpu.ops.melspec import mel_spectrogram
    from flamed_tts_tpu.runtime.pytree_io import pytree_num_params, save_pytree_npz

    holdout = set(s for s in args.holdout_speakers.split(",") if s)
    t0 = time.time()
    wavs, labels, spks, n_speakers, n_held = load_corpus(args.corpus, holdout)
    total_s = sum(len(w) for w in wavs) / SR
    print(f"corpus: {len(wavs)} utterances ({total_s / 60:.1f} min), "
          f"{n_speakers} train speakers, {n_held} held-out utts excluded "
          f"({time.time() - t0:.0f}s)", flush=True)

    crop_t = args.crop_frames * HOP
    rng_np = np.random.RandomState(args.seed)

    def make_batch():
        wav_b = np.zeros((args.batch, crop_t, 1), np.float32)
        lab_b = np.zeros((args.batch, args.crop_frames), np.int32)
        spk_b = np.zeros((args.batch,), np.int32)
        for i in range(args.batch):
            u = rng_np.randint(len(wavs))
            w, l = wavs[u], labels[u]
            if len(l) > args.crop_frames:
                f0 = rng_np.randint(len(l) - args.crop_frames)
            else:
                f0 = 0
            seg_l = l[f0 : f0 + args.crop_frames]
            seg_w = w[f0 * HOP : (f0 + args.crop_frames) * HOP]
            wav_b[i, : len(seg_w), 0] = seg_w
            lab_b[i, : len(seg_l)] = seg_l
            spk_b[i] = spks[u]
        return wav_b, lab_b, spk_b

    # --- params ---
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(args.seed), 4)
    enc_p = jax.jit(init_encoder_params)(k1)
    dec_p = jax.jit(init_decoder_params)(k2)
    heads = {
        "phone_w": (jax.random.normal(k3, (256, asr.N_CLASSES)) * 0.05).astype(jnp.float32),
        "phone_b": jnp.zeros((asr.N_CLASSES,), jnp.float32),
        "spk_w": (jax.random.normal(k4, (256, n_speakers)) * 0.05).astype(jnp.float32),
        "spk_b": jnp.zeros((n_speakers,), jnp.float32),
    }
    params = {"enc": enc_p, "dec": dec_p, "heads": heads}
    print(f"codec params: {pytree_num_params(params) / 1e6:.1f} M", flush=True)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, max(min(300, args.steps // 10), 1), args.steps,
        end_value=args.lr * 0.05,
    )
    # No weight decay: shrinking codebooks/Snake log-scales toward zero
    # distorts the VQ geometry (normalized nearest-neighbor) for no
    # regularization benefit at this corpus size.  apply_if_finite: one
    # transient inf batch otherwise NaNs the params permanently (observed
    # at step ~1500; clip_by_global_norm propagates nan to every leaf).
    # NEVER let apply_if_finite "give up and apply" (that is how a run of
    # non-finite grads poisoned the params at step 1700 exactly
    # 50 steps after onset); instead the loop below watches the skip
    # counter and aborts with params still finite + saved.
    tx = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched)),
        max_consecutive_errors=10 ** 9,
    )
    opt_state = tx.init(params)

    def loss_fn(p, wav, lab, spk, rng):
        latents = encoder_forward(p["enc"], wav)          # (B, Tf, 256)
        q_sum, codes, commit, buf, timbre = analyze_train(
            p["dec"], latents, rng, quantizer_dropout=args.quantizer_dropout,
            normalized_losses=True,  # bounded on the sphere (see fvq_train)
            center=True,             # batch-stat whitening, folded at save
        )
        if args.bypass_vq:
            q_sum = latents
            buf = [latents, latents, latents]
        recon = synthesize(p["dec"], q_sum, timbre)        # (B, T, 1)

        wav_l1 = jnp.abs(recon - wav).mean()
        mel_t = mel_spectrogram(wav[:, :, 0])
        mel_r = mel_spectrogram(recon[:, :, 0])
        mel_l1 = jnp.abs(mel_r - mel_t).mean()
        mel_t2 = mel_spectrogram(wav[:, :, 0], n_fft=256, num_mels=40,
                                 hop_size=50, win_size=200)
        mel_r2 = mel_spectrogram(recon[:, :, 0], n_fft=256, num_mels=40,
                                 hop_size=50, win_size=200)
        mel_l1 = mel_l1 + jnp.abs(mel_r2 - mel_t2).mean()

        # Scale-invariant CE heads: raw logits over straight-through
        # features let CE grow z_e and the head weights jointly without
        # bound (observed: z_e overflow + code collapse along the shared
        # gradient direction).  Normalized features + fixed logit scale
        # remove the incentive entirely; 0.05 label smoothing caps the
        # optimum.
        def _norm(v):
            return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)

        tf = buf[1].shape[1]
        phone_logits = 8.0 * (_norm(buf[1]) @ _norm(p["heads"]["phone_w"].T).T)
        logp = jax.nn.log_softmax(phone_logits, axis=-1)
        onehot_p = jax.nn.one_hot(lab[:, :tf], asr.N_CLASSES)
        phone_ce = -((0.95 * onehot_p + 0.05 / asr.N_CLASSES) * logp).sum(-1).mean()

        spk_logits = 8.0 * (_norm(timbre) @ _norm(p["heads"]["spk_w"].T).T)
        slogp = jax.nn.log_softmax(spk_logits, axis=-1)
        onehot_s = jax.nn.one_hot(spk, slogp.shape[-1])
        spk_ce = -((0.95 * onehot_s + 0.05 / slogp.shape[-1]) * slogp).sum(-1).mean()

        commit_loss = commit.sum()
        # Latent scale pin: synthesize() layer-norms the latents and the
        # VQ whitens them, so the system is scale-INVARIANT in `latents`
        # and nothing opposes exponential activation growth (observed:
        # RMS 1e13 by step 1000, inf weight grads by 1650 — the loss
        # stays finite while the backward overflows).  log-RMS^2 pins
        # the scale to O(1) with bounded gradients and zero effect on
        # what the model can express.
        lat_rms = jnp.sqrt(jnp.mean(latents ** 2) + 1e-12)
        lat_reg = jnp.log(lat_rms) ** 2
        total = (args.w_mel * mel_l1 + args.w_wav * wav_l1
                 + args.w_commit * commit_loss + args.w_phone * phone_ce
                 + args.w_spk * spk_ce + args.w_latreg * lat_reg)
        # code-usage diagnostics: distinct codes per stream this batch
        usage = jnp.stack([
            (jnp.zeros((1024,)).at[codes[i].reshape(-1)].add(1.0) > 0).sum()
            for i in range(codes.shape[0])
        ])
        metrics = {
            "mel_l1": mel_l1, "wav_l1": wav_l1, "commit": commit_loss,
            "phone_ce": phone_ce, "spk_ce": spk_ce, "total": total,
            "lat_rms": lat_rms,
            "phone_acc": (jnp.argmax(phone_logits, -1) == lab[:, :tf]).mean(),
            "spk_acc": (jnp.argmax(spk_logits, -1) == spk).mean(),
            "code_usage": usage,
        }
        return total, metrics

    @jax.jit
    def train_step(p, opt_state, wav, lab, spk, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, wav, lab, spk, rng
        )
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, metrics

    @jax.jit
    def layer_z_e(p, wav):
        """Per-FVQ-layer pre-quantization projections z_e (6, B*Tf, 8) +
        the codes they select — the pool dead-code revival samples from.
        Mirrors the RVQ group structure of extras.py::analyze_train."""
        from flamed_tts_tpu.models.facodec.extras import _nearest, _whiten_sg
        from flamed_tts_tpu.models.facodec.quantize import _linear, fvq_encode

        latents = encoder_forward(p["enc"], wav)
        zs, cs = [], []
        buf = []
        x = latents
        for gi in range(3):
            residual = x if gi < 2 else (x - buf[0] - buf[1])
            g_sum = 0.0
            for layer in p["dec"]["quantizers"][gi]:
                z_e = _whiten_sg(_linear(residual, layer["in_proj"]))
                code, _ = _nearest(z_e, layer["codebook"])
                zs.append(z_e.reshape(-1, z_e.shape[-1]))
                cs.append(code.reshape(-1))
                q = _linear(jnp.take(layer["codebook"], code, axis=0),
                            layer["out_proj"])
                residual = residual - q
                g_sum = g_sum + q
            buf.append(g_sum)
        return jnp.stack(zs), jnp.stack(cs)

    def revive_dead_codes(p, wav_b, rng_np):
        """Reassign codebook rows unused on a probe batch to random z_e
        samples (standard VQ-VAE dead-code restart; the normalized
        nearest-neighbor makes collapse otherwise absorbing)."""
        zs, cs = jax.device_get(layer_z_e(p, jnp.asarray(wav_b)))
        if not np.isfinite(zs).all():
            print("  [revive] non-finite z_e pool; skipping this revival",
                  flush=True)
            return [0] * 6
        layers = [l for g in p["dec"]["quantizers"] for l in g]
        n_revived = []
        for li, layer in enumerate(layers):
            used = np.zeros(layer["codebook"].shape[0], bool)
            used[cs[li]] = True
            dead = np.where(~used)[0]
            if len(dead) == 0:
                n_revived.append(0)
                continue
            pool = zs[li]
            pick = pool[rng_np.randint(len(pool), size=len(dead))]
            # match the live rows' scale so revived codes compete
            live_norm = float(np.linalg.norm(
                np.asarray(layer["codebook"])[used], axis=-1).mean()) if used.any() else 1.0
            pick_n = pick / (np.linalg.norm(pick, axis=-1, keepdims=True) + 1e-9)
            cb = np.asarray(layer["codebook"]).copy()
            cb[dead] = pick_n * live_norm + 0.01 * rng_np.randn(len(dead), cb.shape[1])
            layer["codebook"] = jnp.asarray(cb)
            n_revived.append(len(dead))
        return n_revived

    def init_vq_from_data(p, n_probe: int = 4):
        """Data-dependent VQ init: center each layer's in_proj bias and
        seed its codebook from real z_e samples, sequentially through
        the RVQ groups.  At random init the encoder latents share one
        dominant direction, so every frame selects the same code and
        straight-through training cannot diversify a collapsed codebook;
        centering + data seeding makes the full codebook live from step
        one (the pretrained reference release had its own data history)."""
        enc_jit = jax.jit(lambda ep, w: encoder_forward(ep, w))
        lat = np.concatenate([
            np.asarray(jax.device_get(enc_jit(p["enc"], jnp.asarray(make_batch()[0]))))
            for _ in range(n_probe)
        ])  # (N, Tf, 256)
        x = lat.reshape(-1, lat.shape[-1]).astype(np.float64)
        group_sums = []
        for gi, group in enumerate(p["dec"]["quantizers"]):
            residual = x if gi < 2 else x - (group_sums[0] + group_sums[1])
            gsum = 0.0
            for layer in group:
                w_in = np.asarray(layer["in_proj"]["w"], np.float64)
                b_in = np.asarray(layer["in_proj"]["b"], np.float64)
                z = residual @ w_in.T + b_in
                w_in, b_in = whitening_fold(w_in, b_in, z)
                z = residual @ w_in.T + b_in  # whitened
                layer["in_proj"]["w"] = jnp.asarray(w_in.astype(np.float32))
                layer["in_proj"]["b"] = jnp.asarray(b_in.astype(np.float32))
                k = layer["codebook"].shape[0]
                pick = z[rng_np.permutation(len(z))[:k]]
                if len(pick) < k:
                    pick = np.concatenate(
                        [pick, 0.1 * rng_np.randn(k - len(pick), z.shape[1])]
                    )
                norms = np.linalg.norm(pick, axis=-1, keepdims=True)
                pick = pick / np.maximum(norms, 1e-9) * max(float(norms.mean()), 1e-3)
                layer["codebook"] = jnp.asarray(pick.astype(np.float32))
                zn = z / np.maximum(np.linalg.norm(z, axis=-1, keepdims=True), 1e-9)
                cn = pick / np.maximum(np.linalg.norm(pick, axis=-1, keepdims=True), 1e-9)
                codes = np.argmax(zn @ cn.T, axis=-1)
                w_out = np.asarray(layer["out_proj"]["w"], np.float64)
                b_out = np.asarray(layer["out_proj"]["b"], np.float64)
                q = pick[codes] @ w_out.T + b_out
                residual = residual - q
                gsum = gsum + q
                print(f"  vq-init group {gi}: {len(np.unique(codes))} live codes "
                      f"on {len(codes)} probe frames", flush=True)
            group_sums.append(gsum)

    init_vq_from_data(params)
    opt_state = tx.init(params)  # re-init: codebook moments for the seeded values

    os.makedirs(args.out_dir, exist_ok=True)
    metrics_path = os.path.join(args.out_dir, "metrics.jsonl")
    rng = jax.random.PRNGKey(args.seed + 1)

    def save(p):
        ph = jax.device_get(p)
        # Fold the training-time batch-stat whitening into in_proj so the
        # plain inference path (quantize.py::fvq_encode, no whitening)
        # selects the same codes.  Sequential through the RVQ groups: the
        # residual stream depends on each already-folded layer.
        probe = np.concatenate([make_batch()[0] for _ in range(4)])
        lat = np.asarray(jax.device_get(
            jax.jit(encoder_forward)(ph["enc"], jnp.asarray(probe))
        ))
        x = lat.reshape(-1, lat.shape[-1]).astype(np.float64)
        sums = []
        for gi, group in enumerate(ph["dec"]["quantizers"]):
            residual = x if gi < 2 else x - (sums[0] + sums[1])
            gsum = 0.0
            for layer in group:
                w_in = np.asarray(layer["in_proj"]["w"], np.float64)
                b_in = np.asarray(layer["in_proj"]["b"], np.float64)
                z = residual @ w_in.T + b_in
                w_in, b_in = whitening_fold(w_in, b_in, z)
                z = residual @ w_in.T + b_in
                layer["in_proj"] = dict(layer["in_proj"])
                layer["in_proj"]["w"] = jnp.asarray(w_in.astype(np.float32))
                layer["in_proj"]["b"] = jnp.asarray(b_in.astype(np.float32))
                cb = np.asarray(layer["codebook"], np.float64)
                zn = z / np.maximum(np.linalg.norm(z, axis=-1, keepdims=True), 1e-9)
                cn = cb / np.maximum(np.linalg.norm(cb, axis=-1, keepdims=True), 1e-9)
                codes = np.argmax(zn @ cn.T, axis=-1)
                w_out = np.asarray(layer["out_proj"]["w"], np.float64)
                b_out = np.asarray(layer["out_proj"]["b"], np.float64)
                q = cb[codes] @ w_out.T + b_out
                residual = residual - q
                gsum = gsum + q
            sums.append(gsum)
        save_pytree_npz(os.path.join(args.out_dir, "ns3_facodec_encoder.npz"), ph["enc"])
        # downstream analysis/synthesis reads only the decoder subtree;
        # heads are saved separately for reproducibility
        save_pytree_npz(os.path.join(args.out_dir, "ns3_facodec_decoder.npz"), ph["dec"])
        save_pytree_npz(os.path.join(args.out_dir, "train_heads.npz"), ph["heads"])

    t0 = time.time()
    last_t, last_step = t0, 0
    with open(metrics_path, "a", encoding="utf-8") as mf:
        for step in range(1, args.steps + 1):
            wav_b, lab_b, spk_b = make_batch()
            rng, sub = jax.random.split(rng)
            params, opt_state, metrics = train_step(
                params, opt_state, jnp.asarray(wav_b), jnp.asarray(lab_b),
                jnp.asarray(spk_b), sub,
            )
            if step % args.log_every == 0 or step == 1:
                m = jax.device_get(metrics)
                if not np.isfinite(float(m["total"])):
                    bad = []
                    for path, leaf in jax.tree_util.tree_leaves_with_path(
                        jax.device_get(params)
                    ):
                        if not np.isfinite(np.asarray(leaf)).all():
                            bad.append(jax.tree_util.keystr(path))
                    bad_terms = [
                        k for k, v in m.items()
                        if k != "code_usage" and not np.isfinite(float(np.asarray(v).sum()))
                    ]
                    if bad:
                        # Params poisoned: nothing to salvage, abort loudly.
                        print(f"[FATAL] non-finite loss at step {step}; "
                              f"non-finite params: {bad[:8]}", flush=True)
                        sys.exit(1)
                    # Transient bad batch: apply_if_finite already skipped
                    # the update; name the culprit terms and keep going.
                    nf = int(jax.device_get(opt_state.notfinite_count))
                    print(f"  [warn] non-finite loss terms at step {step} "
                          f"({bad_terms}); params finite, update skipped "
                          f"(consecutive skips: {nf})", flush=True)
                    if nf >= 250:
                        save(params)
                        print(f"[FATAL] {nf} consecutive skipped updates — "
                              f"training cannot progress; params saved",
                              flush=True)
                        sys.exit(1)
                    continue
                now = time.time()
                sps = (step - last_step) / max(now - last_t, 1e-9)
                last_t, last_step = now, step
                row = {k: round(float(v), 4) for k, v in m.items() if k != "code_usage"}
                row.update(step=step, steps_per_sec=round(sps, 2),
                           code_usage=[int(x) for x in m["code_usage"]])
                mf.write(json.dumps(row) + "\n")
                mf.flush()
                print(f"step {step}/{args.steps} total={row['total']:.3f} "
                      f"mel={row['mel_l1']:.3f} wav={row['wav_l1']:.4f} "
                      f"phone_acc={row['phone_acc']:.3f} spk_acc={row['spk_acc']:.3f} "
                      f"usage={row['code_usage']} ({sps:.2f} it/s)", flush=True)
            if step % args.revive_every == 0 and step < args.steps - 200:
                n_rev = revive_dead_codes(params, wav_b, rng_np)
                if sum(n_rev) and step % args.log_every == 0:
                    print(f"  revived dead codes: {n_rev}", flush=True)
            if step % args.save_every == 0 or step == args.steps:
                save(params)
    print(f"done in {(time.time() - t0) / 60:.1f} min -> {args.out_dir}", flush=True)


if __name__ == "__main__":
    main()
