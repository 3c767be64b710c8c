#!/usr/bin/env python3
"""Train the framewise phoneme recognizer (flamed_tts_tpu/asr.py).

Supervision comes from the fabricated corpus's exact alignments
(tools/fabricate_corpus.py TextGrids): each 80-fps mel frame gets the
phone label of its interval.  Train/valid split by utterance.

The recognizer is the WER leg of the evaluation harness
(tools/evaluate.py --asr-ckpt): BASELINE.md names WER parity as a
north-star metric and the reference ships no eval at all
(reference Makefile:103-104).

Usage:
  python tools/train_asr.py --corpus /tmp/corpus [--epochs 30]
      [--train-on decoded] [--codec-dir random]

--train-on decoded additionally trains on codec-round-tripped audio
(decode(analyze(wav))): synthesized audio lives in the codec-decoder
output domain, so mixing that domain into training makes the recognizer
transferable to TTS output even though the codec is not a trained
autoencoder in this environment.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from flamed_tts_tpu import asr

CHUNK = 512  # frames per training example (6.4 s)


def load_corpus(corpus_dir: str, holdout=()):
    """([(wav_path, spans, spk_id)], n_speakers) from fab_manifest.txt
    (+ speakers.txt when the fabricator wrote one; spk_id -1 otherwise).
    Speakers in ``holdout`` are excluded entirely (their audio is never
    seen), so the eval harness can report margins on unseen voices."""
    from flamed_tts_tpu.utils.textgrid import get_tier

    holdout = set(holdout)
    spk_of = {}
    spk_path = os.path.join(corpus_dir, "speakers.txt")
    if os.path.isfile(spk_path):
        with open(spk_path, encoding="utf-8") as fin:
            for line in fin:
                if "|" in line:
                    stem, s = line.strip().split("|", 1)
                    spk_of[stem] = s
    spk_ids = {
        s: i for i, s in enumerate(sorted(set(spk_of.values()) - holdout))
    }

    items = []
    manifest = os.path.join(corpus_dir, "fab_manifest.txt")
    with open(manifest, encoding="utf-8") as fin:
        for line in fin:
            parts = line.strip().split("|")
            if len(parts) < 3:
                continue
            wav_path, tg_path = parts[0], parts[1]
            stem = os.path.splitext(os.path.basename(wav_path))[0]
            if spk_of.get(stem) in holdout:
                continue
            spans = [
                (
                    int(round(iv.start_time * 80)),
                    int(round(iv.end_time * 80)),
                    asr.phone_label(iv.text),
                )
                for iv in get_tier(tg_path, "phones")
            ]
            items.append((wav_path, spans, spk_ids.get(spk_of.get(stem), -1)))
    return items, len(spk_ids)


def featurize(items, codec=None, decoded_cache=None, log=print):
    """-> (mels [N, CHUNK, 80], labels [N, CHUNK], spks [N]) chunked frames."""
    import jax
    import jax.numpy as jnp

    from flamed_tts_tpu.ops.melspec import mel_spectrogram
    from flamed_tts_tpu.utils.audio import load_wav

    mel_fn = jax.jit(mel_spectrogram)
    mels, labels, spks = [], [], []
    for idx, (wav_path, spans, spk_id) in enumerate(items):
        wav = load_wav(wav_path)
        versions = [wav]
        if decoded_cache is not None:
            # pre-dumped round-trip audio (tools/dump_decoded.py): the
            # codec stays off-process, so this featurization is CPU-only
            stem = os.path.splitext(os.path.basename(wav_path))[0]
            cached = os.path.join(decoded_cache, f"{stem}.wav")
            if os.path.isfile(cached):
                versions.append(load_wav(cached))
        elif codec is not None:
            versions.append(codec.round_trip(wav))
        n_frames = spans[-1][1]
        lab = np.zeros(n_frames, np.int32)
        for a, b, cid in spans:
            lab[a:b] = cid
        for v in versions:
            # Pad to a whole-second grid before the jitted mel: each
            # distinct wav length is otherwise a fresh compile through
            # the relay (300 utterances -> 300 compiles).
            sr = 16000
            # Reflect-pad (not zero-pad) so frames whose analysis window
            # crosses len(v) see the same reflected samples the unpadded
            # inference path (PhonemeRecognizer.frame_logits) sees —
            # melspec reflect-pads at the true waveform end.
            v_pad = np.pad(v, (0, (-len(v)) % sr), mode="reflect")
            true_frames = len(v) // 200
            mel = np.asarray(mel_fn(jnp.asarray(v_pad[None, :])))[0].T[:true_frames]
            T = min(mel.shape[0], n_frames)
            for start in range(0, T, CHUNK):
                seg_m = mel[start : start + CHUNK]
                seg_l = lab[start : start + CHUNK]
                if len(seg_m) < CHUNK // 4:
                    continue
                pad = CHUNK - len(seg_m)
                mels.append(np.pad(seg_m, ((0, pad), (0, 0))))
                labels.append(np.pad(seg_l, (0, pad), constant_values=-1))
                spks.append(spk_id)
        if idx % 50 == 49:
            log(f"  featurized {idx + 1}/{len(items)}")
    return (
        np.stack(mels).astype(np.float32),
        np.stack(labels).astype(np.int32),
        np.asarray(spks, np.int32),
    )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--corpus", default="/tmp/corpus")
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--lr", type=float, default=2e-3)
    parser.add_argument("--valid-every", type=int, default=10)
    parser.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    parser.add_argument("--train-on", default="clean", choices=["clean", "decoded"])
    parser.add_argument("--codec-dir", default="random")
    parser.add_argument("--decoded-cache", default=None,
                        help="Dir of pre-dumped round-trip wavs "
                             "(tools/dump_decoded.py); used with "
                             "--train-on decoded instead of an in-process codec.")
    parser.add_argument("--holdout-speakers", default="",
                        help="Comma-separated speaker ids excluded from "
                             "training entirely (eval on unseen voices).")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "..", "flamed_tts_tpu", "lexicon", "asr_weights.npz",
        ),
    )
    args = parser.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from flamed_tts_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    codec = None
    if args.train_on == "decoded" and not args.decoded_cache:
        from flamed_tts_tpu.models.codec_wrapper import FaCodec
        from flamed_tts_tpu.config import load_default_config

        if args.codec_dir == "random":
            codec = FaCodec.random_init(jax.random.PRNGKey(0))
        else:
            codec = FaCodec.from_pretrained(
                load_default_config()["codec_cfg"], ckpt_dir=args.codec_dir
            )

    items, n_speakers = load_corpus(
        args.corpus, holdout=[s for s in args.holdout_speakers.split(",") if s]
    )
    n_valid = max(len(items) // 10, 2)
    valid_items, train_items = items[:n_valid], items[n_valid:]
    print(f"corpus: {len(train_items)} train / {n_valid} valid utterances, "
          f"{n_speakers} speakers")
    t0 = time.time()
    cache = args.decoded_cache if args.train_on == "decoded" else None
    mels, labels, spk_labels = featurize(train_items, codec, decoded_cache=cache)
    vmels, vlabels, vspk = featurize(valid_items, codec, decoded_cache=cache)
    print(f"features: train {mels.shape} valid {vmels.shape} ({time.time() - t0:.0f}s)")

    params = asr.init_params(
        np.random.RandomState(args.seed),
        n_speakers=n_speakers if n_speakers >= 2 else None,
    )
    n = mels.shape[0]
    steps_per_epoch = max(n // args.batch, 1)
    total = steps_per_epoch * args.epochs
    sched = optax.warmup_cosine_decay_schedule(0.0, args.lr, min(200, total // 10), total)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched, weight_decay=1e-4))
    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    opt_state = tx.init(jparams)

    has_spk = "spk_w" in params

    def loss_fn(p, batch_mel, batch_lab, batch_spk):
        logits = asr.forward(p, jnp, batch_mel)
        valid = (batch_lab >= 0).astype(jnp.float32)
        lab = jnp.maximum(batch_lab, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(lab, asr.N_CLASSES)
        ce = -((0.95 * onehot + 0.05 / asr.N_CLASSES) * logp).sum(-1)
        loss = (ce * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        if has_spk:
            # joint speaker head: classify the pooled trunk embedding
            emb = asr.speaker_embed(p, jnp, batch_mel, frame_mask=valid)
            slogp = jax.nn.log_softmax(8.0 * (emb @ p["spk_cls"]), axis=-1)
            ok = (batch_spk >= 0).astype(jnp.float32)
            sce = -jnp.take_along_axis(
                slogp, jnp.maximum(batch_spk, 0)[:, None], axis=-1
            )[:, 0]
            loss = loss + 0.5 * (sce * ok).sum() / jnp.maximum(ok.sum(), 1.0)
        return loss

    @jax.jit
    def train_step(p, opt_state, batch_mel, batch_lab, batch_spk):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch_mel, batch_lab, batch_spk)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    @jax.jit
    def accuracy(p, batch_mel, batch_lab):
        pred = jnp.argmax(asr.forward(p, jnp, batch_mel), -1)
        valid = batch_lab >= 0
        return (jnp.where(valid, pred == batch_lab, False).sum(), valid.sum())

    rng = np.random.RandomState(args.seed + 1)
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        losses = []
        for b in range(steps_per_epoch):
            idx = order[b * args.batch : (b + 1) * args.batch]
            if len(idx) < args.batch:
                idx = np.concatenate([idx, order[: args.batch - len(idx)]])
            jparams, opt_state, loss = train_step(
                jparams, opt_state, jnp.asarray(mels[idx]),
                jnp.asarray(labels[idx]), jnp.asarray(spk_labels[idx]),
            )
            losses.append(loss)
        if (epoch + 1) % args.valid_every == 0 or epoch in (0, args.epochs - 1):
            hits = tot = 0
            for b in range(0, len(vmels), args.batch):
                vm, vl = vmels[b : b + args.batch], vlabels[b : b + args.batch]
                if len(vm) < args.batch:  # static shapes
                    pad = args.batch - len(vm)
                    vm = np.concatenate([vm, np.zeros_like(vm[:1]).repeat(pad, 0)])
                    vl = np.concatenate([vl, np.full_like(vl[:1], -1).repeat(pad, 0)])
                h, t = accuracy(jparams, jnp.asarray(vm), jnp.asarray(vl))
                hits += int(h)
                tot += int(t)
            print(
                f"epoch {epoch + 1}/{args.epochs} "
                f"loss={float(np.mean(jax.device_get(jnp.stack(losses)))):.4f} "
                f"valid-frame-acc={hits / max(tot, 1):.4f} ({time.time() - t0:.0f}s)",
                flush=True,
            )

    final = jax.tree_util.tree_map(np.asarray, jax.device_get(jparams))
    asr.save_weights(final, args.out)
    print(f"saved {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB)")

    if has_spk and len(vmels):
        emb = asr.speaker_embed(final, np, vmels, frame_mask=(vlabels >= 0))
        pred = np.argmax(emb @ final["spk_cls"], axis=-1)
        ok = vspk >= 0
        acc = float((pred[ok] == vspk[ok]).mean()) if ok.any() else float("nan")
        print(f"valid speaker-classification acc: {acc:.4f} "
              f"(n={int(ok.sum())}, {n_speakers} speakers)")

    # end-to-end word sanity on validation utterances (free decoding)
    from flamed_tts_tpu.utils.audio import load_wav
    from tools.evaluate import word_error_rate

    rec = asr.PhonemeRecognizer(args.out)
    with open(os.path.join(args.corpus, "fab_manifest.txt"), encoding="utf-8") as fin:
        lines = [l.strip().split("|") for l in fin if l.strip()]
    # score the same utterances the frame-acc validation used (holdout
    # filtering can make manifest order differ from item order)
    valid_wavs = {w for w, _, _ in valid_items}
    lines = [l for l in lines if l[0] in valid_wavs]
    wers = []
    for wav_path, _, text in lines[: n_valid]:
        _, hyp = rec.transcribe(load_wav(wav_path))
        wers.append(word_error_rate(text, hyp, canon=rec.canon))
    print(f"valid free-decoding WER on clean audio: {np.mean(wers):.4f} (n={len(wers)})")


if __name__ == "__main__":
    main()
