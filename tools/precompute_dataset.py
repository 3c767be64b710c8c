#!/usr/bin/env python3
"""Precompute the training dataset: wav + TextGrid -> per-utterance .npz.

The reference trains from precomputed codec features
(`PrecomputedTextCodesDataset`, reference dataset.py:330-403) but ships
no tool to produce them; this fills that gap.  For every manifest line

    wav_path|textgrid_path|transcript

it runs the FaCodec analysis (encoder -> RVQ codes -> quantized
embeddings + timbre), extracts phone/silence durations from the MFA
TextGrid "phones" tier, and writes

    out_dir/<utt>.npz  with fields
      phoneme (L,) int32       symbol ids
      code    (6, Lf) int32    RVQ code streams
      emb     (Lf, 256) f32    quantized embedding sum (the prob target)
      spk     (256,) f32       timbre embedding
      phone_dur, sil_dur (L,) int32

plus `out_dir/manifest.txt` lines `<utt>.npz|<dur_sec>|<transcript>` —
exactly what train.py's `use_precomputed: true` path consumes.

Usage:
  python tools/precompute_dataset.py --manifest in.txt --out-dir data/ \
      [--codec-dir checkpoints | --codec-dir random] [--device tpu|cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--manifest", required=True,
                        help="Lines: wav_path|textgrid_path|transcript")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--codec-dir", default=None,
                        help="Converted codec .npz dir ('random' for smoke runs)")
    parser.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    parser.add_argument("--valid-n", type=int, default=18,
                        help="Utterances for valid_manifest.txt (head of the list).")
    parser.add_argument("--sampling-rate", type=int, default=16000)
    parser.add_argument("--down-factor", type=int, default=200)
    parser.add_argument("--cleaners", nargs="+", default=["english_cleaners"])
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from flamed_tts_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from flamed_tts_tpu.config import load_default_config
    from flamed_tts_tpu.data.dataset import compute_alignment
    from flamed_tts_tpu.models.codec_wrapper import FaCodec
    from flamed_tts_tpu.models.facodec.decoder import vq2emb
    from flamed_tts_tpu.text import text_to_sequence
    from flamed_tts_tpu.utils.audio import load_wav
    from flamed_tts_tpu.utils.textgrid import get_tier

    cfg = load_default_config()
    if args.codec_dir == "random":
        codec = FaCodec.random_init(jax.random.PRNGKey(0))
    else:
        codec = FaCodec.from_pretrained(cfg["codec_cfg"], ckpt_dir=args.codec_dir)

    vq2emb_jit = jax.jit(vq2emb)

    os.makedirs(args.out_dir, exist_ok=True)
    manifest_out = []
    n_done, n_failed = 0, 0
    with open(args.manifest, encoding="utf-8") as fin:
        lines = [ln.strip() for ln in fin if ln.strip()]

    for line in lines:
        try:
            wav_path, tg_path, transcript = line.split("|", 2)
            stem0 = os.path.splitext(os.path.basename(wav_path))[0]
            prior = os.path.join(args.out_dir, f"{stem0}.npz")
            wav = load_wav(wav_path, sr=args.sampling_rate)
            duration = len(wav) / args.sampling_rate
            if os.path.isfile(prior):
                # resume support: an interrupted run keeps its finished
                # utterances (codes are deterministic given the codec)
                manifest_out.append(f"{stem0}.npz|{duration:.3f}|{transcript}")
                n_done += 1
                continue

            codes, timbre = codec.encode_prompt(wav)  # (6, Lf), (256,)
            emb = np.asarray(
                jax.device_get(
                    vq2emb_jit(codec.dec_params, jnp.asarray(codes[:, None, :]))
                )
            )[0]  # (Lf, 256)

            intervals = get_tier(tg_path, "phones")
            phones, phone_dur, sil_dur = compute_alignment(
                intervals, args.sampling_rate, args.down_factor
            )
            phonemes = np.asarray(
                text_to_sequence("{" + " ".join(phones) + "}", args.cleaners),
                dtype=np.int32,
            )

            stem = os.path.splitext(os.path.basename(wav_path))[0]
            rel = f"{stem}.npz"
            np.savez(
                os.path.join(args.out_dir, rel),
                phoneme=phonemes,
                code=codes.astype(np.int32),
                emb=emb.astype(np.float32),
                spk=np.asarray(timbre, dtype=np.float32),
                phone_dur=np.asarray(phone_dur, dtype=np.int32),
                sil_dur=np.asarray(sil_dur, dtype=np.int32),
            )
            manifest_out.append(f"{rel}|{duration:.3f}|{transcript}")
            n_done += 1
        except Exception as exc:
            print(f"[WARN] skipped {line.split('|')[0]}: {exc}")
            n_failed += 1

    with open(os.path.join(args.out_dir, "manifest.txt"), "w", encoding="utf-8") as fout:
        fout.write("\n".join(manifest_out) + "\n")
    # train/valid split files (the data.yaml schema names both)
    n_valid = max(1, min(args.valid_n, len(manifest_out) // 5))
    with open(os.path.join(args.out_dir, "valid_manifest.txt"), "w", encoding="utf-8") as fout:
        fout.write("\n".join(manifest_out[:n_valid]) + "\n")
    with open(os.path.join(args.out_dir, "train_manifest.txt"), "w", encoding="utf-8") as fout:
        fout.write("\n".join(manifest_out[n_valid:]) + "\n")
    print(f"Precomputed {n_done} utterances ({n_failed} failed) -> {args.out_dir} "
          f"(train {len(manifest_out) - n_valid} / valid {n_valid})")


if __name__ == "__main__":
    main()
