#!/usr/bin/env python3
"""Dump codec round-trip audio for every corpus utterance to a cache dir.

decode(vq2emb(analyze(encode(wav)))) is the output domain of the TTS
pipeline; the phoneme recognizer trains on this domain (tools/train_asr.py
--decoded-cache) so WER-on-synth is not dominated by codec artifacts.
Run on the TPU (fast) BEFORE launching other TPU jobs — the cache then
lets ASR training run CPU-only in parallel with TPU training.

Usage:
  python tools/dump_decoded.py --corpus _work/corpus_r5 \
      --codec-dir _work/codec_r5 --out-dir _work/decoded_r5 [--device tpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--corpus", required=True)
    parser.add_argument("--codec-dir", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from flamed_tts_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from flamed_tts_tpu.config import load_default_config
    from flamed_tts_tpu.models.codec_wrapper import FaCodec
    from flamed_tts_tpu.utils.audio import load_wav, save_wav

    if args.codec_dir == "random":
        codec = FaCodec.random_init(jax.random.PRNGKey(0))
    else:
        codec = FaCodec.from_pretrained(
            load_default_config()["codec_cfg"], ckpt_dir=args.codec_dir
        )

    os.makedirs(args.out_dir, exist_ok=True)
    t0 = time.time()
    n = 0
    with open(os.path.join(args.corpus, "fab_manifest.txt"), encoding="utf-8") as fin:
        lines = [l.strip().split("|") for l in fin if l.strip()]
    for parts in lines:
        wav_path = parts[0]
        stem = os.path.splitext(os.path.basename(wav_path))[0]
        out_path = os.path.join(args.out_dir, f"{stem}.wav")
        if os.path.isfile(out_path):
            continue
        save_wav(out_path, codec.round_trip(load_wav(wav_path)))
        n += 1
        if n % 100 == 0:
            print(f"  {n}/{len(lines)} ({time.time() - t0:.0f}s)", flush=True)
    print(f"decoded {n} utterances -> {args.out_dir} ({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
