#!/usr/bin/env python3
"""Unified Flamed-TTS-TPU synthesis CLI.

Flag-compatible with the reference's synthesize.py (reference:
synthesize.py:328-345): two modes —

* --prompt-list  : one text x N prompt WAVs (direct mode)
* --metadata-file: batched `target|prompt|text` lines (metadata mode)

plus the same output naming ({prompt}-{nd}-{nn}-{td}-{tn}.wav,
nfe{n}-temp{t}/ subdir) and the same avg-RTF printout.  TPU-specific
additions: --precision (fp32|bf16 matmuls) and --seed.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SR = 16000


def str2bool(value) -> bool:
    if isinstance(value, bool):
        return value
    value = str(value).strip().lower()
    if value in {"true", "1", "yes", "y"}:
        return True
    if value in {"false", "0", "no", "n"}:
        return False
    raise argparse.ArgumentTypeError(f"Cannot interpret '{value}' as boolean.")


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Unified Flamed-TTS-TPU synthesis script.")
    parser.add_argument("--ckpt-path", type=str, required=True,
                        help="Converted .npz / PyTorch checkpoint, or 'random' for random init.")
    parser.add_argument("--cfg-path", type=str, required=True,
                        help="Merged config.yaml, or a directory of the five config files.")
    parser.add_argument("--text", type=str, default=None, help="Text content (prompt-list mode).")
    parser.add_argument("--prompt-list", nargs="+", default=None,
                        help="Prompt filenames for direct synthesis.")
    parser.add_argument("--prompt-dir", "--input-dir", dest="prompt_dir", type=str, default=None,
                        help="Directory containing prompt WAV files.")
    parser.add_argument("--metadata-file", "--text-file", dest="metadata_file", type=str,
                        default=None, help="Metadata file with lines formatted as target|prompt|text.")
    parser.add_argument("--output-dir", type=str, default=".", help="Directory to store outputs.")
    parser.add_argument("--weights-only", type=str2bool, default=True,
                        help="PyTorch checkpoint weights_only loading flag.")
    parser.add_argument("--nsteps-durgen", type=int, default=64)
    parser.add_argument("--nsteps-denoiser", type=int, default=64)
    parser.add_argument("--temp-durgen", type=float, default=0.3)
    parser.add_argument("--temp-denoiser", type=float, default=0.3)
    parser.add_argument("--device", type=str, default="tpu",
                        help="tpu (default) or cpu.")
    parser.add_argument("--skip-existing", type=str2bool, default=True)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--codec-dir", type=str, default=None,
                        help="Directory with converted codec .npz checkpoints ('random' for random init).")
    parser.add_argument("--precision", type=str, default="fp32", choices=["fp32", "bf16"],
                        help="Matmul precision on TPU (fp32 = parity, bf16 = speed).")
    parser.add_argument("--seed", type=int, default=None, help="Sampling PRNG seed.")
    parser.add_argument("--lexicon-path", type=str, default=None)
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Write a jax.profiler trace of the run to this directory.")
    return parser


def _validate_args(args: argparse.Namespace) -> None:
    metadata_mode = args.metadata_file is not None
    prompt_mode = args.prompt_list is not None
    if metadata_mode == prompt_mode:
        raise ValueError(
            "Specify either --prompt-list (direct mode) or --metadata-file "
            "(batch mode), but not both."
        )
    if args.prompt_dir is None:
        raise ValueError("--prompt-dir/--input-dir is required.")
    if prompt_mode and not args.text:
        raise ValueError("--text is required when using --prompt-list.")
    if metadata_mode:
        if not os.path.isfile(args.metadata_file):
            raise ValueError(f"Metadata file not found: {args.metadata_file}")
        if args.batch_size < 1:
            raise ValueError("--batch-size must be >= 1.")


def _setup_jax(device: str, precision: str) -> None:
    import jax
    from flamed_tts_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if precision == "fp32":
        jax.config.update("jax_default_matmul_precision", "highest")


def load_config(cfg_path: str):
    from flamed_tts_tpu.config import compose_training_config, load_yaml

    if os.path.isdir(cfg_path):
        d = cfg_path
        return compose_training_config(
            os.path.join(d, "prior.yaml"), os.path.join(d, "prob.yaml"),
            os.path.join(d, "codec.yaml"), os.path.join(d, "optimizer.yaml"),
            os.path.join(d, "data.yaml"),
        )
    return load_yaml(cfg_path)


def prepare_model(cfg, ckpt_path: str, weights_only: bool):
    import jax

    from flamed_tts_tpu.models.flamed import Flamed

    if ckpt_path == "random":
        return Flamed(cfg, rng=jax.random.PRNGKey(0))
    return Flamed.from_pretrained(cfg, ckpt_path, weights_only=weights_only)


def get_codec(cfg, codec_dir: Optional[str]):
    import jax

    from flamed_tts_tpu.models.codec_wrapper import FaCodec

    if codec_dir == "random":
        return FaCodec.random_init(jax.random.PRNGKey(0))
    return FaCodec.from_pretrained(cfg["codec_cfg"], ckpt_dir=codec_dir)


def _resolve_prompt_path(prompt_dir: str, prompt_name: str) -> str:
    if os.path.isabs(prompt_name):
        return prompt_name
    return os.path.join(prompt_dir, prompt_name)


def chunked(seq, size):
    for idx in range(0, len(seq), size):
        yield seq[idx : idx + size]


def encode_prompt_features(codec, prompt_path: str, cache: Dict) -> Tuple[np.ndarray, np.ndarray]:
    if prompt_path not in cache:
        from flamed_tts_tpu.utils.audio import load_wav

        wav = load_wav(prompt_path, sr=SR)
        cache[prompt_path] = codec.encode_prompt(wav)
    return cache[prompt_path]


def synthesize_with_prompts(model, codec, args) -> Optional[float]:
    from flamed_tts_tpu.utils.audio import save_wav

    os.makedirs(args.output_dir, exist_ok=True)
    infer_times, output_durations = [], []
    rng = _rng(args.seed)

    for prompt_name in args.prompt_list:
        prompt_path = _resolve_prompt_path(args.prompt_dir, prompt_name)
        results = model.sample(
            text=args.text,
            prompt_raw=prompt_path,
            sr=SR,
            codec=codec,
            nsteps_durgen=args.nsteps_durgen,
            nsteps_denoiser=args.nsteps_denoiser,
            temp_durgen=args.temp_durgen,
            temp_denoiser=args.temp_denoiser,
            lexicon_path=args.lexicon_path,
            rng=next(rng),
        )
        infer_times.append(results["time"])
        output_durations.append(len(results["wav"]) / SR)
        stem = os.path.splitext(os.path.basename(prompt_name))[0]
        out_name = (
            f"{stem}-{args.nsteps_durgen}-{args.nsteps_denoiser}-"
            f"{args.temp_durgen}-{args.temp_denoiser}.wav"
        )
        save_wav(os.path.join(args.output_dir, out_name), results["wav"], SR)
        print(f"  wrote {out_name} ({output_durations[-1]:.2f}s in {results['time']:.2f}s)")

    if not infer_times:
        return None
    rtf = [t / d for t, d in zip(infer_times, output_durations)]
    return sum(rtf) / len(rtf)


def synthesize_with_metadata(model, codec, args) -> Optional[float]:
    from flamed_tts_tpu.utils.audio import save_wav

    with open(args.metadata_file, "r", encoding="utf-8") as fin:
        entries = [line.strip() for line in fin if line.strip()]

    target_dir = os.path.join(
        args.output_dir, f"nfe{args.nsteps_denoiser}-temp{args.temp_denoiser}"
    )
    os.makedirs(target_dir, exist_ok=True)

    prompt_cache: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    infer_times, output_durations = [], []
    rng = _rng(args.seed)

    pending: List[Dict[str, str]] = []
    for entry in entries:
        try:
            filename, prompt_filename, transcript = entry.split("|", 2)
        except ValueError:
            print(f"[WARN] Malformed line skipped: {entry}")
            continue
        out_path = os.path.join(target_dir, filename)
        if args.skip_existing and os.path.exists(out_path):
            continue
        pending.append(
            {
                "filename": filename,
                "prompt_path": _resolve_prompt_path(args.prompt_dir, prompt_filename),
                "text": transcript,
                "out_path": out_path,
            }
        )

    if not pending:
        return None

    frontend = model._get_frontend(args.lexicon_path)
    num_batches = math.ceil(len(pending) / args.batch_size)
    for bi, batch in enumerate(chunked(pending, args.batch_size)):
        phoneme_list, prompt_list, timbre_list = [], [], []
        for item in batch:
            ids, _, _ = frontend(item["text"])
            phoneme_list.append(ids[0])
            codes, timbre = encode_prompt_features(codec, item["prompt_path"], prompt_cache)
            prompt_list.append(codes)
            timbre_list.append(timbre)

        b = len(batch)
        src_lens = np.array([len(p) for p in phoneme_list], dtype=np.int32)
        max_l = int(src_lens.max())
        phonemes = np.zeros((b, max_l), dtype=np.int32)
        for i, p in enumerate(phoneme_list):
            phonemes[i, : len(p)] = p
        p_lens = np.array([c.shape[-1] for c in prompt_list], dtype=np.int32)
        max_p = int(p_lens.max())
        prompts = np.full((b, prompt_list[0].shape[0], max_p), model.vocab_size, dtype=np.int32)
        for i, c in enumerate(prompt_list):
            prompts[i, :, : c.shape[-1]] = c
        timbres = np.stack(timbre_list)

        outputs = model.sample_batch(
            phonemes=phonemes,
            src_lens=src_lens,
            prompts=prompts,
            prompt_lens=p_lens,
            timbres=timbres,
            codec=codec,
            temp_durgen=args.temp_durgen,
            temp_denoiser=args.temp_denoiser,
            nsteps_durgen=args.nsteps_durgen,
            nsteps_denoiser=args.nsteps_denoiser,
            rng=next(rng),
        )
        per_sample_time = outputs["time"] / b
        for i, item in enumerate(batch):
            n = int(outputs["tgt_len"][i]) * codec.hop
            wav = outputs["wav"][i, :n, 0]
            save_wav(item["out_path"], wav, SR)
            infer_times.append(per_sample_time)
            output_durations.append(len(wav) / SR)
        print(f"  batch {bi + 1}/{num_batches} done ({outputs['time']:.2f}s)")

    if not infer_times:
        return None
    rtf = [t / d for t, d in zip(infer_times, output_durations)]
    return sum(rtf) / len(rtf)


def _rng(seed: Optional[int]):
    import jax

    key = jax.random.PRNGKey(seed if seed is not None else int(time.time()))
    while True:
        key, sub = jax.random.split(key)
        yield sub


def main(args: Optional[argparse.Namespace] = None) -> Optional[float]:
    parser = build_arg_parser()
    cli_invocation = args is None
    if cli_invocation:
        args = parser.parse_args()
    try:
        _validate_args(args)
    except ValueError as exc:
        if cli_invocation:
            parser.error(str(exc))
        raise

    _setup_jax(args.device, args.precision)
    cfg = load_config(args.cfg_path)
    codec = get_codec(cfg, args.codec_dir)
    model = prepare_model(cfg, args.ckpt_path, args.weights_only)
    if args.precision == "bf16":
        model.cast_inference_params()

    from flamed_tts_tpu.utils.profiling import trace

    with trace(args.profile_dir):
        if args.metadata_file:
            rtf = synthesize_with_metadata(model, codec, args)
        else:
            rtf = synthesize_with_prompts(model, codec, args)

    if rtf is not None:
        print("=" * 20, "Avg RTF", "=" * 20)
        print(">" * 5, "RTF:", round(rtf, 3))
    else:
        print("No samples were generated.")
    return rtf


if __name__ == "__main__":
    main()
