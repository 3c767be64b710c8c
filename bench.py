#!/usr/bin/env python3
"""Headline benchmark: single-utterance RTF at nsteps-denoiser=64.

Prints ONE JSON line:
  {"metric": "rtf_single_utt_nfe64", "value": R, "unit": "rtf",
   "vs_baseline": 0.05 / R}

R = steady-state wall time / generated audio seconds for the full
pipeline (text -> prior -> denoiser -> codec decode -> host wav), the
exact quantity the reference CLI prints (reference synthesize.py:216-217).
The north-star target is RTF < 0.05 on one v5e chip (BASELINE.json), so
vs_baseline > 1 means the target is beaten.

Runs with random weights (the reference's pretrained checkpoints are not
published in this environment); the compute graph, shapes, and step
counts are identical to the trained path, so the timing is representative.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NSTEPS_DURGEN = 64
NSTEPS_DENOISER = 64
TARGET_RTF = 0.05
TEXT = (
    "The quick brown fox jumps over the lazy dog while the curious cat "
    "watches from a sunny window sill in the early morning light."
)


def main() -> None:
    import jax

    from flamed_tts_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    precision = os.environ.get("BENCH_PRECISION", "bf16")
    if precision == "fp32":
        jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    from flamed_tts_tpu.config import load_default_config
    from flamed_tts_tpu.models.codec_wrapper import FaCodec
    from flamed_tts_tpu.models.flamed import Flamed

    cfg = load_default_config()
    model = Flamed(cfg, rng=jax.random.PRNGKey(0))
    codec = FaCodec.random_init(jax.random.PRNGKey(1))
    if precision == "bf16":
        model.cast_inference_params()

    # 3 s prompt at 16 kHz
    t_axis = np.arange(3 * 16000) / 16000.0
    prompt = (0.1 * np.sin(2 * np.pi * 220 * t_axis)).astype(np.float32)

    # A trained duration model yields ~5-7 frames/phoneme (80 fps); random
    # weights yield ~1, which would shrink the denominator and overstate
    # RTF.  The bench therefore drives the identical compiled programs but
    # forces a realistic duration profile, producing a ~10 s utterance —
    # the quantity the north-star target describes.
    frontend_ids, _, _ = model._get_frontend()(TEXT)
    n_ph = frontend_ids.shape[1]
    codes, timbre = codec.encode_prompt(prompt)

    sampler = model.sampler
    from flamed_tts_tpu.runtime.buckets import pick_bucket

    l_bucket = pick_bucket(n_ph, sampler.phoneme_buckets)
    phonemes = np.zeros((1, l_bucket), np.int32)
    phonemes[0, :n_ph] = frontend_ids[0]
    src_lens = jnp.asarray([n_ph], dtype=jnp.int32)
    p_bucket = pick_bucket(codes.shape[-1], sampler.prompt_buckets)
    prompts = np.full((1, codes.shape[0], p_bucket), model.vocab_size, np.int32)
    prompts[0, :, : codes.shape[-1]] = codes
    prompt_lens = jnp.asarray([codes.shape[-1]], dtype=jnp.int32)

    rng0 = jax.random.PRNGKey(0)
    phone_dur = np.full((1, l_bucket), 6.0, np.float32)
    sil_dur = np.zeros((1, l_bucket), np.float32)
    sil_dur[0, ::8] = 4.0
    n_frames = int(phone_dur[0, :n_ph].sum() + sil_dur[0, :n_ph].sum())
    f_bucket = pick_bucket(n_frames, sampler.frame_buckets)
    audio_seconds = n_frames / 80.0

    def run(seed: int):
        # Includes prompt analysis, matching the span the reference's
        # sample() times (flamed.py:127-161).
        codes_i, timbre_i = codec.encode_prompt(prompt)
        rng = jax.random.PRNGKey(seed)
        r1, r2 = jax.random.split(rng)
        enc_out, _, _, _ = sampler._stage1(
            model.params["prior"], jnp.asarray(phonemes), src_lens, r1,
            NSTEPS_DURGEN, jnp.float32(0.3),
        )
        _, _, _, tgt_len, _, wav = sampler._stage2(
            model.params["prior"], model.params["prob"], enc_out,
            jnp.asarray(phone_dur), jnp.asarray(sil_dur), src_lens,
            jnp.asarray(prompts), prompt_lens, f_bucket, NSTEPS_DENOISER,
            jnp.asarray(timbre_i[None, :]), r2, jnp.float32(0.3),
            codec.dec_params, True,
        )
        return np.asarray(jax.device_get(wav))[0, : n_frames * 200, 0]

    warm = run(0)  # compile
    times = []
    for seed in range(1, 4):
        t0 = time.time()
        out = run(seed)
        times.append(time.time() - t0)

    rtf = float(np.mean(times) / audio_seconds)
    print(
        f"[bench] audio={audio_seconds:.2f}s per-run={np.mean(times):.3f}s "
        f"(frames={n_frames}, bucket={f_bucket}, precision={precision})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "rtf_single_utt_nfe64",
                "value": round(rtf, 5),
                "unit": "rtf",
                "vs_baseline": round(TARGET_RTF / rtf, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
