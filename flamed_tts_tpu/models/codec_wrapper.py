"""High-level FaCodec wrapper: prompt analysis and waveform synthesis.

Bundles converted parameters with jitted, bucketed entry points.  The
reference's codec calls (synthesize.py:108-125, flamed.py:137-140,214-215)
map to ``encode_prompt`` and ``decode``.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flamed_tts_tpu.models.facodec.decoder import analyze, synthesize, vq2emb
from flamed_tts_tpu.models.facodec.encoder import encoder_forward, encoder_hop_length
from flamed_tts_tpu.ops.masking import mask_from_lengths
from flamed_tts_tpu.runtime.buckets import DEFAULT_WAV_SECOND_BUCKETS, pick_bucket
from flamed_tts_tpu.runtime.pytree_io import load_pytree_npz

DEFAULT_CKPT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "checkpoints"
)


class FaCodec:
    """Frozen codec: encoder + decoder params + jitted compute."""

    def __init__(self, enc_params, dec_params, sr: int = 16000,
                 up_ratios_enc=(2, 4, 5, 5), up_ratios_dec=(5, 5, 4, 2)):
        self.enc_params = enc_params
        self.dec_params = dec_params
        self.sr = sr
        self.up_ratios_enc = tuple(up_ratios_enc)
        self.up_ratios_dec = tuple(up_ratios_dec)
        self.hop = encoder_hop_length(self.up_ratios_enc)

        # One jitted program per stage pair: encode+analyze fused (each
        # separate device call costs ~25 ms dispatch through the TPU
        # tunnel, comparable to the compute itself).
        def _encode_analyze(enc_params, dec_params, wav, pad_mask):
            latents = encoder_forward(enc_params, wav, up_ratios=self.up_ratios_enc)
            return analyze(dec_params, latents, pad_mask)

        self._encode_analyze = jax.jit(_encode_analyze)
        self._synthesize = jax.jit(
            partial(synthesize, up_ratios=self.up_ratios_dec)
        )

    # --- construction ----------------------------------------------------

    @classmethod
    def from_pretrained(cls, codec_cfg, ckpt_dir: Optional[str] = None) -> "FaCodec":
        """Load converted .npz checkpoints per the codec config schema
        (configs/codec.yaml)."""
        ckpt_dir = ckpt_dir or DEFAULT_CKPT_DIR
        enc_path = os.path.join(ckpt_dir, codec_cfg["encoder"]["ckpt_filename"])
        dec_path = os.path.join(ckpt_dir, codec_cfg["decoder"]["ckpt_filename"])
        for path in (enc_path, dec_path):
            if not os.path.isfile(path):
                raise FileNotFoundError(
                    f"Converted codec checkpoint not found: {path}.\n"
                    "One-time conversion from the PyTorch release "
                    "(amphion/naturalspeech3_facodec, the repo in "
                    "configs/codec.yaml ckpt_repo):\n"
                    "  python tools/convert_torch_ckpt.py --kind codec-encoder "
                    "ns3_facodec_encoder.bin checkpoints/ns3_facodec_encoder.npz\n"
                    "  python tools/convert_torch_ckpt.py --kind codec-decoder "
                    "ns3_facodec_decoder.bin checkpoints/ns3_facodec_decoder.npz"
                )
        return cls(
            load_pytree_npz(enc_path),
            load_pytree_npz(dec_path),
            sr=codec_cfg.get("sr", 16000),
            up_ratios_enc=codec_cfg["encoder"]["up_ratios"],
            up_ratios_dec=codec_cfg["decoder"]["up_ratios"],
        )

    @classmethod
    def random_init(cls, rng: jax.Array, codec_cfg=None) -> "FaCodec":
        """Random-weight codec (for smoke tests / benches without the
        pretrained release)."""
        from flamed_tts_tpu.models.facodec.decoder import init_decoder_params
        from flamed_tts_tpu.models.facodec.encoder import init_encoder_params

        r1, r2 = jax.random.split(rng)
        # One compiled program per init: executed eagerly these make ~100
        # separate device calls (~25 ms dispatch each here — minutes).
        enc_p = jax.jit(init_encoder_params)(r1)
        dec_p = jax.jit(init_decoder_params)(r2)
        return cls(enc_p, dec_p)

    # --- inference -------------------------------------------------------

    def cast_inference_params(self, dtype=None) -> None:
        """Cast float codec parameters (bf16 halves HBM weight traffic in
        the conv stacks; the Snake/FIR kernel computes in fp32 either way).
        Quality cost is bounded by the bench's fixed-seed mel-distance
        check (tests/test_bf16_quality.py)."""
        dtype = dtype or jnp.bfloat16

        def cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x

        self.enc_params = jax.tree.map(cast, self.enc_params)
        self.dec_params = jax.tree.map(cast, self.dec_params)

    def pad_prompt_wav(self, wav: np.ndarray) -> Tuple[np.ndarray, int]:
        """Prompt wav (T,) -> (second-bucket padded wav, true frame count).

        The padding contract matches encode_prompt below; used by the
        single-call sampling path (runtime/sampler.py::_fused_prompt_impl)
        which runs encode+analyze inside the fused program."""
        wav = np.asarray(wav, dtype=np.float32).squeeze()
        n = wav.shape[-1]
        n_seconds = max(1, int(np.ceil(n / self.sr)))
        bucket_s = pick_bucket(n_seconds, DEFAULT_WAV_SECOND_BUCKETS)
        padded = np.zeros(bucket_s * self.sr, dtype=np.float32)
        padded[: min(n, len(padded))] = wav[: len(padded)]
        return padded, n // self.hop

    def encode_prompt(self, wav: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Prompt wav (T,) float32 -> (codes (n_q, T'), timbre (256,)).

        The wav is padded to a seconds-bucket so distinct prompt lengths
        reuse compiled programs; codes beyond the true frame count are
        sliced off (boundary effect limited to ~1 frame — see
        models/facodec/encoder.py docstring).
        """
        padded, n_frames = self.pad_prompt_wav(wav)
        pad_mask = mask_from_lengths(
            jnp.asarray([n_frames], dtype=jnp.int32), len(padded) // self.hop
        )
        codes, timbre = self._encode_analyze(
            self.enc_params, self.dec_params,
            jnp.asarray(padded)[None, :, None], pad_mask,
        )
        # One RPC for both outputs: each device_get costs a ~25 ms tunnel
        # round trip here.
        codes_h, timbre_h = jax.device_get((codes, timbre))
        return np.asarray(codes_h)[:, 0, :n_frames], np.asarray(timbre_h)[0]

    def decode(self, latents: jnp.ndarray, timbre: jnp.ndarray) -> jnp.ndarray:
        """latents (B, T, 256) + timbre (B, 256) -> wav (B, T*hop_dec, 1)."""
        return self._synthesize(self.dec_params, latents, timbre)

    def round_trip(self, wav: np.ndarray) -> np.ndarray:
        """wav (T,) -> decode(vq2emb(analyze(encode(wav)))) (T',) float32.

        The full analysis-synthesis loop (reference facodec.py:509-533 +
        630-638).  Used by tools/train_asr.py to expose the recognizer to
        the codec-decoder output domain, and by codec round-trip tests.
        """
        if not hasattr(self, "_round_trip_fn"):
            def _rt(enc_params, dec_params, wav_b, pad_mask):
                latents = encoder_forward(
                    enc_params, wav_b, up_ratios=self.up_ratios_enc
                )
                codes, timbre = analyze(dec_params, latents, pad_mask)
                emb = vq2emb(dec_params, codes)
                return synthesize(
                    dec_params, emb, timbre, up_ratios=self.up_ratios_dec
                )

            self._round_trip_fn = jax.jit(_rt)
        padded, n_frames = self.pad_prompt_wav(wav)
        pad_mask = mask_from_lengths(
            jnp.asarray([n_frames], dtype=jnp.int32), len(padded) // self.hop
        )
        out = self._round_trip_fn(
            self.enc_params, self.dec_params,
            jnp.asarray(padded)[None, :, None], pad_mask,
        )
        out_h = np.asarray(jax.device_get(out), dtype=np.float32)[0, :, 0]
        return out_h[: n_frames * self.hop]
