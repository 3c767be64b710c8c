"""Bucketed, jit-cached sampling executor.

The target frame count is *sampled at runtime* by the duration model
(reference pva.py:111-116), so a single static program can't cover the
whole pipeline without always paying worst-case length.  Sampling is
therefore split into two jitted stages:

  stage 1 (static in phoneme bucket L):
      encode + PVA Euler loop -> integer durations, tgt_len
  stage 2 (static in L, frame bucket F, prompt bucket P):
      length-regulate -> per-quantizer decode -> denoiser Euler -> latents

The host reads tgt_len between stages (one small D2H transfer) and picks
the tightest frame bucket — so short utterances never pay for the 17 s
worst case.  Each (bucket signature, nfe, temperature) compiles once and
is cached on the jit cache for the life of the process.
"""

from __future__ import annotations

import warnings
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flamed_tts_tpu.models.prior.sampling import pva_sample
from flamed_tts_tpu.models.prob.prob_generator import prob_sample
from flamed_tts_tpu.ops.length_regulator import length_regulate
from flamed_tts_tpu.ops.masking import mask_from_lengths
from flamed_tts_tpu.runtime.buckets import pick_bucket
from flamed_tts_tpu.utils.profiling import sample_span


class BucketedSampler:
    """Owns the jitted stage functions for (prior, prob) module pair."""

    def __init__(
        self,
        prior_module,
        prob_module,
        phoneme_buckets: Sequence[int],
        frame_buckets: Sequence[int],
        prompt_buckets: Sequence[int],
    ):
        self.prior = prior_module
        self.prob = prob_module
        self.phoneme_buckets = list(phoneme_buckets)
        self.frame_buckets = list(frame_buckets)
        self.prompt_buckets = list(prompt_buckets)
        # Observed frames-per-phoneme ratios (fused-mode speculative
        # bucket sizing): p95 * margin of the recent history, so the
        # speculative bucket tracks the actual speech rate instead of a
        # worst-case constant.
        self._ratio_history: list = []

        # nfe/temperature are static in the jitted signatures; bucket
        # shapes vary via the input shapes themselves.  Codec decode is
        # fused into stage 2 (decode_audio static flag) — every separate
        # device call pays ~25 ms of dispatch through the TPU tunnel.
        self._stage1 = jax.jit(self._stage1_impl, static_argnums=(4,))
        self._stage2 = jax.jit(self._stage2_impl, static_argnums=(8, 9, 14))
        self._fused = jax.jit(self._fused_impl, static_argnums=(9, 10, 11, 14))
        self._fused_p = jax.jit(
            self._fused_prompt_impl, static_argnums=(9, 10, 11, 12, 15, 16, 17)
        )

    # --- stage 1: encode + duration/silence flow ------------------------

    def _stage1_impl(self, prior_params, phonemes, src_lens, rng, nfe, temperature):
        src_mask = mask_from_lengths(src_lens, phonemes.shape[1])
        enc_out = self.prior.apply(prior_params, phonemes, src_mask, method="encode")
        phone_dur, sil_dur = pva_sample(
            self.prior, prior_params, enc_out, src_mask, rng, nfe, temperature
        )
        valid = (~src_mask)
        tgt_len = (
            jnp.sum(jnp.maximum(phone_dur, 1.0) * valid, axis=1)
            + jnp.sum(sil_dur * valid, axis=1)
        ).astype(jnp.int32)
        return enc_out, phone_dur, sil_dur, tgt_len

    # --- stage 2: LR + decode + denoise ---------------------------------

    def _stage2_impl(
        self,
        prior_params,
        prob_params,
        enc_out,
        phone_dur,
        sil_dur,
        src_lens,
        prompts,
        prompt_lens,
        max_frames,   # static
        nfe,          # static
        timbres,
        rng,
        temperature,
        dec_params=None,
        decode_audio=False,  # static
    ):
        lr_out, tgt_len = length_regulate(
            enc_out, phone_dur, sil_dur, src_lens, max_frames
        )
        tgt_mask = mask_from_lengths(tgt_len, max_frames)
        hiddens, logits = self.prior.apply(
            prior_params, lr_out, tgt_mask, prompts, prompt_lens, method="decode"
        )
        latents = prob_sample(
            self.prob, prob_params, hiddens, timbres, tgt_mask, rng, nfe, temperature
        )
        wav = None
        if decode_audio:
            from flamed_tts_tpu.models.facodec.decoder import synthesize

            wav = synthesize(dec_params, latents, timbres.astype(latents.dtype))
            # int16 PCM on the wire: the host writes 16-bit WAVs anyway
            # (utils/audio.py::save_wav applies this exact quantization),
            # and fp32 would cost 2x the bytes through the ~25 ms tunnel
            # on every sample call.
            wav = jnp.round(
                jnp.clip(wav.astype(jnp.float32), -1.0, 1.0) * 32767.0
            ).astype(jnp.int16)
        return latents, hiddens, logits, tgt_len, tgt_mask, wav

    def _fused_impl(
        self,
        prior_params,
        prob_params,
        dec_params,
        phonemes,
        src_lens,
        prompts,
        prompt_lens,
        timbres,
        rng,
        max_frames,    # static (speculative bucket)
        nfe_durgen,    # static
        nfe_denoiser,  # static
        temp_durgen,
        temp_denoiser,
        decode_audio,  # static
    ):
        """Whole pipeline in ONE device call at a speculative frame bucket.

        Each separate call pays ~25 ms of tunnel dispatch in this
        environment; the fused form trades a host-side bucket decision
        (which needs a device round-trip for the sampled tgt_len) for a
        heuristic bucket + a rare overflow retry.  Returns the raw
        (unclipped) tgt_len so the caller can detect overflow.
        """
        rng1, rng2 = jax.random.split(rng)
        enc_out, phone_dur, sil_dur, tgt_len_raw = self._stage1_impl(
            prior_params, phonemes, src_lens, rng1, nfe_durgen, temp_durgen
        )
        latents, hiddens, logits, tgt_len, tgt_mask, wav = self._stage2_impl(
            prior_params, prob_params, enc_out, phone_dur, sil_dur, src_lens,
            prompts, prompt_lens, max_frames, nfe_denoiser, timbres, rng2,
            temp_denoiser, dec_params, decode_audio,
        )
        return latents, hiddens, logits, tgt_len, tgt_mask, wav, tgt_len_raw

    def _fused_prompt_impl(
        self,
        prior_params,
        prob_params,
        dec_params,
        enc_params,
        wav,            # (B, T_wav, 1) second-bucket-padded prompt audio
        wav_frames,     # (B,) true prompt frame counts
        phonemes,
        src_lens,
        rng,
        hop,            # static: codec hop (samples per frame)
        up_ratios_enc,  # static tuple
        p_bucket,       # static: prompt code bucket fed to the prior
        max_frames,     # static (speculative bucket)
        temp_durgen,
        temp_denoiser,
        nfe_durgen,     # static
        nfe_denoiser,   # static
        vocab_pad=1024,
    ):
        """ONE device call for the whole pipeline *including* prompt
        encode+analyze (the separate encode_prompt call costs a ~25 ms
        tunnel dispatch).  Mirrors FaCodec.encode_prompt's semantics:
        codes beyond the true frame count become ``vocab_pad``, timbre is
        masked mean-pooled (codec_wrapper.py:103-129)."""
        from flamed_tts_tpu.models.facodec.decoder import analyze
        from flamed_tts_tpu.models.facodec.encoder import encoder_forward

        if jnp.issubdtype(wav.dtype, jnp.integer):
            # inverse of the host-side int16 wire quantization above
            wav = wav.astype(jnp.float32) * (1.0 / 32767.0)
        n_frames_total = wav.shape[1] // hop
        # A prompt longer than the largest wav-second bucket arrives
        # truncated; clamp the frame count so zero-padded tail frames
        # never count as valid (matches FaCodec.encode_prompt).
        wav_frames = jnp.minimum(wav_frames, n_frames_total)
        pad_mask = mask_from_lengths(wav_frames, n_frames_total)
        latents = encoder_forward(enc_params, wav, up_ratios=up_ratios_enc)
        codes, timbre = analyze(dec_params, latents, pad_mask)
        prompts = jnp.transpose(codes, (1, 0, 2))  # (B, n_q, T')
        if p_bucket <= n_frames_total:
            prompts = prompts[:, :, :p_bucket]
        else:
            prompts = jnp.pad(
                prompts, ((0, 0), (0, 0), (0, p_bucket - n_frames_total))
            )
        slot = jnp.arange(p_bucket, dtype=jnp.int32)[None, None, :]
        prompts = jnp.where(
            slot < wav_frames[:, None, None], prompts, vocab_pad
        )
        prompt_lens = jnp.minimum(wav_frames, p_bucket)
        timbres = timbre.astype(jnp.float32)

        result = self._fused_impl(
            prior_params, prob_params, dec_params,
            phonemes, src_lens, prompts, prompt_lens,
            timbres, rng, max_frames, nfe_durgen, nfe_denoiser,
            temp_durgen, temp_denoiser, True,
        )
        return result

    # --- public API ------------------------------------------------------

    def sample(
        self,
        prior_params,
        prob_params,
        phonemes: np.ndarray,     # (B, Lany) int
        src_lens: np.ndarray,     # (B,)
        prompts: np.ndarray,      # (B, n_q, Pany) int
        prompt_lens: np.ndarray,  # (B,)
        timbres: np.ndarray,      # (B, spk_dim)
        rng: jax.Array,
        nsteps_durgen: int = 64,
        nsteps_denoiser: int = 64,
        temp_durgen: float = 0.3,
        temp_denoiser: float = 0.3,
        vocab_pad: int = 1024,
        mesh=None,
        dec_params=None,
        fused: bool = True,
        frames_per_phoneme_budget: Optional[float] = None,
        prompt_wav: Optional[np.ndarray] = None,   # (B, T_wav) padded audio
        prompt_frames: Optional[np.ndarray] = None,  # (B,) true frame counts
        codec=None,   # FaCodec — required with prompt_wav (enc params/hop)
    ) -> Dict[str, jnp.ndarray]:
        """Bucketed sampling; with ``mesh`` given, the utterance batch is
        sharded over the mesh's 'data' axis (throughput mode: the batch
        is padded with repeats of row 0 up to a multiple of the axis size,
        and the padding rows are sliced off the outputs).

        ``fused=True`` runs the whole pipeline as one device call at a
        speculative frame bucket (src_len * frames_per_phoneme_budget),
        retrying once at the exact bucket on overflow — saving two device
        round-trips per utterance.  ``fused=False`` uses the two-stage
        path that always picks the tightest frame bucket."""
        if prompt_wav is not None and not fused:
            raise ValueError(
                "prompt_wav (single-call prompt analysis) requires fused=True; "
                "use codec.encode_prompt + prompts/timbres for the staged path"
            )
        b_real = phonemes.shape[0]
        pad_rows = 0
        if mesh is not None:
            n_data = mesh.shape["data"]
            pad_rows = (-b_real) % n_data
            if pad_rows:
                def pad_b(a):
                    reps = np.repeat(a[:1], pad_rows, axis=0)
                    return np.concatenate([a, reps], axis=0)

                phonemes = pad_b(np.asarray(phonemes))
                src_lens = pad_b(np.asarray(src_lens))
                if prompt_wav is not None:
                    prompt_wav = pad_b(np.asarray(prompt_wav))
                    prompt_frames = pad_b(np.asarray(prompt_frames))
                else:
                    prompts = pad_b(np.asarray(prompts))
                    prompt_lens = pad_b(np.asarray(prompt_lens))
                    timbres = pad_b(np.asarray(timbres))
        b, l_in = phonemes.shape
        l_bucket = pick_bucket(l_in, self.phoneme_buckets)
        if l_in > l_bucket:
            warnings.warn(
                f"phoneme length {l_in} exceeds the largest bucket "
                f"{l_bucket}; input truncated (raise phoneme_buckets)",
                stacklevel=2,
            )
        phonemes_b = np.zeros((b, l_bucket), dtype=np.int32)
        phonemes_b[:, : min(l_in, l_bucket)] = phonemes[:, :l_bucket]
        src_lens = np.minimum(np.asarray(src_lens, dtype=np.int32), l_bucket)

        if prompt_wav is not None:
            if codec is None or dec_params is None:
                raise ValueError("prompt_wav requires `codec` (and its dec_params)")
            p_in = int(np.max(np.asarray(prompt_frames)))
        else:
            p_in = prompts.shape[-1]
        p_bucket = pick_bucket(p_in, self.prompt_buckets)
        if p_in > p_bucket:
            warnings.warn(
                f"prompt length {p_in} frames exceeds the largest bucket "
                f"{p_bucket}; prompt truncated (raise prompt_buckets)",
                stacklevel=2,
            )
        if prompt_wav is None:
            prompts_b = np.full((b, prompts.shape[1], p_bucket), vocab_pad, dtype=np.int32)
            prompts_b[:, :, : min(p_in, p_bucket)] = prompts[:, :, :p_bucket]
            prompt_lens = np.minimum(np.asarray(prompt_lens, dtype=np.int32), p_bucket)

        def place(x, batch_axis=True):
            x = jnp.asarray(x)
            if mesh is None:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P("data") if batch_axis and x.ndim > 0 else P()
            return jax.device_put(x, NamedSharding(mesh, spec))

        with sample_span("input_place"):
            phonemes_j = place(phonemes_b)
            src_lens_j = place(src_lens)

        if fused:
            if frames_per_phoneme_budget is None:
                if self._ratio_history:
                    # p95 * margin of observed speech rates, floored so a
                    # single fast-speech sample can't trigger an overflow
                    # retry (which costs a fresh bucket compile).
                    frames_per_phoneme_budget = max(
                        float(np.percentile(self._ratio_history[-64:], 95) * 1.2),
                        7.0,
                    )
                else:
                    frames_per_phoneme_budget = 9.0
            f_guess = pick_bucket(
                int(np.max(src_lens) * frames_per_phoneme_budget),
                self.frame_buckets,
            )
            if prompt_wav is not None:
                with sample_span("prompt_place"):
                    # int16 PCM on the wire, mirroring the output leg: the
                    # prompt is int16-sourced (load_wav), so the round trip
                    # is lossless and upload bytes halve through the
                    # ~15-20 MB/s tunnel (tools/probe_tunnel.py).
                    wav_q = np.round(
                        np.clip(np.asarray(prompt_wav, dtype=np.float32), -1.0, 1.0)
                        * 32767.0
                    ).astype(np.int16)
                    wav_j = place(wav_q[:, :, None])
                    frames_j = place(np.asarray(prompt_frames, dtype=np.int32))

                def call_fused(f_bucket):
                    return self._fused_p(
                        prior_params, prob_params, dec_params, codec.enc_params,
                        wav_j, frames_j, phonemes_j, src_lens_j, rng,
                        codec.hop, tuple(codec.up_ratios_enc), p_bucket,
                        f_bucket,
                        jnp.float32(temp_durgen), jnp.float32(temp_denoiser),
                        nsteps_durgen, nsteps_denoiser, vocab_pad,
                    )
            else:
                timbres_j = place(np.asarray(timbres, dtype=np.float32))
                prompts_j = place(prompts_b)
                prompt_lens_j = place(prompt_lens)

                def call_fused(f_bucket):
                    return self._fused(
                        prior_params, prob_params, dec_params,
                        phonemes_j, src_lens_j, prompts_j, prompt_lens_j,
                        timbres_j, rng, f_bucket, nsteps_durgen, nsteps_denoiser,
                        jnp.float32(temp_durgen), jnp.float32(temp_denoiser),
                        dec_params is not None,
                    )

            with sample_span("fused_dispatch"):
                result = call_fused(f_guess)
            # One RPC fetches overflow indicator + final outputs together
            # (tgt_mask rides along: a separate fetch later would cost
            # another ~25 ms tunnel round trip).
            with sample_span("fused_get"):
                if result[5] is not None:
                    tgt_raw_h, tgt_len_h, tgt_mask_h, wav_h = jax.device_get(
                        (result[6], result[3], result[4], result[5])
                    )
                else:
                    tgt_raw_h, tgt_len_h, tgt_mask_h = jax.device_get(
                        (result[6], result[3], result[4])
                    )
                    wav_h = None
            # Record the observed speech rate for future bucket guesses.
            ratios = tgt_raw_h / np.maximum(np.asarray(src_lens, np.float32), 1.0)
            self._ratio_history.extend(float(r) for r in ratios)
            del self._ratio_history[:-256]  # bound long-server growth
            if int(tgt_raw_h.max()) > self.frame_buckets[-1]:
                warnings.warn(
                    f"sampled target length {int(tgt_raw_h.max())} frames "
                    f"exceeds the largest frame bucket {self.frame_buckets[-1]}; "
                    "output clipped (raise frame_buckets)",
                    stacklevel=2,
                )
            if int(tgt_raw_h.max()) > f_guess and f_guess < self.frame_buckets[-1]:
                result = call_fused(pick_bucket(int(tgt_raw_h.max()), self.frame_buckets))
                if result[5] is not None:
                    _, tgt_len_h, tgt_mask_h, wav_h = jax.device_get(
                        (result[6], result[3], result[4], result[5])
                    )
                else:
                    tgt_len_h, tgt_mask_h = jax.device_get((result[3], result[4]))
            latents, hiddens, logits, _, _, _, _ = result
            out = {
                "latents": latents,
                "prior_embs": hiddens,
                "prior_logits": logits,
                "tgt_len": tgt_len_h,
                "tgt_mask": tgt_mask_h,
                "frame_bucket": latents.shape[1],
            }
            if wav_h is not None:
                # inverse of the on-device int16 quantization (stage 2)
                out["wav"] = np.asarray(wav_h, np.float32) / 32767.0
            if pad_rows:
                out = {
                    k: (v[:b_real] if hasattr(v, "ndim") and v.ndim > 0 else v)
                    for k, v in out.items()
                }
            return out

        rng1, rng2 = jax.random.split(rng)
        enc_out, phone_dur, sil_dur, tgt_len_est = self._stage1(
            prior_params,
            phonemes_j,
            src_lens_j,
            rng1,
            nsteps_durgen,
            jnp.float32(temp_durgen),
        )
        tgt_est_h = np.asarray(jax.device_get(tgt_len_est))
        max_needed = int(tgt_est_h.max())
        # Feed the speculative-bucket history from this path too, so a
        # server alternating staged/fused calls converges its guesses.
        ratios = tgt_est_h / np.maximum(np.asarray(src_lens, np.float32), 1.0)
        self._ratio_history.extend(float(r) for r in ratios)
        del self._ratio_history[:-256]
        if max_needed > self.frame_buckets[-1]:
            warnings.warn(
                f"sampled target length {max_needed} frames exceeds the "
                f"largest frame bucket {self.frame_buckets[-1]}; output "
                "clipped (raise frame_buckets)",
                stacklevel=2,
            )
        f_bucket = pick_bucket(max_needed, self.frame_buckets)

        latents, hiddens, logits, tgt_len, tgt_mask, wav = self._stage2(
            prior_params,
            prob_params,
            enc_out,
            phone_dur,
            sil_dur,
            src_lens_j,
            place(prompts_b),
            place(prompt_lens),
            f_bucket,
            nsteps_denoiser,
            place(np.asarray(timbres, dtype=np.float32)),
            rng2,
            jnp.float32(temp_denoiser),
            dec_params,
            dec_params is not None,
        )
        out = {
            "latents": latents,          # (B, F, 256) channel-last
            "prior_embs": hiddens,       # (B, n_q, F, D)
            "prior_logits": logits,
            "tgt_len": tgt_len,
            "tgt_mask": tgt_mask,
            "frame_bucket": f_bucket,
        }
        if wav is not None:
            out["wav"] = np.asarray(jax.device_get(wav), np.float32) / 32767.0
        if pad_rows:
            out = {
                k: (v[:b_real] if hasattr(v, "ndim") and v.ndim > 0 else v)
                for k, v in out.items()
            }
        return out
