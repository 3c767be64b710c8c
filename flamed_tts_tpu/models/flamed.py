"""Flamed: top-level model orchestration (reference flamed/models/flamed.py).

Owns the prior and prob generators' modules + parameter pytrees and
exposes the reference's public surface:

* ``from_pretrained``  — converted .npz or a raw PyTorch checkpoint
  (Lightning 'state_dict' or weights-only; converted on the fly)
* ``sample``           — single utterance: text/phonemes x prompt wav or
  precomputed (codes, timbre); returns {'wav', 'time'}
* ``sample_batch``     — batched phonemes/prompts/timbres; returns
  latents/prior outputs/wav + timing
* ``compute_losses``   — training losses (in train/losses.py)

All device compute is bucketed + jitted via runtime/sampler.py.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from flamed_tts_tpu.models.codec_wrapper import FaCodec
from flamed_tts_tpu.models.prior.prior_generator import PriorGenerator
from flamed_tts_tpu.models.prob.prob_generator import ProbGenerator
from flamed_tts_tpu.runtime.buckets import (
    DEFAULT_FRAME_BUCKETS,
    DEFAULT_PHONEME_BUCKETS,
    DEFAULT_PROMPT_BUCKETS,
    bucket_list,
)
from flamed_tts_tpu.runtime.pytree_io import load_pytree_npz, pytree_num_params
from flamed_tts_tpu.runtime.sampler import BucketedSampler
from flamed_tts_tpu.text.frontend import EnglishFrontend


def _to_plain_dict(cfg) -> dict:
    return cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)


class Flamed:
    def __init__(self, cfg, params: Optional[dict] = None, rng: Optional[jax.Array] = None):
        self.cfg = cfg
        prior_cfg = _to_plain_dict(cfg["prior_generator"])
        prob_cfg = _to_plain_dict(cfg["prob_generator"])
        self.prior_module = PriorGenerator(config=prior_cfg)
        self.prob_module = ProbGenerator(config=prob_cfg)
        self.vocab_size = prior_cfg["codec"]["vocab_size"]
        self.n_quantizers = prior_cfg["codec"]["n_quantizers"]

        dataset_cfg = cfg.get("dataset_cfg") or {}
        self.sampler = BucketedSampler(
            self.prior_module,
            self.prob_module,
            phoneme_buckets=bucket_list(
                dataset_cfg.get("phoneme_buckets"), DEFAULT_PHONEME_BUCKETS
            ),
            frame_buckets=bucket_list(
                dataset_cfg.get("frame_buckets"), DEFAULT_FRAME_BUCKETS
            ),
            prompt_buckets=bucket_list(
                dataset_cfg.get("prompt_buckets"), DEFAULT_PROMPT_BUCKETS
            ),
        )

        if params is not None:
            self.params = params
        else:
            self.params = self.init_params(rng if rng is not None else jax.random.PRNGKey(0))

        self.frontend: Optional[EnglishFrontend] = None

    # --- parameters ------------------------------------------------------

    def init_params(self, rng: jax.Array) -> dict:
        r1, r2 = jax.random.split(rng)
        b, l, p, f = 1, 16, 8, 32
        enc_hidden = _to_plain_dict(self.cfg["prior_generator"])["transformer"]["encoder_hidden"]
        cond_dim = _to_plain_dict(self.cfg["prob_generator"])["cond_dim"]
        spk_dim = _to_plain_dict(self.cfg["prob_generator"])["spk_dim"]
        # jit each init: run eagerly, flax init issues one device call per
        # parameter (~25 ms dispatch each here — minutes for 120 M params).
        prior_params = jax.jit(
            lambda key: self.prior_module.init(
                key,
                jnp.zeros((b, l), jnp.int32),
                jnp.zeros((b, l), bool),
                jnp.zeros((b, f, enc_hidden)),
                jnp.zeros((b, f), bool),
                jnp.zeros((b, self.n_quantizers, p), jnp.int32),
                jnp.full((b,), p, jnp.int32),
                method="init_all",
            )
        )(r1)
        prob_params = jax.jit(
            lambda key: self.prob_module.init(
                key,
                jnp.zeros((b, self.n_quantizers, f, cond_dim)),
                jnp.zeros((b, spk_dim)),
                jnp.zeros((b, f), bool),
            )
        )(r2)
        return {"prior": prior_params, "prob": prob_params}

    def num_params(self) -> int:
        return pytree_num_params(self.params)

    def cast_inference_params(self, dtype=None) -> None:
        """Cast float parameters to bf16 for inference.

        At batch 1 the 64-step denoiser loop is HBM-bound on weight
        streaming (~35 M params re-read per Euler step); bf16 storage
        halves that traffic.  Matmuls still accumulate in fp32 (XLA
        upcasts after the HBM read unless bf16 matmul precision is also
        selected).
        """
        import jax.numpy as jnp

        dtype = dtype or jnp.bfloat16

        def cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x

        self.params = jax.tree.map(cast, self.params)

    @classmethod
    def from_pretrained(
        cls, cfg, ckpt_path: str, weights_only: bool = True, **kwargs
    ) -> "Flamed":
        """Load a converted .npz checkpoint, or a PyTorch .ckpt/.pt/.bin
        (converted on the fly; requires torch)."""
        if ckpt_path.endswith(".npz"):
            params = load_pytree_npz(ckpt_path)
        else:
            import torch  # local import: conversion-time dependency only

            from tools.convert_torch_ckpt import convert_flamed_checkpoint

            sd = torch.load(ckpt_path, map_location="cpu", weights_only=weights_only)
            params = convert_flamed_checkpoint(sd)
        model = cls(cfg, params=params, **kwargs)
        return model

    # --- inference -------------------------------------------------------

    def _get_frontend(self, lexicon_path=None, cleaners=("english_cleaners",)):
        if self.frontend is None:
            self.frontend = EnglishFrontend(lexicon_path=lexicon_path, cleaners=cleaners)
        return self.frontend

    def sample(
        self,
        text: Optional[str] = None,
        phonemes: Optional[np.ndarray] = None,
        prompt_raw: Optional[Union[str, np.ndarray]] = None,
        prompt_processed: Optional[np.ndarray] = None,
        timbre: Optional[np.ndarray] = None,
        sr: int = 16000,
        codec: Optional[FaCodec] = None,
        codec_cfg=None,
        temp_durgen: float = 0.3,
        temp_denoiser: float = 0.3,
        nsteps_durgen: int = 64,
        nsteps_denoiser: int = 64,
        lexicon_path: Optional[str] = None,
        cleaners: Sequence[str] = ("english_cleaners",),
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, np.ndarray]:
        """Single-utterance zero-shot synthesis (reference flamed.py:89-166).

        Exactly one of (text, phonemes) and one of
        (prompt_raw, prompt_processed+timbre) must be given.
        """
        if (text is None) == (phonemes is None):
            raise ValueError(
                "`text` and `phonemes` are mutually exclusive—only one should "
                "be provided, and the other must be None!"
            )
        if (prompt_raw is None) == (prompt_processed is None):
            raise ValueError(
                "`prompt_raw` and `prompt_processed` are mutually exclusive—"
                "only one should be provided, and the other must be None!"
            )
        if prompt_processed is not None and timbre is None:
            raise ValueError("`timbre` must be provided along with `prompt_processed`!")
        if codec is None and codec_cfg is not None:
            # Reference-API compatibility (flamed.py:109-112): build the
            # codec from its config when not passed explicitly.
            codec = FaCodec.from_pretrained(codec_cfg)

        start_time = time.time()

        from flamed_tts_tpu.utils.profiling import sample_span

        if text is not None:
            with sample_span("frontend"):
                ids, _, _ = self._get_frontend(lexicon_path, cleaners)(text)
        else:
            ids = np.asarray(phonemes, dtype=np.int32)
            if ids.ndim == 1:
                ids = ids[None, :]

        prompt_wav = prompt_frames = None
        prompts = timbres = None
        if prompt_raw is not None:
            if codec is None:
                raise ValueError("`codec` must be provided with `prompt_raw`")
            if isinstance(prompt_raw, str):
                from flamed_tts_tpu.utils.audio import load_wav

                prompt_raw = load_wav(prompt_raw, sr=sr)
            # Single-call path: prompt encode+analyze compiles into the
            # fused sampling program (a separate encode_prompt call costs
            # a ~25 ms tunnel dispatch round trip).
            with sample_span("prompt_prep"):
                padded, n_frames = codec.pad_prompt_wav(np.asarray(prompt_raw))
                prompt_wav = padded[None, :]
                prompt_frames = np.asarray([n_frames], dtype=np.int32)
        else:
            if timbre is None:
                raise ValueError("`timbre` must be provided along with `prompt_processed`!")
            prompts = np.asarray(prompt_processed, dtype=np.int32)
            if prompts.ndim == 2:
                prompts = prompts[None, :, :]
            timbres = np.asarray(timbre, dtype=np.float32)
            if timbres.ndim == 1:
                timbres = timbres[None, :]

        outputs = self.sample_batch(
            phonemes=ids,
            src_lens=np.full((ids.shape[0],), ids.shape[-1], dtype=np.int32),
            prompts=prompts,
            prompt_lens=(
                None if prompts is None
                else np.full((prompts.shape[0],), prompts.shape[-1], dtype=np.int32)
            ),
            timbres=timbres,
            prompt_wav=prompt_wav,
            prompt_frames=prompt_frames,
            codec=codec,
            temp_durgen=temp_durgen,
            temp_denoiser=temp_denoiser,
            nsteps_durgen=nsteps_durgen,
            nsteps_denoiser=nsteps_denoiser,
            rng=rng,
        )

        result = {"time": time.time() - start_time}
        if "wav" in outputs:
            n = int(outputs["tgt_len"][0]) * (codec.hop if codec else 200)
            result["wav"] = np.asarray(outputs["wav"])[0, :n, 0]
        result.update({k: outputs[k] for k in ("latents", "tgt_len") if k in outputs})
        return result

    def sample_batch(
        self,
        phonemes: np.ndarray,
        src_lens: np.ndarray,
        prompts: Optional[np.ndarray] = None,
        timbres: Optional[np.ndarray] = None,
        prompt_lens: Optional[np.ndarray] = None,
        prompt_wav: Optional[np.ndarray] = None,
        prompt_frames: Optional[np.ndarray] = None,
        codec: Optional[FaCodec] = None,
        temp_durgen: float = 0.3,
        temp_denoiser: float = 0.3,
        nsteps_durgen: int = 64,
        nsteps_denoiser: int = 64,
        rng: Optional[jax.Array] = None,
        mesh=None,
    ) -> Dict[str, np.ndarray]:
        """Batched sampling (reference flamed.py:168-217).

        ``mesh``: optional jax.sharding.Mesh — shards the utterance batch
        over the 'data' axis for multi-chip throughput mode.

        Layout note vs the reference: arrays here are channel-last/TPU
        native — ``latents`` is (B, F, 256) where the reference returns
        (B, 256, F), and ``prior_logits`` is (B, n_q, F, V+1) where the
        reference permutes to (B, V+1, n_q, F).  Transpose on the host if
        the torch layouts are needed; it is not done here because these
        tensors are usually unused at inference and an extra device op
        costs a dispatch round trip.
        """
        start_time = time.time()
        if rng is None:
            rng = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
        if prompt_wav is None and prompts is None:
            raise ValueError("provide either prompts(+timbres) or prompt_wav")
        if prompt_wav is None and prompt_lens is None:
            prompt_lens = np.full((prompts.shape[0],), prompts.shape[-1], dtype=np.int32)

        out = self.sampler.sample(
            self.params["prior"],
            self.params["prob"],
            np.asarray(phonemes),
            np.asarray(src_lens),
            None if prompts is None else np.asarray(prompts),
            None if prompt_lens is None else np.asarray(prompt_lens),
            None if timbres is None else np.asarray(timbres, dtype=np.float32),
            rng,
            prompt_wav=prompt_wav,
            prompt_frames=prompt_frames,
            codec=codec,
            nsteps_durgen=nsteps_durgen,
            nsteps_denoiser=nsteps_denoiser,
            temp_durgen=temp_durgen,
            temp_denoiser=temp_denoiser,
            vocab_pad=self.vocab_size,
            mesh=mesh,
            # Codec decode compiles into the same program: one device
            # call instead of two saves the ~25 ms tunnel dispatch and
            # measures 15 ms faster end to end (honest host-pull timing;
            # an earlier "separate call is faster" conclusion came from
            # block_until_ready returning early through the tunnel).
            dec_params=codec.dec_params if codec is not None else None,
        )
        outputs: Dict[str, np.ndarray] = {
            "prior_embs": out["prior_embs"],
            "prior_logits": out["prior_logits"],
            "tgt_mask": np.asarray(jax.device_get(out["tgt_mask"])),
            "tgt_len": np.asarray(jax.device_get(out["tgt_len"])),
            "latents": out["latents"],
        }
        if "wav" in out and out["wav"] is not None:
            outputs["wav"] = np.asarray(out["wav"])
        elif codec is not None and timbres is not None:
            wav = codec.decode(out["latents"], jnp.asarray(timbres, dtype=jnp.float32))
            outputs["wav"] = np.asarray(jax.device_get(wav))
        else:
            jax.block_until_ready(out["latents"])
        outputs["time"] = time.time() - start_time
        return outputs
