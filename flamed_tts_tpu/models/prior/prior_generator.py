"""Prior generator: phoneme encoder -> PVA -> per-quantizer FFT decoders.

Re-design of the reference PriorGenerator (flamed/models/synthesizer/
prior_generator.py:29-196) for static shapes:

* The encoder/decoders are FFT-block stacks (ops/fft_block.py).
* Decoders run over a statically padded ``[prompt ‖ target]`` layout.
  Position ids are *computed per token* and gathered from the sinusoid
  table so that target token i receives position ``prompt_len_actual + i``
  — exactly the position it has in the reference's exact-length
  concatenation — regardless of prompt bucket padding.  Padded prompt
  positions are masked out of attention (the reference's batch mode leaves
  them attendable as zero embeddings; masking matches its exact-length
  single-utterance behavior instead, which is the parity target).
* PreEncoding's in-place segment/quantizer embedding additions
  (prior_generator.py:12-26) are functionalized.

The flow-matching Euler loop and the length regulator are orchestrated by
models/prior/sampling.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from flamed_tts_tpu.ops.embeddings import sinusoid_position_table
from flamed_tts_tpu.ops.fft_block import FFTBlock
from flamed_tts_tpu.ops.masking import apply_mask
from flamed_tts_tpu.models.prior.pva import ProbabilisticModule

N_SYMBOLS = 360  # flamed_tts_tpu.text.symbols; vocab is N_SYMBOLS + 1


class FFTStack(nn.Module):
    """A stack of FFT blocks (shared by encoder and decoders)."""

    n_layers: int
    d_model: int
    n_head: int
    d_inner: int
    kernel_sizes: Tuple[int, int]
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pad_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d_k = self.d_model // self.n_head
        for i in range(self.n_layers):
            x = FFTBlock(
                d_model=self.d_model,
                n_head=self.n_head,
                d_k=d_k,
                d_v=d_k,
                d_inner=self.d_inner,
                kernel_sizes=tuple(self.kernel_sizes),
                dropout=self.dropout,
                name=f"layer_{i}",
            )(x, pad_mask, deterministic=deterministic)
        return x


class PriorGenerator(nn.Module):
    """Container module exposing the per-call compute stages as methods."""

    config: dict

    def setup(self):
        tcfg = self.config["transformer"]
        vcfg = self.config["variance_adaptor"]
        ccfg = self.config["codec"]

        self.enc_hidden = tcfg["encoder_hidden"]
        self.dec_hidden = tcfg["decoder_hidden"]
        self.vocab_size = ccfg["vocab_size"]
        self.n_quantizers = ccfg["n_quantizers"]
        self.enc_max_len = tcfg["encoder_max_seq_len"]
        self.dec_max_len = tcfg["decoder_max_seq_len"]
        self.sigma_min = float(vcfg["sigma_min"])

        self.src_word_emb = nn.Embed(
            N_SYMBOLS + 1, self.enc_hidden, name="src_word_emb"
        )
        self.encoder = FFTStack(
            n_layers=tcfg["encoder_layer"],
            d_model=self.enc_hidden,
            n_head=tcfg["encoder_head"],
            d_inner=tcfg["encoder_conv_filter_size"],
            kernel_sizes=tuple(tcfg["encoder_conv_kernel_size"]),
            dropout=tcfg["encoder_dropout"],
            name="encoder",
        )

        dg = dict(vcfg["duration_generator"])
        sg = dict(vcfg["sil_generator"])
        self.duration_generator = ProbabilisticModule(
            input_size=dg["input_size"],
            filter_size=dg["filter_size"],
            kernel_size=dg["kernel_size"],
            time_scale=dg["time_scale"],
            dropout=dg["drop_out"],
            name="duration_generator",
        )
        self.sil_generator = ProbabilisticModule(
            input_size=sg["input_size"],
            filter_size=sg["filter_size"],
            kernel_size=sg["kernel_size"],
            time_scale=sg["time_scale"],
            dropout=sg["drop_out"],
            name="sil_generator",
        )

        self.bridge = nn.Dense(self.dec_hidden, name="bridge")
        # vocab_size + 1 entries; the last id is padding and embeds to zero
        # at conversion time (torch padding_idx semantics).
        self.code_embedding = nn.Embed(
            self.vocab_size + 1, self.dec_hidden, name="code_embedding"
        )

        def make_decoder(n_layers: int, name: str) -> FFTStack:
            return FFTStack(
                n_layers=n_layers,
                d_model=self.dec_hidden,
                n_head=tcfg["decoder_head"],
                d_inner=tcfg["decoder_conv_filter_size"],
                kernel_sizes=tuple(tcfg["decoder_conv_kernel_size"]),
                dropout=tcfg["decoder_dropout"],
                name=name,
            )

        self.shared_decoder = make_decoder(
            tcfg["decoder_shared_layers"], "shared_decoder"
        )
        self.prior_decoders = [
            make_decoder(n, f"prior_decoder_{i}")
            for i, n in enumerate(tcfg["decoder_layers"])
        ]

        # PreEncoding segment/quantizer embeddings (prior_generator.py:12-26).
        self.prompt_seg_emb = self.param(
            "prompt_seg_emb", nn.initializers.uniform(scale=1.0),
            (1, 1, self.dec_hidden),
        )
        self.target_seg_emb = self.param(
            "target_seg_emb", nn.initializers.uniform(scale=1.0),
            (1, 1, self.dec_hidden),
        )
        self.quantizer_emb = nn.Embed(
            self.n_quantizers, self.dec_hidden, name="quantizer_emb"
        )

        self.head = nn.Dense(self.vocab_size + 1, name="head")

    # ----- compute stages -------------------------------------------------

    def encode(
        self,
        phonemes: jnp.ndarray,   # (B, L) int32
        src_mask: jnp.ndarray,   # (B, L) True = pad
        deterministic: bool = True,
    ) -> jnp.ndarray:
        l = phonemes.shape[1]
        if l > self.enc_max_len:
            raise ValueError(f"phoneme length {l} exceeds encoder table")
        pos = sinusoid_position_table(l, self.enc_hidden)
        x = self.src_word_emb(phonemes) + pos[None, :, :]
        return self.encoder(x, src_mask, deterministic=deterministic)

    def pva_fields(
        self,
        dur_t: jnp.ndarray,
        sil_t: jnp.ndarray,
        enc_out: jnp.ndarray,
        t: jnp.ndarray,
        src_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        v_dur = self.duration_generator(
            dur_t, enc_out, t, src_mask, deterministic=deterministic
        )
        v_sil = self.sil_generator(
            sil_t, enc_out, t, src_mask, deterministic=deterministic
        )
        return v_dur, v_sil

    def decode(
        self,
        lr_out: jnp.ndarray,       # (B, L, enc_hidden) length-regulated frames
        tgt_mask: jnp.ndarray,     # (B, L) True = pad
        prompts: jnp.ndarray,      # (B, n_q, P) int32 codes, pad = vocab_size
        prompt_lens: jnp.ndarray,  # (B,) actual prompt lengths
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (hiddens (B, n_q, L, D), logits (B, n_q, L, vocab+1))."""
        b, l, _ = lr_out.shape
        p = prompts.shape[-1]
        concat_len = p + l
        if concat_len > self.dec_max_len:
            raise ValueError(f"[prompt‖target] length {concat_len} exceeds table")

        output = self.bridge(lr_out)

        # Shared decoder runs over the target alone, positions 0..L-1
        # (prior_generator.py:96,165).
        pos_table = sinusoid_position_table(concat_len, self.dec_hidden)
        output = output + pos_table[None, :l, :]
        output = self.shared_decoder(output, tgt_mask, deterministic=deterministic)

        # --- compacted [prompt ‖ target] layout -------------------------
        # The decoder's conv-FFN mixes adjacent positions, so the target
        # must sit IMMEDIATELY after the last real prompt token (as in the
        # reference's exact-length concatenation) — a padded prompt bucket
        # would otherwise open a gap at the boundary.  Row j of the
        # compacted sequence gathers:
        #     j <  p_len[b]  -> prompt row j
        #     j >= p_len[b]  -> target row (j - p_len[b])
        # which also makes position ids a plain arange (matching the
        # reference's 0..p_len+tgt-1 numbering for every batch element).
        p_lens = prompt_lens.astype(jnp.int32)
        slots = jnp.arange(concat_len, dtype=jnp.int32)[None, :]  # (1, P+L)
        in_prompt = slots < p_lens[:, None]                        # (B, P+L)
        gather_idx = jnp.where(
            in_prompt,
            jnp.minimum(slots, p - 1),
            jnp.clip(p + slots - p_lens[:, None], 0, concat_len - 1),
        )

        tgt_lens = jnp.sum(~tgt_mask, axis=1).astype(jnp.int32)
        concat_mask = slots >= (p_lens + tgt_lens)[:, None]

        # Un-compaction: target row i lives at compacted row p_len + i.
        scatter_idx = jnp.minimum(p_lens[:, None] + jnp.arange(l, dtype=jnp.int32)[None, :], concat_len - 1)

        seg = jnp.where(
            in_prompt[:, :, None],
            self.prompt_seg_emb.astype(lr_out.dtype),
            self.target_seg_emb.astype(lr_out.dtype),
        )
        prompt_embs = self.code_embedding(prompts)  # (B, n_q, P, D)

        hiddens = []
        for ith, decoder in enumerate(self.prior_decoders):
            cat = jnp.concatenate([prompt_embs[:, ith], output], axis=1)
            x = jnp.take_along_axis(cat, gather_idx[:, :, None], axis=1)
            # PreEncoding segment + quantizer-id embeddings + positions.
            q_emb = self.quantizer_emb(jnp.full((1,), ith, dtype=jnp.int32))
            x = x + seg + q_emb[None, :, :] + pos_table[None, :, :]
            x = decoder(x, concat_mask, deterministic=deterministic)
            output = jnp.take_along_axis(x, scatter_idx[:, :, None], axis=1)
            output = apply_mask(output, tgt_mask)
            hiddens.append(output)

        hiddens_stacked = jnp.stack(hiddens, axis=1)  # (B, n_q, L, D)
        logits = self.head(hiddens_stacked)
        logits = apply_mask(logits, tgt_mask[:, None, :])
        return hiddens_stacked, logits

    def __call__(
        self,
        phonemes: jnp.ndarray,
        src_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Default entry point (encoder only)."""
        return self.encode(phonemes, src_mask, deterministic=deterministic)

    def init_all(
        self,
        phonemes: jnp.ndarray,
        src_mask: jnp.ndarray,
        frames: jnp.ndarray,       # (B, Lf, enc_hidden)
        tgt_mask: jnp.ndarray,     # (B, Lf)
        prompts: jnp.ndarray,      # (B, n_q, P)
        prompt_lens: jnp.ndarray,  # (B,)
    ):
        """Exercise every submodule once so init creates all parameters."""
        enc_out = self.encode(phonemes, src_mask)
        zeros = jnp.zeros(phonemes.shape, dtype=jnp.float32)
        t = jnp.zeros((phonemes.shape[0],), dtype=jnp.float32)
        v_dur, v_sil = self.pva_fields(zeros, zeros, enc_out, t, src_mask)
        hiddens, logits = self.decode(frames, tgt_mask, prompts, prompt_lens)
        return enc_out, v_dur, v_sil, hiddens, logits
