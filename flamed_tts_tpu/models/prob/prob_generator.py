"""Prob generator: attention-free flow-matching acoustic denoiser.

Re-design of the reference ProbGenerator (flamed/models/synthesizer/
prob_generator.py:267-446): quantizer-id encoding flattens the 6
per-quantizer prior hiddens to (B, L, 6*384); a condition downsampler
projects to the 256-d FaCodec latent space; the denoiser is a DiT-style
attention-free stack of adaLN ConvNeXt ResBlocks.

Flow-matching specifics preserved:
* the source distribution is *prior-centered*: x0 = N(0, I) + cond
  (prob_generator.py:419), and sampling starts from
  noise * temperature + cond (prob_generator.py:440);
* training uses per-(B, L) random t; sampling uses a scalar t per step;
* training adds an endpoint-reconstruction ``anchor_loss`` on
  x1_est = x_t + (1 - (1-sigma)t) * v_t (prob_generator.py:426-427).

Mask-awareness is a deliberate deviation: the reference's sampling loop
never masks, which is exact for single exact-length utterances but feeds
garbage frames through time-mixing GroupNorms for padded batches.  Under
static bucketing every run is padded, so the mask is threaded through all
time-mixing ops, making bucketed output match the reference's exact-length
output for every valid frame.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from flamed_tts_tpu.ops.convnext import AdaLNResBlock, FinalLayer, TimestepEmbedder
from flamed_tts_tpu.ops.norms import MaskedGroupNorm


class ResnetBlock1D(nn.Module):
    """Masked 1x1-conv + GroupNorm(8) + Mish residual block
    (prob_generator.py:11-32), channel-last."""

    dim: int
    groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        h = x
        if pad_mask is not None:
            h = jnp.where(pad_mask[:, :, None], 0.0, h)
        h = nn.Dense(self.dim, name="conv")(h)
        h = MaskedGroupNorm(num_groups=self.groups, channels=self.dim, name="norm")(
            h, pad_mask
        )
        h = h * jnp.tanh(nn.softplus(h))  # Mish
        if pad_mask is not None:
            h = jnp.where(pad_mask[:, :, None], 0.0, h)
        return x + h


class ConditionDownSampler(nn.Module):
    """n_stages of [ResnetBlock1D -> 1x1 conv halving channels ->
    GroupNorm(8) -> ReLU], then Linear -> out ReLU
    (prob_generator.py:167-205)."""

    in_channel: int
    out_channel: int
    n_stages: int = 1
    n_groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        c = self.in_channel
        for i in range(self.n_stages):
            x = ResnetBlock1D(dim=c, name=f"resblock_{i}")(x, pad_mask)
            x = nn.Dense(c // 2, name=f"down_conv_{i}")(x)
            x = MaskedGroupNorm(
                num_groups=self.n_groups, channels=c // 2, name=f"down_norm_{i}"
            )(x, pad_mask)
            x = nn.relu(x)
            c = c // 2
        x = nn.Dense(self.out_channel, name="proj_out")(x)
        return nn.relu(x)


class SimpleMLPAdaLN(nn.Module):
    """The attention-free denoiser (prob_generator.py:267-365)."""

    in_channels: int
    model_channels: int
    out_channels: int
    spk_dim: int
    num_res_blocks: int
    convnext_kernel: int = 31
    convnext_padding: int = 15
    convnext_expand: int = 1
    convnext_groups: Optional[int] = None

    def setup(self):
        self.time_embed = TimestepEmbedder(
            hidden_size=self.model_channels, name="time_embed"
        )
        self.cond_embed = nn.Dense(self.model_channels, name="cond_embed")
        self.proj_in = nn.Dense(self.model_channels, name="proj_in")
        self.res_blocks = [
            AdaLNResBlock(
                channels=self.model_channels,
                convnext_kernel=self.convnext_kernel,
                convnext_padding=self.convnext_padding,
                convnext_expand=self.convnext_expand,
                convnext_groups=self.convnext_groups,
                name=f"res_block_{i}",
            )
            for i in range(self.num_res_blocks)
        ]
        self.final_layer = FinalLayer(
            model_channels=self.model_channels,
            out_channels=self.out_channels,
            convnext_kernel=self.convnext_kernel,
            convnext_padding=self.convnext_padding,
            convnext_expand=self.convnext_expand,
            convnext_groups=self.convnext_groups,
            name="final_layer",
        )

    def __call__(
        self,
        x: jnp.ndarray,    # (B, L, in_channels)
        t: Optional[jnp.ndarray],  # broadcastable to (B, L); None with mods
        spk: Optional[jnp.ndarray],  # (B, spk_dim); None with mods
        pad_mask: Optional[jnp.ndarray] = None,
        mods: Optional[Tuple[jnp.ndarray, ...]] = None,
    ) -> jnp.ndarray:
        if mods is None:
            t = jnp.asarray(t, dtype=jnp.float32)
            while t.ndim < 2:
                t = t[None] if t.ndim == 0 else t[:, None]
            t_emb = self.time_embed(t)  # (B_or_1, L_or_1, C)
            y = t_emb + self.cond_embed(spk)[:, None, :]
            block_mods = [None] * (self.num_res_blocks + 1)
        else:
            y = None
            block_mods = list(mods)

        x = self.proj_in(x)
        for i, block in enumerate(self.res_blocks):
            x = block(x, y, pad_mask, mods=block_mods[i])
        return self.final_layer(x, y, pad_mask, mods=block_mods[-1])

    def compute_mods(self, t_grid: jnp.ndarray, spk: jnp.ndarray):
        """All Euler steps' adaLN modulations in batched matmuls.

        t_grid: (S,) static step times; spk: (B, spk_dim).
        Returns num_res_blocks tensors of shape (S, B, 1, 6C) plus the
        final layer's (S, B, 1, 5C) — the per-step xs of the sampling
        scan.  Hoisting these out of the Euler loop removes ~13 small
        serial matmuls per step (t is a static linspace, so every step's
        conditioning is known upfront).
        """
        t = jnp.asarray(t_grid, dtype=jnp.float32)[:, None]  # (S, 1)
        t_emb = self.time_embed(t)  # (S, 1, C)
        spk_emb = self.cond_embed(spk)  # (B, C)
        y = t_emb[:, None, :, :] + spk_emb[None, :, None, :]  # (S, B, 1, C)

        return tuple(
            block(None, y, None, mods_only=True) for block in self.res_blocks
        ) + (self.final_layer(None, y, None, mods_only=True),)


class ProbGenerator(nn.Module):
    """Container exposing condition encoding and one denoiser call."""

    config: dict

    def setup(self):
        cfg = self.config
        self.target_dim = cfg["target_dim"]
        self.sigma_min = float(cfg["sigma_min"])
        self.n_quantizers = cfg["n_quantizers"]
        self.cond_dim = cfg["cond_dim"]

        self.quantizer_emb = nn.Embed(
            self.n_quantizers, self.cond_dim, name="quantizer_emb"
        )
        self.cond_downsampling = ConditionDownSampler(
            in_channel=self.n_quantizers * self.cond_dim,
            out_channel=self.target_dim,
            n_stages=cfg["downsampling_stages"],
            name="cond_downsampling",
        )
        cx = cfg["convnext"]
        self.denoiser = SimpleMLPAdaLN(
            in_channels=self.target_dim,
            model_channels=cfg["hidden_dim"],
            out_channels=self.target_dim,
            spk_dim=cfg["spk_dim"],
            num_res_blocks=cfg["n_layers"],
            convnext_kernel=cx["kernel_size"],
            convnext_padding=cx["padding"],
            convnext_expand=cx["expand"],
            convnext_groups=cx["groups"],
            name="denoiser",
        )

    def encode_condition(
        self,
        prior_hiddens: jnp.ndarray,  # (B, n_q, L, cond_dim)
        pad_mask: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        """QuantizerEncoding + ConditionDownSampler
        (prob_generator.py:368-381,198-205) -> (B, L, target_dim)."""
        q_ids = jnp.arange(self.n_quantizers, dtype=jnp.int32)
        q_emb = self.quantizer_emb(q_ids)  # (n_q, cond_dim)
        x = prior_hiddens + q_emb[None, :, None, :]
        b, q, l, d = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, l, q * d)
        return self.cond_downsampling(x, pad_mask)

    def denoise(
        self,
        xt: jnp.ndarray,
        t: jnp.ndarray,
        spk: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        return self.denoiser(xt, t, spk, pad_mask)

    def denoise_with_mods(
        self,
        xt: jnp.ndarray,
        mods,
        pad_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        return self.denoiser(xt, None, None, pad_mask, mods=mods)

    def denoiser_mods(self, t_grid: jnp.ndarray, spk: jnp.ndarray):
        return self.denoiser.compute_mods(t_grid, spk)

    def __call__(
        self,
        prior_hiddens: jnp.ndarray,
        spk: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cond = self.encode_condition(prior_hiddens, pad_mask)
        t = jnp.zeros((cond.shape[0],), dtype=jnp.float32)
        return self.denoise(cond, t, spk, pad_mask)


def prob_sample(
    module: ProbGenerator,
    params,
    prior_hiddens: jnp.ndarray,
    spk: jnp.ndarray,
    pad_mask: jnp.ndarray,
    rng: jax.Array,
    nfe: int,
    temperature: float,
) -> jnp.ndarray:
    """Euler sampling (prob_generator.py:434-446) -> latents (B, L, C).

    (The reference returns (B, C, L); our channel-last layout feeds the
    codec decoder directly — the orchestrator handles the transpose at the
    torch-facing boundary only.)
    """
    cond = module.apply(params, prior_hiddens, pad_mask, method="encode_condition")
    b, l, c = cond.shape
    noise = jax.random.normal(rng, (b, l, c), dtype=jnp.float32)
    xt = noise * temperature + cond

    ts = jnp.linspace(0.0, 1.0, nfe + 1, dtype=jnp.float32)[:-1]
    delta_t = 1.0 / nfe

    # Hoist every step's adaLN conditioning out of the loop (one batched
    # matmul per block over all steps) and scan over the stacked tensors.
    mods = module.apply(params, ts, spk, method="denoiser_mods")

    def step(x, mods_t):
        vt = module.apply(params, x, mods_t, pad_mask, method="denoise_with_mods")
        return x + delta_t * vt, None

    xt, _ = jax.lax.scan(step, xt, mods)
    return xt


def prob_loss(
    module: ProbGenerator,
    params,
    x1: jnp.ndarray,            # (B, L, target_dim) ground-truth latents
    prior_hiddens: jnp.ndarray,  # (B, n_q, L, cond_dim)
    spk: jnp.ndarray,
    pad_mask: jnp.ndarray,
    rng: jax.Array,
    sigma_min: float,
    loss_norm: str = "masked",
    _t_override: jnp.ndarray | None = None,
    _noise_override: jnp.ndarray | None = None,
) -> Dict[str, jnp.ndarray]:
    """fm_loss + anchor_loss (prob_generator.py:414-432).

    ``loss_norm="masked"`` (default) means over valid positions;
    ``"reference"`` reproduces the reference's ``F.mse_loss`` over the
    full padded (B, L, C) buffer (prob_generator.py:424,428).
    ``_t_override``/``_noise_override`` are parity-test hooks.
    """
    cond = module.apply(params, prior_hiddens, pad_mask, method="encode_condition")
    b, l, c = cond.shape
    rng_t, rng_n = jax.random.split(rng)
    t = jax.random.uniform(rng_t, (b, l, 1), dtype=jnp.float32)
    if _t_override is not None:
        t = _t_override
    noise = (
        _noise_override
        if _noise_override is not None
        else jax.random.normal(rng_n, cond.shape, dtype=jnp.float32)
    )
    x0 = noise + cond
    xt = t * x1 + (1.0 - (1.0 - sigma_min) * t) * x0

    valid = (~pad_mask)[:, :, None].astype(jnp.float32)
    if loss_norm == "reference":
        denom = jnp.float32(b * l * c)
    else:
        denom = jnp.maximum(valid.sum() * c, 1.0)

    dx = (x1 - (1.0 - sigma_min) * x0) * valid
    vt = module.apply(params, xt, t[..., 0], spk, pad_mask, method="denoise") * valid
    fm_loss = jnp.sum((vt - dx) ** 2) / denom

    x1_est = (xt + (1.0 - (1.0 - sigma_min) * t) * vt) * valid
    # The reference compares the masked estimate against the RAW x1 buffer
    # (prob_generator.py:428); pads contribute 0 only because collated embs
    # are zero-padded.  The masked mode masks x1 explicitly instead.
    x1_ref = x1 if loss_norm == "reference" else x1 * valid
    anchor_loss = jnp.sum((x1_est - x1_ref) ** 2) / denom
    return {"fm_loss": fm_loss, "anchor_loss": anchor_loss}
