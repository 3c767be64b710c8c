"""FaCodec decoder: analysis (RVQ + timbre) and synthesis (latents -> wav).

Re-design of the reference FACodecDecoder (flamed/models/facodec/
facodec.py:268-661).  Two inference roles:

* ``analyze``: prompt latents -> 6 code streams (prosody 1 + content 2 +
  residual 3, the residual quantizing x - (prosody+content)) plus the
  mean-pooled timbre embedding (facodec.py:470-533).
* ``synthesize``: latents + timbre -> waveform via the timbre-conditioned
  affine norm and the conv-transpose upsampling stack
  (facodec.py:630-638,398-415).

Training-only heads (F0/phone predictors, gradient-reversal probes,
random residual masking) are intentionally absent: no Flamed entry point
ever trains the codec.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flamed_tts_tpu.models.facodec.encoder import _act_p, _conv_p, _res_unit_p
from flamed_tts_tpu.models.facodec.quantize import rvq_decode, rvq_encode
from flamed_tts_tpu.models.facodec.timbre import init_timbre_params, timbre_encoder_forward
from flamed_tts_tpu.ops.conv1d import conv1d, conv_transpose1d
from flamed_tts_tpu.ops.resample import snake_filtered

GROUP_SIZES = (1, 2, 3)  # prosody, content, residual quantizer counts


def analyze(
    params: Dict,
    latents: jnp.ndarray,                   # (B, T, 256)
    pad_mask: Optional[jnp.ndarray] = None,  # (B, T) True = pad
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (codes (6, B, T) int32, timbre (B, 256)).

    Code stream order matches the reference concatenation
    (facodec.py:470-507): [prosody, content x2, residual x3].
    """
    x = latents
    if pad_mask is not None:
        x = jnp.where(pad_mask[:, :, None], 0.0, x)

    prosody_codes, prosody_q = rvq_encode(x, params["quantizers"][0])
    content_codes, content_q = rvq_encode(x, params["quantizers"][1])
    residual_in = x - (prosody_q + content_q)
    residual_codes, _ = rvq_encode(residual_in, params["quantizers"][2])

    codes = jnp.concatenate([prosody_codes, content_codes, residual_codes], axis=0)
    timbre = timbre_encoder_forward(params["timbre_encoder"], latents, pad_mask)
    return codes, timbre


def vq2emb(params: Dict, codes: jnp.ndarray, use_residual: bool = True) -> jnp.ndarray:
    """codes (6, B, T) -> summed embeddings (B, T, 256) (facodec.py:618-628)."""
    out = rvq_decode(codes[0:1], params["quantizers"][0])
    out = out + rvq_decode(codes[1:3], params["quantizers"][1])
    if use_residual:
        out = out + rvq_decode(codes[3:6], params["quantizers"][2])
    return out


def decoder_block(x: jnp.ndarray, p: Dict, stride: int) -> jnp.ndarray:
    """Snake -> strided conv-transpose -> 3 residual units
    (facodec.py:246-265)."""
    x = snake_filtered(x, p["act"]["alpha"], p["act"]["beta"])
    pad = stride // 2 + stride % 2
    x = conv_transpose1d(
        x, p["up"]["w"], p["up"]["b"],
        stride=stride, padding=pad, output_padding=stride % 2,
    )
    from flamed_tts_tpu.models.facodec.encoder import residual_stack

    return residual_stack(x, p["res"])


def synthesize(
    params: Dict,
    latents: jnp.ndarray,   # (B, T, 256)
    timbre: jnp.ndarray,    # (B, 256)
    up_ratios: Sequence[int] = (5, 5, 4, 2),
) -> jnp.ndarray:
    """latents + timbre -> wav (B, T * 200, 1) (facodec.py:630-638)."""
    style = timbre @ params["timbre_linear"]["w"].T + params["timbre_linear"]["b"]
    gamma, beta = jnp.split(style[:, None, :], 2, axis=-1)  # (B, 1, 256) each
    mean = latents.mean(-1, keepdims=True)
    var = ((latents - mean) ** 2).mean(-1, keepdims=True)
    x = (latents - mean) / jnp.sqrt(var + 1e-5)  # LayerNorm, no affine
    x = x * gamma + beta

    x = conv1d(x, params["stem"]["w"], params["stem"]["b"], padding=3)
    for block, stride in zip(params["blocks"], up_ratios):
        x = decoder_block(x, block, stride)
    x = snake_filtered(x, params["final_act"]["alpha"], params["final_act"]["beta"])
    x = conv1d(x, params["out"]["w"], params["out"]["b"], padding=3)
    return jnp.tanh(x)


# ----- parameter construction ------------------------------------------


def _fvq_p(rng: jax.Array, dim: int = 256, codebook_dim: int = 8, codebook_size: int = 1024) -> Dict:
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "in_proj": {
            "w": (jax.random.normal(r1, (codebook_dim, dim)) * 0.02).astype(jnp.float32),
            "b": jnp.zeros((codebook_dim,), jnp.float32),
        },
        "out_proj": {
            "w": (jax.random.normal(r2, (dim, codebook_dim)) * 0.02).astype(jnp.float32),
            "b": jnp.zeros((dim,), jnp.float32),
        },
        "codebook": jax.random.normal(r3, (codebook_size, codebook_dim)).astype(jnp.float32),
    }


def init_decoder_params(
    rng: jax.Array,
    in_channels: int = 256,
    upsample_initial_channel: int = 1024,
    up_ratios: Sequence[int] = (5, 5, 4, 2),
    group_sizes: Sequence[int] = GROUP_SIZES,
) -> Dict:
    keys = iter(jax.random.split(rng, 128))
    params: Dict = {
        "quantizers": [
            [_fvq_p(next(keys), dim=in_channels) for _ in range(n)]
            for n in group_sizes
        ],
        "timbre_encoder": init_timbre_params(next(keys), d_model=in_channels),
        "timbre_linear": {
            "w": (jax.random.normal(next(keys), (2 * in_channels, in_channels)) * 0.02).astype(jnp.float32),
            # torch init: bias[:d] = 1 (gamma), bias[d:] = 0 (facodec.py:429-430)
            "b": jnp.concatenate(
                [jnp.ones((in_channels,)), jnp.zeros((in_channels,))]
            ).astype(jnp.float32),
        },
        "stem": _conv_p(next(keys), upsample_initial_channel, in_channels, 7),
        "blocks": [],
    }
    ch = upsample_initial_channel
    for i, stride in enumerate(up_ratios):
        input_dim = ch // (2 ** i)
        output_dim = ch // (2 ** (i + 1))
        # fan-in per output sample of a stride-s convT with k=2s is k/s=2
        # taps x input_dim channels (see encoder._conv_p on why scaled)
        up_std = 1.0 / float(np.sqrt(2 * input_dim))
        up_w = (jax.random.normal(next(keys), (input_dim, output_dim, 2 * stride)) * up_std).astype(jnp.float32)
        params["blocks"].append(
            {
                "act": _act_p(input_dim),
                "up": {"w": up_w, "b": jnp.zeros((output_dim,), jnp.float32)},
                "res": [_res_unit_p(next(keys), output_dim) for _ in range(3)],
            }
        )
    final_dim = ch // (2 ** len(up_ratios))
    params["final_act"] = _act_p(final_dim)
    params["out"] = _conv_p(next(keys), 1, final_dim, 7)
    # Small final init: the upsampling stack's activations reach O(10) at
    # fan-in-scaled init, which saturates the output tanh (|wav| == 1,
    # zero gradient).  Scaling the last conv keeps tanh in its linear
    # region at step 0; converted checkpoints overwrite this.
    params["out"]["w"] = params["out"]["w"] * 0.01
    return params
