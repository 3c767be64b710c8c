"""FaCodec timbre (speaker) encoder: 4-layer pre-LN transformer.

Re-design of the reference TransformerEncoder used as the timbre encoder
(flamed/models/facodec/transformer.py:35-235, constructed facodec.py:417-426
with use_cln=False).

One reference quirk is reproduced faithfully because the pretrained weights
were trained with it: ``PositionalEncoding`` indexes its (max_len, 1, d)
buffer with the *batch* dimension of a batch-first input
(transformer.py:49-51), so each batch element b receives the constant
sinusoid row for position b added to every frame — there is no actual
per-position encoding.  See ``batch_constant_positional_bias``.

Mask-awareness addition: the reference passes key_padding_mask=None at
inference (facodec.py:530) because it runs exact-length.  Under bucketing
we mask padded keys and use a masked mean for the final pooling, which
reproduces the exact-length result for valid frames.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from flamed_tts_tpu.ops.conv1d import conv1d

_NEG_INF = -1e9


def batch_constant_positional_bias(b: int, d_model: int, max_len: int = 5000) -> jnp.ndarray:
    """(B, 1, d) bias replicating pe[:B] of the reference buffer."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe[:b, None, :], dtype=jnp.float32)


def _layer_norm(x: jnp.ndarray, p: Dict, eps: float = 1e-5) -> jnp.ndarray:
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * p["g"] + p["b"]


def _mha(x: jnp.ndarray, p: Dict, n_head: int, pad_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """torch.nn.MultiheadAttention equivalent (packed qkv in_proj)."""
    b, l, d = x.shape
    qkv = x @ p["in_proj_w"].T + p["in_proj_b"]  # (B, L, 3d)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = d // n_head
    q = q.reshape(b, l, n_head, hd)
    k = k.reshape(b, l, n_head, hd)
    v = v.reshape(b, l, n_head, hd)
    scores = jnp.einsum("blhd,bmhd->bhlm", q, k) / jnp.sqrt(jnp.float32(hd))
    if pad_mask is not None:
        scores = jnp.where(pad_mask[:, None, None, :], _NEG_INF, scores)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhlm,bmhd->blhd", attn, v).reshape(b, l, d)
    return out @ p["out_proj_w"].T + p["out_proj_b"]


def timbre_encoder_forward(
    params: Dict,
    x: jnp.ndarray,                 # (B, T, 256) codec latents
    pad_mask: Optional[jnp.ndarray] = None,  # (B, T) True = pad
    n_head: int = 4,
    conv_kernel: int = 5,
) -> jnp.ndarray:
    """Returns the mean-pooled speaker embedding (B, 256)
    (reference facodec.py:529-532)."""
    b = x.shape[0]
    x = x + batch_constant_positional_bias(b, x.shape[-1])
    for layer in params["layers"]:
        residual = x
        h = _layer_norm(x, layer["ln1"])
        h = _mha(h, layer["attn"], n_head, pad_mask)
        x = residual + h
        residual = x
        h = _layer_norm(x, layer["ln2"])
        if pad_mask is not None:
            # The k=5 conv-FFN mixes adjacent frames: zero padded rows so
            # the window at the true boundary sees zeros, exactly like the
            # reference's exact-length conv zero padding.
            h = jnp.where(pad_mask[:, :, None], 0.0, h)
        h = conv1d(h, layer["ffn1"]["w"], layer["ffn1"]["b"], padding=conv_kernel // 2)
        h = jax.nn.relu(h)
        h = h @ layer["ffn2"]["w"].T + layer["ffn2"]["b"]
        x = residual + h
    x = _layer_norm(x, params["last_ln"])
    if pad_mask is not None:
        valid = (~pad_mask)[:, :, None].astype(x.dtype)
        return (x * valid).sum(axis=1) / jnp.maximum(valid.sum(axis=1), 1.0)
    return x.mean(axis=1)


def init_timbre_params(
    rng: jax.Array,
    d_model: int = 256,
    n_layers: int = 4,
    d_ffn: int = 1024,
    conv_kernel: int = 5,
) -> Dict:
    keys = iter(jax.random.split(rng, 4 * n_layers + 2))

    def lin(rin, c_out, c_in):
        return {
            "w": (jax.random.normal(rin, (c_out, c_in)) * 0.02).astype(jnp.float32),
            "b": jnp.zeros((c_out,), jnp.float32),
        }

    def ln():
        return {"g": jnp.ones((d_model,), jnp.float32), "b": jnp.zeros((d_model,), jnp.float32)}

    layers = []
    for _ in range(n_layers):
        attn_proj = lin(next(keys), 3 * d_model, d_model)
        out_proj = lin(next(keys), d_model, d_model)
        ffn1_w = (jax.random.normal(next(keys), (d_ffn, d_model, conv_kernel)) * 0.02).astype(jnp.float32)
        layers.append(
            {
                "ln1": ln(),
                "attn": {
                    "in_proj_w": attn_proj["w"],
                    "in_proj_b": attn_proj["b"],
                    "out_proj_w": out_proj["w"],
                    "out_proj_b": out_proj["b"],
                },
                "ln2": ln(),
                "ffn1": {"w": ffn1_w, "b": jnp.zeros((d_ffn,), jnp.float32)},
                "ffn2": lin(next(keys), d_model, d_ffn),
            }
        )
    return {"layers": layers, "last_ln": ln()}
