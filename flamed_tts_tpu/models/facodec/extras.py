"""FaCodec auxiliary components: training heads and VC variants.

Inventory parity with the reference (SURVEY §2.6) for pieces that no
Flamed entry point exercises but the codec release ships:

* ``gradient_reversal``       — GRL for adversarial probes
  (facodec/gradient_reversal.py)
* ``cnn_predictor``           — the "CNNLSTM" head (despite the name it is
  3 dilated residual units + filtered Snake + per-head Linear, no LSTM;
  facodec.py:35-54); used for F0/UV/phone/timbre probes
* factorized VQ *training* path — commitment/codebook losses +
  straight-through estimator (quantize/fvq.py:66-78)
* ``FACodecRedecoder``        — voice conversion: code re-embedding with a
  style-adaptive (cln) prosody transformer (facodec.py:664-831)
* ``FACodecEncoderV2`` / ``FACodecDecoderV2`` — prosody-from-mel variants
  (facodec.py:834-1285)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flamed_tts_tpu.models.facodec.encoder import (
    _act_p,
    _conv_p,
    _res_unit_p,
    residual_unit,
)
from flamed_tts_tpu.models.facodec.quantize import _linear, fvq_encode
from flamed_tts_tpu.models.facodec.timbre import (
    batch_constant_positional_bias,
    _layer_norm,
    _mha,
)
from flamed_tts_tpu.ops.conv1d import conv1d
from flamed_tts_tpu.ops.melspec import mel_spectrogram
from flamed_tts_tpu.ops.resample import snake_filtered


# --- gradient reversal ---------------------------------------------------

@jax.custom_vjp
def gradient_reversal(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    """Identity forward; backward multiplies the gradient by -alpha."""
    return x


def _gr_fwd(x, alpha):
    return x, alpha


def _gr_bwd(alpha, g):
    return (-alpha * g, None)


gradient_reversal.defvjp(_gr_fwd, _gr_bwd)


# --- CNN predictor head ("CNNLSTM") --------------------------------------

def cnn_predictor(
    x: jnp.ndarray,      # (B, T, C) channel-last
    params: Dict,
    global_pred: bool = False,
) -> List[jnp.ndarray]:
    """3 residual units (dilations 1, 2, 3) + filtered Snake, then one
    Linear per head (facodec.py:35-54)."""
    for unit, dilation in zip(params["res"], (1, 2, 3)):
        x = residual_unit(x, unit, dilation)
    x = snake_filtered(x, params["act"]["alpha"], params["act"]["beta"])
    if global_pred:
        x = x.mean(axis=1)
    return [x @ h["w"].T + h["b"] for h in params["heads"]]


def init_cnn_predictor(rng: jax.Array, indim: int, outdim: int, n_heads: int) -> Dict:
    keys = jax.random.split(rng, n_heads + 4)
    return {
        "res": [_res_unit_p(keys[i], indim) for i in range(3)],
        "act": _act_p(indim),
        "heads": [
            {
                "w": (jax.random.normal(keys[3 + i], (outdim, indim)) * 0.02).astype(jnp.float32),
                "b": jnp.zeros((outdim,), jnp.float32),
            }
            for i in range(n_heads)
        ],
    }


# --- FVQ training path ---------------------------------------------------

def fvq_train(
    x: jnp.ndarray, p: Dict, commitment: float = 0.005,
    normalized_losses: bool = False, center: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Training forward: (quantized w/ straight-through, codes, commit+
    codebook loss per batch element) — quantize/fvq.py:35-86 semantics.

    ``normalized_losses`` computes the commit/codebook terms on the
    L2-normalized vectors instead of raw space.  Code *selection* is
    normalized either way (fvq.py:101-116), so raw-space losses leave
    z_e scale unconstrained — growing z_e makes the codebook chase it
    quadratically (an observed runaway when training from scratch with
    auxiliary CE heads).  On the unit sphere both terms are bounded and
    scale drift is impossible; used by tools/train_codec.py."""
    z_e = _linear(x, p["in_proj"])  # (B, T, D)
    if center:
        # Batch-statistics whitening (stop-grad): recon/CE gradients drift
        # the shared z_e mean and collapse its covariance to rank ~1 much
        # faster than the codebook can track, so the normalized nearest-
        # neighbor degenerates to +-one direction (~2 live codes).  After
        # whitening, z_e is isotropic and the full codebook stays
        # selectable.  Whitening is affine, so the trainer folds
        # (mu, W) exactly into in_proj at save time and the plain
        # inference path (quantize.py::fvq_encode) sees the same geometry.
        z_e = _whiten_sg(z_e)
    codes, _ = _nearest(z_e, p["codebook"])
    z_q = jnp.take(p["codebook"], codes, axis=0)

    if normalized_losses:
        z_e_c = z_e / jnp.maximum(jnp.linalg.norm(z_e, axis=-1, keepdims=True), 1e-12)
        z_q_c = z_q / jnp.maximum(jnp.linalg.norm(z_q, axis=-1, keepdims=True), 1e-12)
        commitment = max(commitment, 0.25)  # VQ-VAE beta on the sphere
    else:
        z_e_c, z_q_c = z_e, z_q
    commit_loss = ((z_e_c - jax.lax.stop_gradient(z_q_c)) ** 2).mean(axis=(1, 2)) * commitment
    codebook_loss = ((z_q_c - jax.lax.stop_gradient(z_e_c)) ** 2).mean(axis=(1, 2))
    loss = commit_loss + codebook_loss

    z_q = z_e + jax.lax.stop_gradient(z_q - z_e)  # straight-through
    z_q = _linear(z_q, p["out_proj"])
    return z_q, codes, loss


def _whiten_sg(z_e: jnp.ndarray) -> jnp.ndarray:
    """Whiten (B, T, D) with stop-gradient batch statistics: zero mean,
    ~identity covariance over the flattened (B*T) samples.

    The inverse square root uses a Newton-Schulz iteration (pure
    matmuls): jnp.linalg.eigh inside jit produced sporadic NaNs on the
    TPU backend for near-degenerate 8x8 covariances, which then poisoned
    the training state through the dead-code revival path."""
    flat = z_e.reshape(-1, z_e.shape[-1])
    d = flat.shape[-1]
    mu = jax.lax.stop_gradient(flat.mean(0))
    zc = flat - mu
    cov = jax.lax.stop_gradient((zc.T @ zc) / zc.shape[0])
    eye = jnp.eye(d, dtype=cov.dtype)
    tr = jnp.trace(cov)
    cov = cov + (1e-3 * tr / d + 1e-8) * eye  # conditioning floor
    t = jnp.trace(cov)
    y = cov / t
    z = eye
    for _ in range(25):  # eigenvalues of y in (0, 1]: globally convergent
        s = 0.5 * (3.0 * eye - z @ y)
        y = y @ s
        z = s @ z
    w = jax.lax.stop_gradient(z / jnp.sqrt(t))  # cov^{-1/2}
    # fp32 safety net: if the iteration ever emits a non-finite entry
    # (extreme batch covariances), fall back to isotropic variance
    # scaling for this batch instead of poisoning the whole loss.
    iso = eye / jnp.sqrt(jnp.maximum(t / d, 1e-12))
    w = jnp.where(jnp.isfinite(w).all(), w, iso)
    return (zc @ w).reshape(z_e.shape)


def whitening_fold(w_in: "np.ndarray", b_in: "np.ndarray", z_samples: "np.ndarray",
                   eps: float = 1e-5):
    """Fold the _whiten_sg transform measured on ``z_samples`` (N, D)
    into an affine in_proj (numpy): returns (w', b') such that
    in_proj'(x) == whiten(in_proj(x)) for the sample statistics."""
    mu = z_samples.mean(0)
    zc = z_samples - mu
    cov = (zc.T @ zc) / len(zc)
    evals, evecs = np.linalg.eigh(cov + eps * np.eye(cov.shape[0]))
    w = evecs @ np.diag(1.0 / np.sqrt(np.maximum(evals, eps))) @ evecs.T
    return w.T @ w_in, (b_in - mu) @ w


def _nearest(z_e: jnp.ndarray, codebook: jnp.ndarray):
    z_n = z_e / jnp.maximum(jnp.linalg.norm(z_e, axis=-1, keepdims=True), 1e-12)
    c_n = codebook / jnp.maximum(jnp.linalg.norm(codebook, axis=-1, keepdims=True), 1e-12)
    sim = jnp.einsum("btd,nd->btn", z_n, c_n)
    codes = jnp.argmax(sim, axis=-1).astype(jnp.int32)
    return codes, sim


def rvq_train(
    x: jnp.ndarray,
    layers: List[Dict],
    rng: Optional[jax.Array] = None,
    quantizer_dropout: float = 0.0,
    normalized_losses: bool = False,
    center: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Residual VQ training loop with per-sample quantizer dropout
    (quantize/rvq.py:27-73): returns (quantized_out, codes, losses,
    per-layer quantized)."""
    b = x.shape[0]
    n_layers = len(layers)
    if rng is not None and quantizer_dropout > 0:
        r1, r2 = jax.random.split(rng)
        n_q = jnp.full((b,), n_layers + 1, dtype=jnp.int32)
        dropout = jax.random.randint(r1, (b,), 1, n_layers + 1)
        n_dropout = int(b * quantizer_dropout)
        n_q = n_q.at[:n_dropout].set(dropout[:n_dropout])
    else:
        n_q = jnp.full((b,), n_layers + 1, dtype=jnp.int32)

    residual = x
    quantized_out = jnp.zeros_like(x)
    codes, losses, per_layer = [], [], []
    for idx, layer in enumerate(layers):
        z_q, c, loss = fvq_train(residual, layer,
                                 normalized_losses=normalized_losses,
                                 center=center)
        mask = (idx < n_q).astype(x.dtype)
        residual = residual - z_q
        quantized_out = quantized_out + z_q * mask[:, None, None]
        losses.append((loss * mask).mean())
        codes.append(c)
        per_layer.append(z_q)
    return (
        quantized_out,
        jnp.stack(codes, axis=0),
        jnp.stack(losses, axis=0),
        jnp.stack(per_layer, axis=0),
    )


# --- codec training-mode forward ------------------------------------------

def analyze_train(
    params: Dict,
    latents: jnp.ndarray,            # (B, T, 256)
    rng: Optional[jax.Array] = None,
    quantizer_dropout: float = 0.0,
    normalized_losses: bool = False,
    center: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, List[jnp.ndarray], jnp.ndarray]:
    """Training-mode analysis (facodec.py:470-533 with eval_vq=False):
    the 3 RVQ groups run their *training* path (straight-through +
    commit/codebook losses + optional quantizer dropout) and the residual
    group quantizes x - stop_grad(prosody + content).

    Returns (quantized_sum, codes (6,B,T), commit_losses (6,),
    quantized_buf [3 x (B,T,256)], timbre (B,256))."""
    from flamed_tts_tpu.models.facodec.timbre import timbre_encoder_forward

    rngs = jax.random.split(rng, 3) if rng is not None else (None, None, None)
    outs = 0.0
    codes, losses, buf = [], [], []
    x = latents
    for gi in range(2):  # prosody, content
        q_out, q_codes, q_losses, per_layer = rvq_train(
            x, params["quantizers"][gi], rngs[gi], quantizer_dropout,
            normalized_losses=normalized_losses, center=center,
        )
        outs = outs + q_out
        codes.append(q_codes)
        losses.append(q_losses)
        buf.append(per_layer.sum(0))
    residual_in = x - jax.lax.stop_gradient(buf[0] + buf[1])
    q_out, q_codes, q_losses, per_layer = rvq_train(
        residual_in, params["quantizers"][2], rngs[2], quantizer_dropout,
        normalized_losses=normalized_losses, center=center,
    )
    outs = outs + q_out
    codes.append(q_codes)
    losses.append(q_losses)
    buf.append(per_layer.sum(0))

    timbre = timbre_encoder_forward(params["timbre_encoder"], latents, None)
    return (
        outs,
        jnp.concatenate(codes, axis=0),
        jnp.concatenate(losses, axis=0),
        buf,
        timbre,
    )


def decoder_training_forward(
    params: Dict,
    heads: Dict,
    quantized: Sequence[jnp.ndarray],   # [3 x (B, T, 256)] per-group sums
    speaker_embedding: jnp.ndarray,     # (B, 256)
    rng: Optional[jax.Array] = None,
    prob_random_mask_residual: float = 0.75,
    use_gr_residual_f0: bool = False,
    use_gr_residual_phone: bool = False,
    use_gr_x_timbre: bool = False,
    up_ratios: Sequence[int] = (5, 5, 4, 2),
) -> Dict[str, jnp.ndarray]:
    """FACodecDecoder.forward(vq=False) — the codec *training* decode
    (facodec.py:575-620): predictor heads on the quantized groups, random
    residual masking with p=0.75, timbre-affine norm, synthesis stack.

    No Flamed entry point trains the codec (decoder.py docstring), but the
    reference ships this path; kept for component parity."""
    out: Dict[str, jnp.ndarray] = {}
    f0, uv = cnn_predictor(quantized[0], heads["f0_predictor"])
    out["f0"], out["uv"] = f0[..., 0], uv[..., 0]
    (out["phone"],) = cnn_predictor(quantized[1], heads["phone_predictor"])

    if use_gr_residual_f0:
        h = gradient_reversal(quantized[2], 1.0)
        res_f0, res_uv = cnn_predictor(h, heads["res_f0_predictor"])
        out["res_f0"], out["res_uv"] = res_f0[..., 0], res_uv[..., 0]
    if use_gr_residual_phone:
        h = gradient_reversal(quantized[2], 1.0)
        (out["res_phone"],) = cnn_predictor(h, heads["res_phone_predictor"])

    # Random residual masking: with prob p the whole residual group is
    # dropped for this batch element (facodec.py:575-595).
    if rng is not None:
        keep = (
            jax.random.uniform(rng, (quantized[2].shape[0], 1, 1))
            >= prob_random_mask_residual
        ).astype(quantized[2].dtype)
    else:
        keep = jnp.ones((quantized[2].shape[0], 1, 1), quantized[2].dtype)
    x = (
        jax.lax.stop_gradient(quantized[0])
        + jax.lax.stop_gradient(quantized[1])
        + quantized[2] * keep
    )

    if use_gr_x_timbre:
        h = gradient_reversal(x, 1.0)
        (out["x_timbre"],) = cnn_predictor(h, heads["x_timbre_predictor"], global_pred=True)

    from flamed_tts_tpu.models.facodec.decoder import synthesize

    out["audio"] = synthesize(params, x, speaker_embedding, up_ratios=up_ratios)
    return out


def init_decoder_training_heads(
    rng: jax.Array,
    in_channels: int = 256,
    phone_classes: int = 5003,
    speaker_classes: int = 245200,
    use_gr_residual_f0: bool = False,
    use_gr_residual_phone: bool = False,
    use_gr_x_timbre: bool = False,
) -> Dict:
    """Head shapes match the reference constructor (facodec.py:436-466):
    f0 = CNNLSTM(256, 1, 2), phone = CNNLSTM(256, 5003, 1),
    x-timbre = CNNLSTM(256, 245200, 1, global)."""
    keys = iter(jax.random.split(rng, 8))
    heads = {
        "f0_predictor": init_cnn_predictor(next(keys), in_channels, 1, 2),
        "phone_predictor": init_cnn_predictor(next(keys), in_channels, phone_classes, 1),
    }
    if use_gr_residual_f0:
        heads["res_f0_predictor"] = init_cnn_predictor(next(keys), in_channels, 1, 2)
    if use_gr_residual_phone:
        heads["res_phone_predictor"] = init_cnn_predictor(
            next(keys), in_channels, phone_classes, 1
        )
    if use_gr_x_timbre:
        heads["x_timbre_predictor"] = init_cnn_predictor(
            next(keys), in_channels, speaker_classes, 1
        )
    return heads


# --- style-adaptive (cln) transformer ------------------------------------

def _style_adaptive_ln(x: jnp.ndarray, p: Dict, condition: jnp.ndarray) -> jnp.ndarray:
    """StyleAdaptiveLayerNorm (facodec/transformer.py:13-32): gamma/beta
    from the mean-pooled condition."""
    style = condition.mean(axis=1, keepdims=True) @ p["w"].T + p["b"]
    gamma, beta = jnp.split(style, 2, axis=-1)
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return gamma * ((x - mean) / jnp.sqrt(var + 1e-5)) + beta


def cln_transformer_forward(
    params: Dict,
    x: jnp.ndarray,            # (B, T, d)
    condition: jnp.ndarray,    # (B, T, d) (speaker embedding broadcast)
    pad_mask: Optional[jnp.ndarray] = None,
    n_head: int = 4,
    conv_kernel: int = 5,
) -> jnp.ndarray:
    """TransformerEncoder with use_cln=True (facodec/transformer.py:154-234),
    returning per-frame features."""
    b = x.shape[0]
    x = x + batch_constant_positional_bias(b, x.shape[-1])
    for layer in params["layers"]:
        residual = x
        h = _style_adaptive_ln(x, layer["ln1"], condition)
        h = _mha(h, layer["attn"], n_head, pad_mask)
        x = residual + h
        residual = x
        h = _style_adaptive_ln(x, layer["ln2"], condition)
        if pad_mask is not None:
            h = jnp.where(pad_mask[:, :, None], 0.0, h)
        h = conv1d(h, layer["ffn1"]["w"], layer["ffn1"]["b"], padding=conv_kernel // 2)
        h = jax.nn.relu(h)
        h = h @ layer["ffn2"]["w"].T + layer["ffn2"]["b"]
        x = residual + h
    return _style_adaptive_ln(x, params["last_ln"], condition)


def init_cln_transformer(rng: jax.Array, d_model: int = 256, n_layers: int = 4,
                         d_ffn: int = 1024, conv_kernel: int = 5) -> Dict:
    keys = iter(jax.random.split(rng, 8 * n_layers + 2))

    def lin(r, c_out, c_in):
        return {
            "w": (jax.random.normal(r, (c_out, c_in)) * 0.02).astype(jnp.float32),
            "b": jnp.zeros((c_out,), jnp.float32),
        }

    def sln(r):
        p = lin(r, 2 * d_model, d_model)
        # torch init: bias[:d]=1 (gamma), bias[d:]=0 (transformer.py:19-20)
        p["b"] = jnp.concatenate([jnp.ones(d_model), jnp.zeros(d_model)]).astype(jnp.float32)
        return p

    layers = []
    for _ in range(n_layers):
        qkv = lin(next(keys), 3 * d_model, d_model)
        out = lin(next(keys), d_model, d_model)
        ffn1_w = (jax.random.normal(next(keys), (d_ffn, d_model, conv_kernel)) * 0.02).astype(jnp.float32)
        layers.append(
            {
                "ln1": sln(next(keys)),
                "attn": {
                    "in_proj_w": qkv["w"], "in_proj_b": qkv["b"],
                    "out_proj_w": out["w"], "out_proj_b": out["b"],
                },
                "ln2": sln(next(keys)),
                "ffn1": {"w": ffn1_w, "b": jnp.zeros((d_ffn,), jnp.float32)},
                "ffn2": lin(next(keys), d_model, d_ffn),
            }
        )
    return {"layers": layers, "last_ln": sln(next(keys))}


# --- FACodecRedecoder (voice conversion) ---------------------------------

def redecoder_forward(
    params: Dict,
    codes: jnp.ndarray,          # (6, B, T) int
    speaker_embedding: jnp.ndarray,  # (B, 256)
    use_residual_code: bool = False,
    up_ratios: Sequence[int] = (5, 5, 4, 2),
    group_sizes: Sequence[int] = (1, 2, 3),
) -> jnp.ndarray:
    """Codes + new speaker -> waveform (facodec.py:753-794): prosody codes
    are re-embedded through a timbre-conditioned (cln) transformer so the
    prosody adapts to the target voice."""
    n_p, n_c, n_r = group_sizes
    x_p = sum(jnp.take(params["prosody_embs"][i], codes[i], axis=0) for i in range(n_p))
    spk_cond = jnp.broadcast_to(
        speaker_embedding[:, None, :], (x_p.shape[0], x_p.shape[1], speaker_embedding.shape[-1])
    )
    x_p = cln_transformer_forward(params["prosody_enc"], x_p, spk_cond)
    x = x_p
    x = x + sum(
        jnp.take(params["content_embs"][i], codes[n_p + i], axis=0) for i in range(n_c)
    )
    if use_residual_code:
        x = x + sum(
            jnp.take(params["residual_embs"][i], codes[n_p + n_c + i], axis=0)
            for i in range(n_r)
        )

    from flamed_tts_tpu.models.facodec.decoder import synthesize

    return synthesize(params["synth"], x, speaker_embedding, up_ratios=up_ratios)


def init_redecoder_params(
    rng: jax.Array,
    in_channels: int = 256,
    upsample_initial_channel: int = 1280,
    up_ratios: Sequence[int] = (5, 5, 4, 2),
    codebook_sizes: Sequence[int] = (1024, 1024, 1024),
    group_sizes: Sequence[int] = (1, 2, 3),
) -> Dict:
    from flamed_tts_tpu.models.facodec.decoder import init_decoder_params

    keys = iter(jax.random.split(rng, 16))
    synth = init_decoder_params(
        next(keys), in_channels=in_channels,
        upsample_initial_channel=upsample_initial_channel, up_ratios=up_ratios,
    )
    # Only the synthesis-stack + timbre-affine parts are used by the
    # redecoder; drop the analysis pieces.
    synth = {k: synth[k] for k in ("timbre_linear", "stem", "blocks", "final_act", "out")}

    def embs(r, n):
        return [
            (jax.random.normal(jax.random.fold_in(r, i), (codebook_sizes[0], in_channels)) * 1e-5).astype(jnp.float32)
            for i in range(n)
        ]

    return {
        "prosody_embs": embs(next(keys), group_sizes[0]),
        "content_embs": embs(next(keys), group_sizes[1]),
        "residual_embs": embs(next(keys), group_sizes[2]),
        "prosody_enc": init_cln_transformer(next(keys), d_model=in_channels),
        "synth": synth,
    }


# --- V2 encoder/decoder (prosody from mel) -------------------------------

def encoder_v2_prosody_feature(wav: jnp.ndarray) -> jnp.ndarray:
    """First 20 log-mel bins (facodec.py:883-884): (B, 20, frames)."""
    return mel_spectrogram(wav)[:, :20, :]


def decoder_v2_quantize(
    params: Dict,
    latents: jnp.ndarray,          # (B, T, 256)
    prosody_feature: jnp.ndarray,  # (B, 20, T)
    pad_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """V2 analysis (facodec.py:1089-1156): the prosody branch quantizes a
    mel-derived feature (melspec_linear + transformer) instead of the raw
    latents; content/residual and the timbre encoder are as in V1."""
    from flamed_tts_tpu.models.facodec.quantize import rvq_encode
    from flamed_tts_tpu.models.facodec.timbre import timbre_encoder_forward

    f0_in = jnp.transpose(prosody_feature, (0, 2, 1))  # (B, T, 20)
    f0_in = f0_in @ params["melspec_linear"]["w"].T + params["melspec_linear"]["b"]
    f0_in = _melspec_encode(params["melspec_encoder"], f0_in, pad_mask)

    prosody_codes, prosody_q = rvq_encode(f0_in, params["quantizers"][0])
    content_codes, content_q = rvq_encode(latents, params["quantizers"][1])
    residual_in = latents - (prosody_q + content_q)
    residual_codes, _ = rvq_encode(residual_in, params["quantizers"][2])
    codes = jnp.concatenate([prosody_codes, content_codes, residual_codes], axis=0)
    timbre = timbre_encoder_forward(params["timbre_encoder"], latents, pad_mask)
    return codes, timbre


def encoder_v2_forward(
    params: Dict, wav: jnp.ndarray, up_ratios: Sequence[int] = (2, 4, 5, 5)
) -> jnp.ndarray:
    """FACodecEncoderV2.forward (facodec.py:876-880): identical conv
    topology to V1 — only the out-channel width differs (via params)."""
    from flamed_tts_tpu.models.facodec.encoder import encoder_forward

    return encoder_forward(params, wav, up_ratios=up_ratios)


def decoder_v2_vq2emb(params: Dict, codes: jnp.ndarray, use_residual: bool = True) -> jnp.ndarray:
    """FACodecDecoderV2.vq2emb (facodec.py:1243-1253): same group layout
    as V1."""
    from flamed_tts_tpu.models.facodec.decoder import vq2emb

    return vq2emb(params, codes, use_residual=use_residual)


def decoder_v2_inference(
    params: Dict,
    latents: jnp.ndarray,
    speaker_embedding: jnp.ndarray,
    up_ratios: Sequence[int] = (5, 5, 4, 2),
) -> jnp.ndarray:
    """FACodecDecoderV2.inference (facodec.py:1255-1263): V1 synthesis."""
    from flamed_tts_tpu.models.facodec.decoder import synthesize

    return synthesize(params, latents, speaker_embedding, up_ratios=up_ratios)


def v2_voice_conversion(
    enc_params: Dict,
    dec_params: Dict,
    source_wav: jnp.ndarray,          # (B, T, 1)
    target_wav: jnp.ndarray,          # (B, T', 1)
    enc_up_ratios: Sequence[int] = (2, 4, 5, 5),
    dec_up_ratios: Sequence[int] = (5, 5, 4, 2),
    use_residual: bool = False,
) -> jnp.ndarray:
    """End-to-end V2 voice conversion (the reference assembles this from
    FACodecEncoderV2 + FACodecDecoderV2, facodec.py:834-1285): source
    prosody (from mel) + content codes are re-synthesized with the target
    speaker's timbre.  Residual codes carry source-speaker detail and are
    dropped by default."""
    src_latents = encoder_v2_forward(enc_params, source_wav, enc_up_ratios)
    src_prosody = encoder_v2_prosody_feature(source_wav[:, :, 0])
    # Mel frames can overshoot the codec frame count by the centering
    # convention; align to the latent grid as the reference data path does.
    src_prosody = src_prosody[:, :, : src_latents.shape[1]]
    codes, _src_spk = decoder_v2_quantize(dec_params, src_latents, src_prosody)

    tgt_latents = encoder_v2_forward(enc_params, target_wav, enc_up_ratios)
    from flamed_tts_tpu.models.facodec.timbre import timbre_encoder_forward

    tgt_spk = timbre_encoder_forward(dec_params["timbre_encoder"], tgt_latents, None)

    x = decoder_v2_vq2emb(dec_params, codes, use_residual=use_residual)
    return decoder_v2_inference(dec_params, x, tgt_spk, dec_up_ratios)


def _melspec_encode(enc_params: Dict, x: jnp.ndarray, pad_mask) -> jnp.ndarray:
    """Per-frame output of a plain (non-cln) transformer encoder — the V2
    melspec encoder returns features, not a pooled vector."""
    b = x.shape[0]
    x = x + batch_constant_positional_bias(b, x.shape[-1])
    for layer in enc_params["layers"]:
        residual = x
        h = _layer_norm(x, layer["ln1"])
        h = _mha(h, layer["attn"], 4, pad_mask)
        x = residual + h
        residual = x
        h = _layer_norm(x, layer["ln2"])
        if pad_mask is not None:
            h = jnp.where(pad_mask[:, :, None], 0.0, h)
        h = conv1d(h, layer["ffn1"]["w"], layer["ffn1"]["b"], padding=2)
        h = jax.nn.relu(h)
        h = h @ layer["ffn2"]["w"].T + layer["ffn2"]["b"]
        x = residual + h
    return _layer_norm(x, enc_params["last_ln"])
