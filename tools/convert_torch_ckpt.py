#!/usr/bin/env python3
"""Convert PyTorch reference checkpoints to flamed_tts_tpu param pytrees.

Three artifact kinds (reference: synthesize.py:71-74, flamed.py:24-39):

* FaCodec encoder state_dict  (ns3_facodec_encoder.bin)
* FaCodec decoder state_dict  (ns3_facodec_decoder.bin)
* Flamed model checkpoint     (Lightning ckpt with 'state_dict', or a bare
  weight dict when saved weights-only)

Conversions applied:
* weight-norm folding: weight = g * v / ||v||  (facodec.py:27-32)
* torch Linear (out, in)      -> flax Dense kernel (in, out)
* torch Conv1d (O, I/g, K)    -> flax Conv kernel (K, I/g, O)
* torch Embedding             -> flax Embed 'embedding' (identity)
* torch LayerNorm weight/bias -> flax 'scale'/'bias'
* FaCodec convs keep torch layout (our codec ops consume it directly)

Usage:
  python tools/convert_torch_ckpt.py --kind codec-encoder IN.bin OUT.npz
  python tools/convert_torch_ckpt.py --kind codec-decoder IN.bin OUT.npz
  python tools/convert_torch_ckpt.py --kind flamed IN.ckpt OUT.npz
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Any, Dict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from flamed_tts_tpu.ops.conv1d import fold_weight_norm
from flamed_tts_tpu.runtime.pytree_io import save_pytree_npz


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _wn_conv(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    """Weight-normed conv/linear -> folded {'w','b'} (torch layout)."""
    if f"{prefix}.weight_v" in sd:
        w = fold_weight_norm(_np(sd[f"{prefix}.weight_v"]), _np(sd[f"{prefix}.weight_g"]))
    # torch >= 2.1 parametrized naming
    elif f"{prefix}.parametrizations.weight.original1" in sd:
        w = fold_weight_norm(
            _np(sd[f"{prefix}.parametrizations.weight.original1"]),
            _np(sd[f"{prefix}.parametrizations.weight.original0"]),
        )
    else:
        w = _np(sd[f"{prefix}.weight"]).astype(np.float32)
    out = {"w": w}
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"]).astype(np.float32)
    return out


def _act(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "alpha": _np(sd[f"{prefix}.alpha"]).astype(np.float32),
        "beta": _np(sd[f"{prefix}.beta"]).astype(np.float32),
    }


def _res_unit(sd: Dict, prefix: str) -> Dict[str, Any]:
    """ResidualUnit.block = [Activation1d, WNConv1d, Activation1d, WNConv1d]."""
    return {
        "act1": _act(sd, f"{prefix}.block.0.act"),
        "conv1": _wn_conv(sd, f"{prefix}.block.1"),
        "act2": _act(sd, f"{prefix}.block.2.act"),
        "conv2": _wn_conv(sd, f"{prefix}.block.3"),
    }


def convert_facodec_encoder(sd: Dict) -> Dict[str, Any]:
    """Encoder Sequential: [stem, EncBlock x4, Activation1d, out]
    (facodec.py:194-210)."""
    params: Dict[str, Any] = {"stem": _wn_conv(sd, "block.0"), "blocks": []}
    for i in range(1, 5):
        block = {
            "res": [_res_unit(sd, f"block.{i}.block.{j}") for j in range(3)],
            "act": _act(sd, f"block.{i}.block.3.act"),
            "down": _wn_conv(sd, f"block.{i}.block.4"),
        }
        params["blocks"].append(block)
    params["final_act"] = _act(sd, "block.5.act")
    params["out"] = _wn_conv(sd, "block.6")
    return params


def _fvq(sd: Dict, prefix: str) -> Dict[str, Any]:
    in_proj = _wn_conv(sd, f"{prefix}.in_proj")
    out_proj = _wn_conv(sd, f"{prefix}.out_proj")
    return {
        "in_proj": in_proj,
        "out_proj": out_proj,
        "codebook": _np(sd[f"{prefix}._codebook.weight"]).astype(np.float32),
    }


def _timbre_encoder(sd: Dict, prefix: str, n_layers: int = 4) -> Dict[str, Any]:
    layers = []
    for i in range(n_layers):
        lp = f"{prefix}.layers.{i}"
        layers.append(
            {
                "ln1": {
                    "g": _np(sd[f"{lp}.ln_1.weight"]).astype(np.float32),
                    "b": _np(sd[f"{lp}.ln_1.bias"]).astype(np.float32),
                },
                "attn": {
                    "in_proj_w": _np(sd[f"{lp}.self_attn.in_proj_weight"]).astype(np.float32),
                    "in_proj_b": _np(sd[f"{lp}.self_attn.in_proj_bias"]).astype(np.float32),
                    "out_proj_w": _np(sd[f"{lp}.self_attn.out_proj.weight"]).astype(np.float32),
                    "out_proj_b": _np(sd[f"{lp}.self_attn.out_proj.bias"]).astype(np.float32),
                },
                "ln2": {
                    "g": _np(sd[f"{lp}.ln_2.weight"]).astype(np.float32),
                    "b": _np(sd[f"{lp}.ln_2.bias"]).astype(np.float32),
                },
                "ffn1": {
                    "w": _np(sd[f"{lp}.ffn.ffn_1.weight"]).astype(np.float32),
                    "b": _np(sd[f"{lp}.ffn.ffn_1.bias"]).astype(np.float32),
                },
                "ffn2": {
                    "w": _np(sd[f"{lp}.ffn.ffn_2.weight"]).astype(np.float32),
                    "b": _np(sd[f"{lp}.ffn.ffn_2.bias"]).astype(np.float32),
                },
            }
        )
    return {
        "layers": layers,
        "last_ln": {
            "g": _np(sd[f"{prefix}.last_ln.weight"]).astype(np.float32),
            "b": _np(sd[f"{prefix}.last_ln.bias"]).astype(np.float32),
        },
    }


def convert_facodec_decoder(sd: Dict) -> Dict[str, Any]:
    """Decoder: quantizers + timbre encoder + synthesis stack
    (facodec.py:305-468)."""
    group_sizes = (1, 2, 3)
    params: Dict[str, Any] = {
        "quantizers": [
            [_fvq(sd, f"quantizer.{g}.layers.{q}") for q in range(n)]
            for g, n in enumerate(group_sizes)
        ],
        "timbre_encoder": _timbre_encoder(sd, "timbre_encoder"),
        "timbre_linear": {
            "w": _np(sd["timbre_linear.weight"]).astype(np.float32),
            "b": _np(sd["timbre_linear.bias"]).astype(np.float32),
        },
        "stem": _wn_conv(sd, "model.0"),
        "blocks": [],
    }
    for i in range(1, 5):
        params["blocks"].append(
            {
                "act": _act(sd, f"model.{i}.block.0.act"),
                "up": _wn_conv(sd, f"model.{i}.block.1"),
                "res": [_res_unit(sd, f"model.{i}.block.{j}") for j in range(2, 5)],
            }
        )
    params["final_act"] = _act(sd, "model.5.act")
    params["out"] = _wn_conv(sd, "model.6")
    return params


def convert_cnn_predictor(sd: Dict, prefix: str, n_heads: int) -> Dict[str, Any]:
    """CNNLSTM head (facodec.py:35-54): 3 residual units + Activation1d +
    Linear heads.  ``prefix`` addresses the CNNLSTM module itself (add
    '.1' for GradientReversal-wrapped heads)."""
    return {
        "res": [_res_unit(sd, f"{prefix}.model.{j}") for j in range(3)],
        "act": _act(sd, f"{prefix}.model.3.act"),
        "heads": [
            {
                "w": _np(sd[f"{prefix}.heads.{i}.weight"]).astype(np.float32),
                "b": _np(sd[f"{prefix}.heads.{i}.bias"]).astype(np.float32),
            }
            for i in range(n_heads)
        ],
    }


def convert_decoder_training_heads(sd: Dict, phone_classes: int = 5003) -> Dict[str, Any]:
    """Predictor heads of FACodecDecoder(.V2) for the training forward
    (facodec.py:436-466); GR-wrapped heads live under '<name>.1'."""
    heads = {
        "f0_predictor": convert_cnn_predictor(sd, "f0_predictor", 2),
        "phone_predictor": convert_cnn_predictor(sd, "phone_predictor", 1),
    }
    for name, n in (
        ("res_f0_predictor", 2),
        ("res_phone_predictor", 1),
        ("x_timbre_predictor", 1),
    ):
        if f"{name}.1.heads.0.bias" in sd:
            heads[name] = convert_cnn_predictor(sd, f"{name}.1", n)
    return heads


def convert_facodec_encoder_v2(sd: Dict) -> Dict[str, Any]:
    """FACodecEncoderV2 (facodec.py:834-907): identical conv topology to
    V1 (stem + 4 EncoderBlocks + Activation1d + out conv); the
    mel_transform has no parameters."""
    return convert_facodec_encoder(sd)


def convert_facodec_decoder_v2(sd: Dict) -> Dict[str, Any]:
    """FACodecDecoderV2 (facodec.py:910-1285): V1 layout plus the
    prosody-from-mel branch (melspec_linear 20->256 + 4-layer transformer
    encoder)."""
    params = convert_facodec_decoder(sd)
    params["melspec_linear"] = {
        "w": _np(sd["melspec_linear.weight"]).astype(np.float32),
        "b": _np(sd["melspec_linear.bias"]).astype(np.float32),
    }
    params["melspec_encoder"] = _timbre_encoder(sd, "melspec_encoder")
    return params


# ----- Flamed model checkpoint ------------------------------------------


def _dense(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).astype(np.float32).T,
        "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def _conv_flax(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{prefix}.weight"]).astype(np.float32)  # (O, I/g, K)
    return {
        "kernel": np.transpose(w, (2, 1, 0)),
        "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def _conv1x1_as_dense(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{prefix}.weight"]).astype(np.float32)  # (O, I, 1)
    return {
        "kernel": w[:, :, 0].T,
        "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def _ln(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]).astype(np.float32),
        "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def _embed(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"embedding": _np(sd[f"{prefix}.weight"]).astype(np.float32)}


def _fft_layer(sd: Dict, prefix: str) -> Dict[str, Any]:
    return {
        "slf_attn": {
            "w_qs": _dense(sd, f"{prefix}.slf_attn.w_qs"),
            "w_ks": _dense(sd, f"{prefix}.slf_attn.w_ks"),
            "w_vs": _dense(sd, f"{prefix}.slf_attn.w_vs"),
            "fc": _dense(sd, f"{prefix}.slf_attn.fc"),
            "layer_norm": _ln(sd, f"{prefix}.slf_attn.layer_norm"),
        },
        "pos_ffn": {
            "w_1": _conv_flax(sd, f"{prefix}.pos_ffn.w_1"),
            "w_2": _conv_flax(sd, f"{prefix}.pos_ffn.w_2"),
            "layer_norm": _ln(sd, f"{prefix}.pos_ffn.layer_norm"),
        },
    }


def _fft_stack(sd: Dict, prefix: str, n_layers: int) -> Dict[str, Any]:
    return {
        f"layer_{i}": _fft_layer(sd, f"{prefix}.layer_stack.{i}")
        for i in range(n_layers)
    }


def _count_layers(sd: Dict, prefix: str) -> int:
    pattern = re.compile(re.escape(prefix) + r"\.layer_stack\.(\d+)\.")
    indices = {int(m.group(1)) for k in sd for m in [pattern.match(k)] if m}
    return max(indices) + 1 if indices else 0


def _prob_module(sd: Dict, prefix: str) -> Dict[str, Any]:
    """PVA ProbabilisticModule (pva.py:173-238) -> our module tree."""
    return {
        "proj": _dense(sd, f"{prefix}.proj"),
        "time_emb": {
            "mlp_1": _dense(sd, f"{prefix}.time_emb.time_emb.1"),
            "mlp_3": _dense(sd, f"{prefix}.time_emb.time_emb.3"),
        },
        "conv1d_1": _conv_flax(sd, f"{prefix}.conv_layer.conv1d_1.conv"),
        "layer_norm_1": _ln(sd, f"{prefix}.conv_layer.layer_norm_1"),
        "conv1d_2": _conv_flax(sd, f"{prefix}.conv_layer.conv1d_2.conv"),
        "layer_norm_2": _ln(sd, f"{prefix}.conv_layer.layer_norm_2"),
        "linear_layer": _dense(sd, f"{prefix}.linear_layer"),
    }


def convert_prior_generator(sd: Dict, prefix: str = "prior_generator") -> Dict[str, Any]:
    n_enc = _count_layers(sd, f"{prefix}.encoder")
    n_shared = _count_layers(sd, f"{prefix}.shared_decoder")
    params: Dict[str, Any] = {
        "src_word_emb": _embed(sd, f"{prefix}.encoder.src_word_emb"),
        "encoder": _fft_stack(sd, f"{prefix}.encoder", n_enc),
        "duration_generator": _prob_module(sd, f"{prefix}.pva.duration_generator"),
        "sil_generator": _prob_module(sd, f"{prefix}.pva.sil_generator"),
        "bridge": _dense(sd, f"{prefix}.bridge"),
        "code_embedding": _embed(sd, f"{prefix}.code_embedding"),
        "shared_decoder": _fft_stack(sd, f"{prefix}.shared_decoder", n_shared),
        "prompt_seg_emb": _np(sd[f"{prefix}.pre_encode.prompt_emb"]).astype(np.float32),
        "target_seg_emb": _np(sd[f"{prefix}.pre_encode.target_emb"]).astype(np.float32),
        "quantizer_emb": _embed(sd, f"{prefix}.pre_encode.quantizer_emb"),
        "head": _dense(sd, f"{prefix}.head"),
    }
    q = 0
    while _count_layers(sd, f"{prefix}.prior_decoder.{q}"):
        params[f"prior_decoder_{q}"] = _fft_stack(
            sd, f"{prefix}.prior_decoder.{q}",
            _count_layers(sd, f"{prefix}.prior_decoder.{q}"),
        )
        q += 1
    return params


def _convnext(sd: Dict, prefix: str) -> Dict[str, Any]:
    return {
        "conv_1": _conv_flax(sd, f"{prefix}.conv_1"),
        "ln_1": {
            "scale": _np(sd[f"{prefix}.ln_1.weight"]).astype(np.float32),
            "bias": _np(sd[f"{prefix}.ln_1.bias"]).astype(np.float32),
        },
        "conv_2": _conv1x1_as_dense(sd, f"{prefix}.conv_2"),
        "conv_3": _conv1x1_as_dense(sd, f"{prefix}.conv_3"),
    }


def convert_prob_generator(sd: Dict, prefix: str = "prob_generator") -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "quantizer_emb": _embed(sd, f"{prefix}.quantizer_encoding.quantizer_emb"),
    }
    cd: Dict[str, Any] = {}
    i = 0
    while f"{prefix}.cond_downsampling.resblocks.{i}.block.block.0.weight" in sd:
        cd[f"resblock_{i}"] = {
            "conv": _conv1x1_as_dense(sd, f"{prefix}.cond_downsampling.resblocks.{i}.block.block.0"),
            "norm": {
                "scale": _np(sd[f"{prefix}.cond_downsampling.resblocks.{i}.block.block.1.weight"]).astype(np.float32),
                "bias": _np(sd[f"{prefix}.cond_downsampling.resblocks.{i}.block.block.1.bias"]).astype(np.float32),
            },
        }
        cd[f"down_conv_{i}"] = _conv1x1_as_dense(sd, f"{prefix}.cond_downsampling.downblocks.{i}.0")
        cd[f"down_norm_{i}"] = {
            "scale": _np(sd[f"{prefix}.cond_downsampling.downblocks.{i}.1.weight"]).astype(np.float32),
            "bias": _np(sd[f"{prefix}.cond_downsampling.downblocks.{i}.1.bias"]).astype(np.float32),
        }
        i += 1
    cd["proj_out"] = _dense(sd, f"{prefix}.cond_downsampling.proj_out.0")
    params["cond_downsampling"] = cd

    den: Dict[str, Any] = {
        "time_embed": {
            "mlp_0": _dense(sd, f"{prefix}.denoiser.time_embed.mlp.0"),
            "mlp_2": _dense(sd, f"{prefix}.denoiser.time_embed.mlp.2"),
        },
        "cond_embed": _dense(sd, f"{prefix}.denoiser.cond_embed"),
        "proj_in": _dense(sd, f"{prefix}.denoiser.proj_in"),
    }
    i = 0
    while f"{prefix}.denoiser.res_blocks.{i}.ln_conv.weight" in sd:
        rb = f"{prefix}.denoiser.res_blocks.{i}"
        den[f"res_block_{i}"] = {
            "adaLN_modulation": _dense(sd, f"{rb}.adaLN_modulation.1"),
            "ln_conv": _ln(sd, f"{rb}.ln_conv"),
            "conv_in": _convnext(sd, f"{rb}.conv_in"),
            "ln_mlp": _ln(sd, f"{rb}.ln_mlp"),
            "mlp_0": _dense(sd, f"{rb}.mlp.0"),
            "mlp_2": _dense(sd, f"{rb}.mlp.2"),
        }
        i += 1
    fl = f"{prefix}.denoiser.final_layer"
    den["final_layer"] = {
        "adaLN_modulation": _dense(sd, f"{fl}.adaLN_modulation.1"),
        "conv_in": _convnext(sd, f"{fl}.conv_in"),
        "conv_out": _conv_flax(sd, f"{fl}.conv_out"),
    }
    params["denoiser"] = den
    return params


def convert_flamed_checkpoint(sd: Dict) -> Dict[str, Any]:
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {
        "prior": {"params": convert_prior_generator(sd)},
        "prob": {"params": convert_prob_generator(sd)},
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--kind", required=True,
                        choices=["codec-encoder", "codec-decoder", "flamed"])
    parser.add_argument("input")
    parser.add_argument("output")
    args = parser.parse_args()

    import torch

    sd = torch.load(args.input, map_location="cpu", weights_only=False)
    if args.kind == "codec-encoder":
        tree = convert_facodec_encoder(sd)
    elif args.kind == "codec-decoder":
        tree = convert_facodec_decoder(sd)
    else:
        tree = convert_flamed_checkpoint(sd)
    save_pytree_npz(args.output, tree)
    print(f"Converted {args.kind}: {args.input} -> {args.output}")


if __name__ == "__main__":
    main()
