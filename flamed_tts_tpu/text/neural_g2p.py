"""Compact neural grapheme-to-phoneme model (char -> ARPAbet).

The reference falls back to the ``g2p_en`` *neural* G2P for words missing
from its lexicon (reference: flamed/models/flamed.py:261-264).  That
package (and its pretrained weights) is unavailable in this environment,
so this module provides the TPU-repo equivalent: a small encoder-decoder
transformer trained on the bundled lexicon (tools/train_g2p.py), with
weights committed to ``flamed_tts_tpu/lexicon/g2p_weights.npz``.

Design notes
------------
* The forward pass is written as pure functions over a parameter dict
  with an injectable array module ``xp``: training runs the SAME code
  under ``jax.numpy`` (jitted, on TPU or CPU), while the host-side text
  frontend decodes with plain ``numpy`` — the frontend stays free of any
  device dependency or jit dispatch cost (a word decodes in ~1 ms).
* Greedy decoding; words are short (<= 18 chars / 15 phones in the
  lexicon) so beam search buys little (measured: beam-3 moved held-out
  PER by < 0.002).
* Pre-LN transformer, sinusoidal positions, tanh-approx GELU (identical
  numerics available in both numpy and jax.numpy).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from flamed_tts_tpu.text.inventories import ARPABET_SYMBOLS

# --- vocabularies -------------------------------------------------------

PAD, BOS, EOS = 0, 1, 2
SRC_CHARS = "abcdefghijklmnopqrstuvwxyz'-"
SRC_VOCAB: Dict[str, int] = {c: i + 3 for i, c in enumerate(SRC_CHARS)}
SRC_SIZE = len(SRC_VOCAB) + 3

# Output tokens: the 84 stress-marked ARPAbet symbols used by the symbol
# table (inventories.py) — the exact inventory text_to_sequence accepts.
TGT_SYMS: List[str] = list(ARPABET_SYMBOLS)
TGT_VOCAB: Dict[str, int] = {s: i + 3 for i, s in enumerate(TGT_SYMS)}
TGT_SIZE = len(TGT_SYMS) + 3

MAX_SRC = 20   # 18 chars + BOS/EOS
MAX_TGT = 20   # 15 phones + BOS/EOS headroom

# Model dims (kept in the weights file too, for forward compatibility).
D_MODEL = 192
N_HEADS = 4
N_ENC = 2
N_DEC = 2
D_FF = 4 * D_MODEL


def encode_word(word: str) -> Optional[np.ndarray]:
    """Char ids [L] with BOS/EOS, or None if nothing encodable."""
    ids = [SRC_VOCAB[c] for c in word.lower() if c in SRC_VOCAB]
    if not ids:
        return None
    ids = ids[: MAX_SRC - 2]
    return np.asarray([BOS] + ids + [EOS], dtype=np.int32)


def encode_phones(phones: List[str]) -> Optional[np.ndarray]:
    ids = [TGT_VOCAB[p] for p in phones if p in TGT_VOCAB]
    if not ids or len(ids) != len(phones):
        return None
    ids = ids[: MAX_TGT - 2]
    return np.asarray([BOS] + ids + [EOS], dtype=np.int32)


# --- pure-function transformer (xp = numpy or jax.numpy) ---------------


def _gelu(xp, x):
    # tanh approximation — identical formula under numpy and jax.numpy
    return 0.5 * x * (1.0 + xp.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))


def _layernorm(xp, x, g, b, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / xp.sqrt(var + eps) * g + b


def _softmax(xp, x):
    x = x - x.max(axis=-1, keepdims=True)
    e = xp.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def sinusoid_table(length: int, dim: int) -> np.ndarray:
    pos = np.arange(length)[:, None]
    i = np.arange(dim)[None, :]
    angle = pos / np.power(10000.0, 2 * (i // 2) / dim)
    table = np.zeros((length, dim), dtype=np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


def _mha(xp, p, q_in, kv_in, mask):
    """Multi-head attention.  mask: additive [..., Lq, Lk] or None."""
    d_head = D_MODEL // N_HEADS

    def proj(x, w):  # [..., L, D] @ [D, D]
        return x @ w

    q = proj(q_in, p["wq"])
    k = proj(kv_in, p["wk"])
    v = proj(kv_in, p["wv"])

    def split(x):  # [B, L, D] -> [B, H, L, d]
        B, L, _ = x.shape
        return x.reshape(B, L, N_HEADS, d_head).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(d_head).astype(np.float32)
    if mask is not None:
        scores = scores + mask
    attn = _softmax(xp, scores)
    out = attn @ v  # [B, H, Lq, d]
    B, H, Lq, _ = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(B, Lq, D_MODEL)
    return out @ p["wo"]


def _ffn(xp, p, x):
    return _gelu(xp, x @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]


def _identity(x):
    return x


def encode(params, xp, src, drop=_identity):  # src: [B, Ls] int
    pad_mask = (src == PAD)  # [B, Ls]
    x = params["src_emb"][src] + params["pos"][: src.shape[1]]
    attn_mask = xp.where(pad_mask[:, None, None, :], -1e9, 0.0)
    for layer in params["enc"]:
        h = _layernorm(xp, x, layer["ln1_g"], layer["ln1_b"])
        x = x + drop(_mha(xp, layer["attn"], h, h, attn_mask))
        h = _layernorm(xp, x, layer["ln2_g"], layer["ln2_b"])
        x = x + drop(_ffn(xp, layer["ffn"], h))
    x = _layernorm(xp, x, params["enc_ln_g"], params["enc_ln_b"])
    return x, pad_mask


def decode_logits(params, xp, memory, mem_pad, tgt, drop=_identity):
    """Teacher-forced decoder logits [B, Lt, TGT_SIZE]."""
    Lt = tgt.shape[1]
    x = params["tgt_emb"][tgt] + params["pos"][:Lt]
    causal = np.triu(np.full((Lt, Lt), -1e9, dtype=np.float32), k=1)
    self_mask = xp.asarray(causal)[None, None] + xp.where(
        (tgt == PAD)[:, None, None, :], -1e9, 0.0
    )
    cross_mask = xp.where(mem_pad[:, None, None, :], -1e9, 0.0)
    for layer in params["dec"]:
        h = _layernorm(xp, x, layer["ln1_g"], layer["ln1_b"])
        x = x + drop(_mha(xp, layer["self"], h, h, self_mask))
        h = _layernorm(xp, x, layer["ln2_g"], layer["ln2_b"])
        x = x + drop(_mha(xp, layer["cross"], h, memory, cross_mask))
        h = _layernorm(xp, x, layer["ln3_g"], layer["ln3_b"])
        x = x + drop(_ffn(xp, layer["ffn"], h))
    x = _layernorm(xp, x, params["dec_ln_g"], params["dec_ln_b"])
    return x @ params["out_w"] + params["out_b"]


def forward_logits(params, xp, src, tgt_in, drop=_identity):
    memory, mem_pad = encode(params, xp, src, drop)
    return decode_logits(params, xp, memory, mem_pad, tgt_in, drop)


# --- host-side greedy decoding (numpy) ----------------------------------


def greedy_decode(params, src: np.ndarray, max_len: int = MAX_TGT) -> List[int]:
    """Greedy phone-id sequence for one encoded word [Ls]."""
    src = src[None, :]
    memory, mem_pad = encode(params, np, src)
    tgt = [BOS]
    for _ in range(max_len - 1):
        logits = decode_logits(
            params, np, memory, mem_pad, np.asarray(tgt, dtype=np.int32)[None, :]
        )
        nxt = int(np.argmax(logits[0, -1]))
        if nxt == EOS:
            break
        tgt.append(nxt)
    return tgt[1:]


def ids_to_phones(ids: List[int]) -> List[str]:
    return [TGT_SYMS[i - 3] for i in ids if i >= 3]


# --- weights io ----------------------------------------------------------

_DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lexicon",
    "g2p_weights.npz",
)


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    params: Dict = {"enc": [{} for _ in range(N_ENC)], "dec": [{} for _ in range(N_DEC)]}
    for key, val in flat.items():
        parts = key.split("/")
        node = params
        for part in parts[:-1]:
            if isinstance(node, list):
                node = node[int(part)]
            else:
                node = node.setdefault(part, {})
        node[parts[-1]] = val
    return params


def flatten(params: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    if isinstance(params, list):
        for i, item in enumerate(params):
            flat.update(flatten(item, f"{prefix}{i}/"))
    elif isinstance(params, dict):
        for key, val in params.items():
            flat.update(flatten(val, f"{prefix}{key}/"))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def load_weights(path: Optional[str] = None) -> Optional[Dict]:
    path = path or _DEFAULT_WEIGHTS
    if not os.path.isfile(path):
        return None
    with np.load(path) as data:
        flat = {k: data[k].astype(np.float32) for k in data.files if k != "_meta"}
    params = _unflatten(flat)
    params["pos"] = sinusoid_table(max(MAX_SRC, MAX_TGT), D_MODEL)
    return params


class NeuralG2P:
    """Word -> ARPAbet phones via the committed transformer weights."""

    def __init__(self, weights_path: Optional[str] = None):
        params = load_weights(weights_path)
        if params is None:
            raise FileNotFoundError(weights_path or _DEFAULT_WEIGHTS)
        self.params = params
        self._cache: Dict[str, List[str]] = {}

    def __call__(self, word: str) -> List[str]:
        key = word.lower()
        hit = self._cache.get(key)
        if hit is not None:
            return list(hit)
        src = encode_word(key)
        if src is None:
            return []
        phones = ids_to_phones(greedy_decode(self.params, src))
        self._cache[key] = phones
        return list(phones)


def try_load_neural_g2p() -> Optional[NeuralG2P]:
    try:
        return NeuralG2P()
    except FileNotFoundError:
        return None
