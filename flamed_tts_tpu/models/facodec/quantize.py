"""Factorized / residual vector quantization (inference path).

Re-design of the reference quantizers (flamed/models/facodec/quantize/
{fvq,rvq}.py) for XLA: the L2-normalized nearest-neighbor search is a
single (B*T, 8) x (8, 1024) matmul + argmax — trivially MXU-friendly.
Training-time machinery (commitment losses, straight-through, quantizer
dropout) is omitted: the codec is frozen pretrained in every Flamed flow.

Param pytree per FVQ layer::

    {"in_proj": {"w": (8, 256), "b": (8,)},      # torch Linear layout (out, in)
     "out_proj": {"w": (256, 8), "b": (256,)},
     "codebook": (1024, 8)}

Weight-norm on the projections is folded at conversion time.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp


def _linear(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    return x @ p["w"].T + p["b"]


def fvq_encode(x: jnp.ndarray, p: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, D) -> (codes (B, T) int32, quantized (B, T, D)).

    Matches FactorizedVectorQuantize.decode_latents (fvq.py:101-116):
    project to codebook space, L2-normalize both sides, nearest neighbor.
    """
    z_e = _linear(x, p["in_proj"])  # (B, T, 8)
    codebook = p["codebook"]        # (N, 8)
    z_n = z_e / jnp.maximum(
        jnp.linalg.norm(z_e, axis=-1, keepdims=True), 1e-12
    )
    c_n = codebook / jnp.maximum(
        jnp.linalg.norm(codebook, axis=-1, keepdims=True), 1e-12
    )
    # dist = |z|^2 - 2 z.c + |c|^2 with unit norms -> argmin dist == argmax z.c
    sim = jnp.einsum("btd,nd->btn", z_n, c_n)
    codes = jnp.argmax(sim, axis=-1).astype(jnp.int32)
    z_q = jnp.take(codebook, codes, axis=0)  # (B, T, 8)
    z_q = _linear(z_q, p["out_proj"])
    return codes, z_q


def fvq_decode(codes: jnp.ndarray, p: Dict) -> jnp.ndarray:
    """codes (.., T) -> embeddings (.., T, D) (fvq.py:88-99 vq2emb)."""
    emb = jnp.take(p["codebook"], codes, axis=0)
    return _linear(emb, p["out_proj"])


def rvq_encode(x: jnp.ndarray, layers: List[Dict]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Residual VQ over one group (rvq.py:27-73, eval path).

    Returns (codes (n_layers, B, T), quantized_sum (B, T, D)).
    """
    residual = x
    quantized_sum = jnp.zeros_like(x)
    codes = []
    for layer in layers:
        c, q = fvq_encode(residual, layer)
        residual = residual - q
        quantized_sum = quantized_sum + q
        codes.append(c)
    return jnp.stack(codes, axis=0), quantized_sum


def rvq_decode(codes: jnp.ndarray, layers: List[Dict]) -> jnp.ndarray:
    """(n_layers, B, T) codes -> summed embeddings (B, T, D)."""
    out = None
    for idx, layer in enumerate(layers):
        q = fvq_decode(codes[idx], layer)
        out = q if out is None else out + q
    return out
