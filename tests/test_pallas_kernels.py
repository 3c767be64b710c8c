"""Pallas kernels, validated in interpreter mode on CPU."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import flamed_tts_tpu.ops.pallas_convnext as m


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


def test_fused_conv_norm_matches_xla():
    rng = np.random.RandomState(0)
    b, l, c, k = 2, 48, 256, 31
    x = jnp.asarray(rng.randn(b, l, c).astype(np.float32))
    w = jnp.asarray((rng.randn(k, c) * 0.1).astype(np.float32))
    scale = jnp.asarray(rng.randn(c).astype(np.float32))
    bias = jnp.asarray(rng.randn(c).astype(np.float32))
    lens = jnp.asarray(np.array([48, 31], np.int32))

    out_pallas = m.depthwise_conv_instance_norm(x, w, scale, bias, lens)
    out_xla = m.reference_conv_instance_norm(x, w, scale, bias, lens)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), atol=1e-5, rtol=1e-5
    )


def test_fused_conv_norm_masks_padding():
    rng = np.random.RandomState(1)
    b, l, c, k = 1, 32, 128, 7
    x = jnp.asarray(rng.randn(b, l, c).astype(np.float32))
    w = jnp.asarray((rng.randn(k, c) * 0.1).astype(np.float32))
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)

    out = m.depthwise_conv_instance_norm(x, w, scale, bias, jnp.asarray([20]))
    out = np.asarray(out)
    assert np.all(out[0, 20:] == 0.0)
    # valid region equals an exact-length run
    exact = m.depthwise_conv_instance_norm(
        x[:, :20], w, scale, bias, jnp.asarray([20])
    )
    np.testing.assert_allclose(out[0, :20], np.asarray(exact)[0], atol=1e-5)


def test_fused_snake_resample_matches_xla():
    from flamed_tts_tpu.ops.resample import snake_filtered
    import flamed_tts_tpu.ops.pallas_resample as pr

    rng = np.random.RandomState(3)
    # (300, 16)/(511, 32)/(257, 64) exercise the lane-packed fold path
    # (fold = 128 // c) including non-divisible lengths; (20, 8) falls
    # back to the unpacked path; (130, 128) is full-lane unpacked.
    for t_len, c in [(20, 8), (300, 16), (511, 32), (257, 64), (130, 128)]:
        x = jnp.asarray(rng.randn(2, t_len, c).astype(np.float32))
        a = jnp.asarray((rng.randn(c) * 0.1).astype(np.float32))
        b = jnp.asarray((rng.randn(c) * 0.1).astype(np.float32))
        ref = snake_filtered(x, a, b)
        out = pr.snake_filtered_pallas(x, a, b)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )
