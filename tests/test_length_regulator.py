"""Gather-based length regulator vs a naive numpy expansion and vs the
reference torch implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from flamed_tts_tpu.ops.length_regulator import length_regulate


def naive_expand(x, phone_dur, sil_dur, src_len):
    """Direct reimplementation of the reference semantics (pva.py:125-166)
    for valid positions."""
    out = []
    sil_frame = x[0]
    for i in range(src_len):
        d = max(int(round(float(phone_dur[i]))), 1)
        s = max(int(round(float(sil_dur[i]))), 0)
        out.extend([x[i]] * d)
        out.extend([sil_frame] * s)
    return np.stack(out) if out else np.zeros((0, x.shape[-1]))


def test_matches_naive():
    rng = np.random.RandomState(0)
    b, l, h, max_len = 3, 7, 5, 64
    x = rng.randn(b, l, h).astype(np.float32)
    phone_dur = rng.randint(0, 5, (b, l)).astype(np.float32)
    sil_dur = rng.randint(0, 3, (b, l)).astype(np.float32)
    src_lens = np.array([7, 4, 1])

    out, tgt_len = length_regulate(
        jnp.asarray(x), jnp.asarray(phone_dur), jnp.asarray(sil_dur),
        jnp.asarray(src_lens), max_len,
    )
    out = np.asarray(out)
    tgt_len = np.asarray(tgt_len)

    for i in range(b):
        expected = naive_expand(x[i], phone_dur[i], sil_dur[i], src_lens[i])
        assert tgt_len[i] == expected.shape[0]
        np.testing.assert_allclose(out[i, : tgt_len[i]], expected, rtol=1e-6)
        assert np.all(out[i, tgt_len[i]:] == 0.0)


def test_matches_reference_torch():
    torch = pytest.importorskip("torch")
    from tests.reference_loader import load_reference

    ref = load_reference()
    lr = ref.pva.LengthRegulator()

    rng = np.random.RandomState(1)
    b, l, h, max_len = 2, 9, 4, 80
    x = rng.randn(b, l, h).astype(np.float32)
    phone_dur = rng.randint(1, 6, (b, l)).astype(np.float32)
    sil_dur = rng.randint(0, 4, (b, l)).astype(np.float32)
    src_lens = np.array([l, l])  # full-length: reference pad quirk dormant

    ref_out, ref_len = lr(
        torch.from_numpy(x),
        torch.from_numpy(phone_dur),
        torch.from_numpy(sil_dur),
        torch.from_numpy(src_lens),
        max_len,
    )
    out, tgt_len = length_regulate(
        jnp.asarray(x), jnp.asarray(phone_dur), jnp.asarray(sil_dur),
        jnp.asarray(src_lens), max_len,
    )
    np.testing.assert_array_equal(np.asarray(tgt_len), ref_len.numpy())
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), rtol=1e-6)


def test_overflow_clips():
    x = jnp.ones((1, 4, 2))
    phone_dur = jnp.full((1, 4), 100.0)
    sil_dur = jnp.zeros((1, 4))
    out, tgt_len = length_regulate(x, phone_dur, sil_dur, jnp.array([4]), 32)
    assert int(tgt_len[0]) == 32
    assert out.shape == (1, 32, 2)
