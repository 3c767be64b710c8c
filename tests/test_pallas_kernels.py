"""Pallas kernels, validated in interpreter mode on CPU."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

pytestmark = pytest.mark.slow  # excluded from the fast suite (-m 'not slow')


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


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


def test_fused_residual_unit_matches_xla():
    """Whole-unit fusion (snake+conv7+snake+conv1+add) vs the XLA chain,
    across dilations, multi-tile grids, and both edge windows."""
    from flamed_tts_tpu.models.facodec.encoder import residual_unit_xla
    import flamed_tts_tpu.ops.pallas_resunit as pru

    rng = np.random.RandomState(5)

    def unit_params(c):
        return {
            "act1": {"alpha": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
                     "beta": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)},
            "act2": {"alpha": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
                     "beta": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)},
            "conv1": {"w": jnp.asarray(rng.randn(c, c, 7).astype(np.float32) * 0.1),
                      "b": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)},
            "conv2": {"w": jnp.asarray(rng.randn(c, c, 1).astype(np.float32) * 0.1),
                      "b": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)},
        }

    for (t_len, c, d, tile) in [
        (300, 16, 1, 128),    # 3 tiles, smallest halo
        (300, 16, 3, 128),
        (290, 16, 9, 128),    # halo 39, 2*halo=78 close to tile
        (140, 32, 1, 128),    # partial second tile, folded (F=4)
        (260, 8, 9, None),    # default tile (single tile path)
        (700, 32, 9, 256),    # folded F=4, dilation 9, 3 tiles
        (513, 64, 3, 256),    # folded F=2, partial tile
        (1100, 64, 9, 256),   # folded F=2, dilation 9, 5 tiles
    ]:
        p = unit_params(c)
        x = jnp.asarray(rng.randn(2, t_len, c).astype(np.float32))
        ref = residual_unit_xla(x, p, d)
        out = pru.residual_unit_pallas(x, p, d, tile=tile)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4,
            err_msg=f"t_len={t_len} c={c} d={d} tile={tile}",
        )


def test_fused_residual_stack_matches_xla():
    """Whole-block fusion (3 units, dilations 1/3/9, one kernel) vs the
    sequential XLA chain, across folds and multi-tile grids."""
    from flamed_tts_tpu.models.facodec.encoder import residual_unit_xla
    import flamed_tts_tpu.ops.pallas_resunit as pru

    rng = np.random.RandomState(11)

    def unit_params(c):
        return {
            "act1": {"alpha": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
                     "beta": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)},
            "act2": {"alpha": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
                     "beta": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)},
            "conv1": {"w": jnp.asarray(rng.randn(c, c, 7).astype(np.float32) * 0.1),
                      "b": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)},
            "conv2": {"w": jnp.asarray(rng.randn(c, c, 1).astype(np.float32) * 0.1),
                      "b": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)},
        }

    for (t_len, c, tile) in [
        (1400, 16, 512),    # unfolded, 3 tiles, partial last tile
        (610, 16, 512),     # unfolded, 2 tiles, tail inside halo zone
        (1300, 64, 512),    # folded F=2 (total halo 108), 3 tiles
        (2300, 32, 640),    # folded F=4 (total halo 140), 4 tiles
    ]:
        units = [unit_params(c) for _ in range(3)]
        x = jnp.asarray(rng.randn(2, t_len, c).astype(np.float32))
        ref = x
        for p, d in zip(units, (1, 3, 9)):
            ref = residual_unit_xla(ref, p, d)
        out = pru.residual_stack_pallas(x, units, (1, 3, 9), tile=tile)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4,
            err_msg=f"t_len={t_len} c={c} tile={tile}",
        )


def test_fused_residual_stack_short_input_falls_back():
    """Below the tile threshold the stack must route to per-unit dispatch
    (which itself falls back to XLA here) and still match."""
    from flamed_tts_tpu.models.facodec.encoder import residual_unit_xla
    import flamed_tts_tpu.ops.pallas_resunit as pru

    rng = np.random.RandomState(12)
    c = 8
    units = []
    for _ in range(3):
        units.append({
            "act1": {"alpha": jnp.zeros(c), "beta": jnp.zeros(c)},
            "act2": {"alpha": jnp.zeros(c), "beta": jnp.zeros(c)},
            "conv1": {"w": jnp.asarray(rng.randn(c, c, 7).astype(np.float32) * 0.1),
                      "b": jnp.zeros(c)},
            "conv2": {"w": jnp.asarray(rng.randn(c, c, 1).astype(np.float32) * 0.1),
                      "b": jnp.zeros(c)},
        })
    x = jnp.asarray(rng.randn(1, 60, c).astype(np.float32))
    ref = x
    for p, d in zip(units, (1, 3, 9)):
        ref = residual_unit_xla(ref, p, d)
    np.testing.assert_allclose(
        np.asarray(pru.residual_stack_pallas(x, units)), np.asarray(ref),
        atol=1e-6,
    )


def test_fused_residual_unit_short_input_falls_back():
    from flamed_tts_tpu.models.facodec.encoder import residual_unit_xla
    import flamed_tts_tpu.ops.pallas_resunit as pru

    rng = np.random.RandomState(6)
    c = 8
    p = {
        "act1": {"alpha": jnp.zeros(c), "beta": jnp.zeros(c)},
        "act2": {"alpha": jnp.zeros(c), "beta": jnp.zeros(c)},
        "conv1": {"w": jnp.asarray(rng.randn(c, c, 7).astype(np.float32) * 0.1),
                  "b": jnp.zeros(c)},
        "conv2": {"w": jnp.asarray(rng.randn(c, c, 1).astype(np.float32) * 0.1),
                  "b": jnp.zeros(c)},
    }
    x = jnp.asarray(rng.randn(1, 20, c).astype(np.float32))  # < 2*halo
    np.testing.assert_allclose(
        np.asarray(pru.residual_unit_pallas(x, p, 9)),
        np.asarray(residual_unit_xla(x, p, 9)),
        atol=1e-6,
    )
