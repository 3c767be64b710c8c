"""Shared helpers for numerical parity tests vs the PyTorch reference."""

from __future__ import annotations

import numpy as np

SMALL_PRIOR_CFG = {
    "variance_adaptor": {
        "sigma_min": 1e-4,
        "duration_generator": {
            "input_size": 16, "filter_size": 24, "kernel_size": 3,
            "time_scale": 2, "drop_out": 0.1,
        },
        "sil_generator": {
            "input_size": 16, "filter_size": 24, "kernel_size": 3,
            "time_scale": 2, "drop_out": 0.1,
        },
    },
    "transformer": {
        "encoder_layer": 2, "encoder_head": 2, "encoder_hidden": 16,
        "encoder_conv_filter_size": 32, "encoder_conv_kernel_size": [9, 1],
        "encoder_dropout": 0.1, "encoder_max_seq_len": 256,
        "decoder_shared_layers": 1, "decoder_layers": [1, 2],
        "decoder_head": 2, "decoder_hidden": 24,
        "decoder_conv_filter_size": 48, "decoder_conv_kernel_size": [3, 1],
        "decoder_dropout": 0.1, "decoder_max_seq_len": 512,
    },
    "codec": {"vocab_size": 32, "n_quantizers": 2},
}

SMALL_PROB_CFG = {
    "target_dim": 16,
    "spk_dim": 16,
    "cond_dim": 24,
    "downsampling_stages": 1,
    "hidden_dim": 32,
    "n_layers": 2,
    "n_quantizers": 2,
    "sigma_min": 1e-6,
    "convnext": {"kernel_size": 7, "stride": 1, "padding": 3, "expand": 1, "groups": None},
}


def prefixed_state_dict(module, prefix: str):
    """torch module state_dict re-keyed with the given prefix."""
    return {f"{prefix}.{k}": v for k, v in module.state_dict().items()}


def assert_close(ours, ref, atol=2e-4, rtol=2e-4, name=""):
    ours = np.asarray(ours)
    ref = np.asarray(ref)
    assert ours.shape == ref.shape, f"{name}: shape {ours.shape} vs {ref.shape}"
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=rtol, err_msg=name)
