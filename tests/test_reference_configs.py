"""Drop-in config compatibility: the reference's own YAML files must
compose and drive our model construction unchanged."""

import os

import pytest

REF_CFG = "/root/reference/configs"


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference not mounted")
def test_reference_yamls_compose():
    from flamed_tts_tpu.config import compose_training_config

    cfg = compose_training_config(
        os.path.join(REF_CFG, "prior.yaml"),
        os.path.join(REF_CFG, "prob.yaml"),
        os.path.join(REF_CFG, "codec.yaml"),
        os.path.join(REF_CFG, "optimizer.yaml"),
        os.path.join(REF_CFG, "data.yaml"),
    )
    assert cfg["prior_generator"]["transformer"]["decoder_layers"] == [1, 2, 2, 3, 3, 3]
    assert cfg["prob_generator"]["convnext"]["kernel_size"] == 31
    assert cfg["codec_cfg"]["encoder"]["up_ratios"] == [2, 4, 5, 5]
    assert float(cfg["optimizer_cfg"]["lr"]) == 1e-4
    assert cfg["dataset_cfg"]["down_factors"] == [2, 4, 5, 5]


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference not mounted")
def test_reference_config_builds_modules():
    """Model modules must construct from the reference config values
    (construction only — full-size init is exercised elsewhere)."""
    from flamed_tts_tpu.config import compose_training_config
    from flamed_tts_tpu.models.prior.prior_generator import PriorGenerator
    from flamed_tts_tpu.models.prob.prob_generator import ProbGenerator

    cfg = compose_training_config(
        os.path.join(REF_CFG, "prior.yaml"),
        os.path.join(REF_CFG, "prob.yaml"),
        os.path.join(REF_CFG, "codec.yaml"),
        os.path.join(REF_CFG, "optimizer.yaml"),
        os.path.join(REF_CFG, "data.yaml"),
    )
    pg = PriorGenerator(config=cfg["prior_generator"].to_dict())
    prob = ProbGenerator(config=cfg["prob_generator"].to_dict())
    assert pg is not None and prob is not None
