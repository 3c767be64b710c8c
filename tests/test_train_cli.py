"""End-to-end train.py run: synthetic precomputed dataset, tiny config,
a few steps on the CPU mesh; checks metrics + checkpoints appear."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow  # excluded from the fast suite (-m 'not slow')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_PRIOR = {
    "variance_adaptor": {
        "sigma_min": 1e-4,
        "duration_generator": {"input_size": 16, "filter_size": 24, "kernel_size": 3,
                               "time_scale": 2, "drop_out": 0.1},
        "sil_generator": {"input_size": 16, "filter_size": 24, "kernel_size": 3,
                          "time_scale": 2, "drop_out": 0.1},
    },
    "transformer": {
        "encoder_layer": 1, "encoder_head": 2, "encoder_hidden": 16,
        "encoder_conv_filter_size": 32, "encoder_conv_kernel_size": [9, 1],
        "encoder_dropout": 0.1, "encoder_max_seq_len": 256,
        "decoder_shared_layers": 1, "decoder_layers": [1, 1],
        "decoder_head": 2, "decoder_hidden": 24,
        "decoder_conv_filter_size": 48, "decoder_conv_kernel_size": [3, 1],
        "decoder_dropout": 0.1, "decoder_max_seq_len": 512,
    },
    "codec": {"vocab_size": 32, "n_quantizers": 2},
}

TINY_PROB = {
    "target_dim": 16, "spk_dim": 16, "cond_dim": 24, "downsampling_stages": 1,
    "hidden_dim": 32, "n_layers": 1, "n_quantizers": 2, "sigma_min": 1e-6,
    "convnext": {"kernel_size": 7, "stride": 1, "padding": 3, "expand": 1, "groups": None},
}


def _make_dataset(root, n=6):
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n):
        l = rng.randint(6, 12)
        phone_dur = rng.randint(1, 4, l).astype(np.int32)
        sil_dur = rng.randint(0, 2, l).astype(np.int32)
        lf = int(phone_dur.sum() + sil_dur.sum())
        rel = f"utt{i}.npz"
        np.savez(
            os.path.join(root, rel),
            phoneme=rng.randint(1, 300, l).astype(np.int32),
            code=rng.randint(0, 32, (2, lf)).astype(np.int32),
            emb=rng.randn(lf, 16).astype(np.float32),
            spk=rng.randn(16).astype(np.float32),
            phone_dur=phone_dur,
            sil_dur=sil_dur,
        )
        lines.append(f"{rel}|5.0|some text with enough words here")
    with open(os.path.join(root, "manifest.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_train_cli_end_to_end(tmp_path):
    data_root = str(tmp_path / "data")
    os.makedirs(data_root)
    _make_dataset(data_root)

    cfg_dir = str(tmp_path / "configs")
    os.makedirs(cfg_dir)
    with open(os.path.join(REPO, "configs", "codec.yaml")) as f:
        codec_cfg = yaml.safe_load(f)
    with open(os.path.join(REPO, "configs", "optimizer.yaml")) as f:
        opt_cfg = yaml.safe_load(f)
    opt_cfg["warmup_steps"] = 1
    data_cfg = {
        "name": "tiny", "data_root": data_root, "train_manifest": "manifest.txt",
        "valid_manifest": "manifest.txt", "use_precomputed": True,
        "sampling_rate": 16000, "dur_min": 1, "dur_max": 20, "n_words_min": 3,
        "prompt_dur_max": 5, "prompt_reduced_factor": 0.8,
        "down_factors": [2, 4, 5, 5], "batch_size": 2, "vocab_size": 32,
        "cleaners": ["english_cleaners"], "add_blank": False, "seed": 0,
        "sil_phones": None,
        "phoneme_buckets": [16], "frame_buckets": [48],
    }
    for name, cfg in [("prior.yaml", TINY_PRIOR), ("prob.yaml", TINY_PROB),
                      ("codec.yaml", codec_cfg), ("optimizer.yaml", opt_cfg),
                      ("data.yaml", data_cfg)]:
        with open(os.path.join(cfg_dir, name), "w") as f:
            yaml.safe_dump(cfg, f)

    exp_dir = str(tmp_path / "exp")
    # Drop PYTHONPATH so the TPU-tunnel sitecustomize doesn't load (it
    # force-overrides JAX_PLATFORMS); give the child 2 virtual CPU devices.
    env = dict(os.environ, JAX_PLATFORMS="cpu", FLAMED_JAX_CACHE="off",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    env.pop("PYTHONPATH", None)
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config-dir", cfg_dir, "--exp-dir", exp_dir,
         "--max-steps", "3", "--val-every", "2", "--log-every", "1",
         "--devices", "2,1"],
        env=env, capture_output=True, text=True, timeout=560, cwd=REPO,
    )
    assert result.returncode == 0, result.stderr[-3000:]

    assert os.path.isfile(os.path.join(exp_dir, "config.yaml"))
    metrics_path = os.path.join(exp_dir, "metrics.jsonl")
    assert os.path.isfile(metrics_path)
    records = [json.loads(line) for line in open(metrics_path)]
    assert any("total_loss" in r for r in records)
    assert any("total_loss_val" in r for r in records)
    ckpts = os.listdir(os.path.join(exp_dir, "checkpoints"))
    assert "last.npz" in ckpts
    assert any(c.startswith("step") for c in ckpts)
