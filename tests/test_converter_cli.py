"""Converter CLI round trip: torch Flamed-style checkpoint -> .npz ->
Flamed.from_pretrained -> sample, outputs equal to direct conversion."""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tests.parity_utils import SMALL_PRIOR_CFG, SMALL_PROB_CFG, prefixed_state_dict
from tests.reference_loader import load_reference

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_convert_cli_and_from_pretrained(tmp_path):
    ref = load_reference()
    torch.manual_seed(7)
    ref_pg = ref.prior_generator.PriorGenerator(SMALL_PRIOR_CFG)
    ref_prob = ref.prob_generator.ProbGenerator(SMALL_PROB_CFG)

    # Lightning-style checkpoint: {'state_dict': {...}} with module prefixes.
    state_dict = {}
    state_dict.update(prefixed_state_dict(ref_pg, "prior_generator"))
    state_dict.update(prefixed_state_dict(ref_prob, "prob_generator"))
    ckpt_path = str(tmp_path / "model.ckpt")
    torch.save({"state_dict": state_dict, "epoch": 3}, ckpt_path)

    npz_path = str(tmp_path / "model.npz")
    env = dict(os.environ, JAX_PLATFORMS="cpu", FLAMED_JAX_CACHE="off")
    env.pop("PYTHONPATH", None)
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_torch_ckpt.py"),
         "--kind", "flamed", ckpt_path, npz_path],
        env=env, capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert os.path.isfile(npz_path)

    from flamed_tts_tpu.config import ConfigDict
    from flamed_tts_tpu.models.flamed import Flamed

    cfg = ConfigDict(
        {
            "prior_generator": SMALL_PRIOR_CFG,
            "prob_generator": SMALL_PROB_CFG,
            "dataset_cfg": {
                "phoneme_buckets": [16], "frame_buckets": [64],
                "prompt_buckets": [8],
            },
        }
    )
    model = Flamed.from_pretrained(cfg, npz_path)
    assert model.num_params() > 0

    rng = np.random.RandomState(0)
    out = model.sample_batch(
        phonemes=rng.randint(1, 300, (1, 10)).astype(np.int32),
        src_lens=np.array([10], np.int32),
        prompts=rng.randint(0, 32, (1, 2, 6)).astype(np.int32),
        timbres=rng.randn(1, SMALL_PROB_CFG["spk_dim"]).astype(np.float32),
        nsteps_durgen=2, nsteps_denoiser=2, rng=jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(out["latents"])).all()
    assert int(out["tgt_len"][0]) > 0
