"""Converter + parity at the REAL model dimensions.

The other parity suites use shrunken configs for speed; this one builds
the reference modules at the production sizes (SURVEY §2.3/2.4 dims) and
checks conversion + one forward through each tower, catching any
dimension-specific mistakes (head splits, per-quantizer stacks, 1025-way
head, 2304-d condition flattening).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import yaml

from tests.parity_utils import assert_close, prefixed_state_dict
from tests.reference_loader import load_reference
from tools.convert_torch_ckpt import convert_prior_generator, convert_prob_generator

from flamed_tts_tpu.models.prior.prior_generator import PriorGenerator
from flamed_tts_tpu.models.prob.prob_generator import ProbGenerator
from flamed_tts_tpu.ops.masking import mask_from_lengths

pytestmark = pytest.mark.slow  # excluded from the fast suite (-m 'not slow')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _real_cfgs():
    with open(os.path.join(REPO, "configs", "prior.yaml")) as f:
        prior_cfg = yaml.safe_load(f)
    with open(os.path.join(REPO, "configs", "prob.yaml")) as f:
        prob_cfg = yaml.safe_load(f)
    return prior_cfg, prob_cfg


def test_fullsize_prior_encoder_and_decode():
    ref = load_reference()
    prior_cfg, _ = _real_cfgs()
    torch.manual_seed(0)
    ref_pg = ref.prior_generator.PriorGenerator(prior_cfg).eval()
    params = {"params": convert_prior_generator(
        prefixed_state_dict(ref_pg, "prior_generator")
    )}
    our_pg = PriorGenerator(config=prior_cfg)

    n_params = sum(p.numel() for p in ref_pg.parameters() if p.requires_grad)
    # position_enc buffers are requires_grad=False; converted tree should
    # match the trainable count exactly.
    from flamed_tts_tpu.runtime.pytree_io import pytree_num_params

    assert pytree_num_params(params) == n_params

    rng = np.random.RandomState(1)
    b, l = 1, 24
    phonemes = rng.randint(1, 300, (b, l)).astype(np.int64)
    from flamed.utils.tools import get_mask_from_lengths

    with torch.no_grad():
        mask_t = get_mask_from_lengths(torch.tensor([l]), l)
        enc_t = ref_pg.encoder(torch.from_numpy(phonemes), mask_t).numpy()
    mask_j = mask_from_lengths(jnp.asarray([l]), l)
    enc_j = our_pg.apply(
        params, jnp.asarray(phonemes.astype(np.int32)), mask_j, method="encode"
    )
    assert_close(enc_j, enc_t, name="fullsize encoder", atol=5e-4, rtol=5e-4)


def test_fullsize_denoiser_forward():
    ref = load_reference()
    _, prob_cfg = _real_cfgs()
    torch.manual_seed(2)
    ref_prob = ref.prob_generator.ProbGenerator(prob_cfg).eval()
    params = {"params": convert_prob_generator(
        prefixed_state_dict(ref_prob, "prob_generator")
    )}
    our_prob = ProbGenerator(config=prob_cfg)

    rng = np.random.RandomState(3)
    b, l = 1, 16
    x = rng.randn(b, l, prob_cfg["target_dim"]).astype(np.float32)
    spk = rng.randn(b, prob_cfg["spk_dim"]).astype(np.float32)
    t = np.float32(0.5)
    with torch.no_grad():
        ref_v = ref_prob.denoiser(
            torch.from_numpy(x), torch.tensor([[t]]), torch.from_numpy(spk)
        ).numpy()
    our_v = our_prob.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(spk),
        mask_from_lengths(jnp.asarray([l]), l), method="denoise",
    )
    assert_close(our_v, ref_v, name="fullsize denoiser", atol=1e-3, rtol=1e-3)


def test_fullsize_codec_roundtrip():
    """Real codec dims (ngf 32, hop 200): encoder forward + analyze +
    synthesize parity on a short wav."""
    ref = load_reference()
    torch.manual_seed(4)
    ref_enc = ref.facodec.FACodecEncoder(ngf=32, up_ratios=[2, 4, 5, 5],
                                         out_channels=256).eval()
    ref_dec = ref.facodec.FACodecDecoder(
        in_channels=256, upsample_initial_channel=1024, ngf=32,
        up_ratios=[5, 5, 4, 2], vq_num_q_c=2, vq_num_q_p=1, vq_num_q_r=3,
        vq_dim=256, codebook_dim=8, codebook_size_prosody=10,
        codebook_size_content=10, codebook_size_residual=10,
        use_gr_x_timbre=True, use_gr_residual_f0=True,
        use_gr_residual_phone=True,
    ).eval()

    from tools.convert_torch_ckpt import (
        convert_facodec_decoder,
        convert_facodec_encoder,
    )
    from flamed_tts_tpu.models.facodec.encoder import encoder_forward
    from flamed_tts_tpu.models.facodec.decoder import analyze, synthesize

    enc_params = convert_facodec_encoder(ref_enc.state_dict())
    dec_params = convert_facodec_decoder(ref_dec.state_dict())

    rng = np.random.RandomState(5)
    wav = (rng.randn(1, 1, 4000) * 0.1).astype(np.float32)  # 0.25 s
    with torch.no_grad():
        lat_t = ref_enc(torch.from_numpy(wav))
        _, codes_t, _, _, timbre_t = ref_dec(lat_t, eval_vq=False, vq=True)
        wav_t = ref_dec.inference(lat_t, timbre_t).numpy()

    lat_j = encoder_forward(enc_params, jnp.asarray(wav.transpose(0, 2, 1)))
    assert_close(
        np.asarray(lat_j).transpose(0, 2, 1), lat_t.numpy(),
        name="fullsize encoder latents", atol=2e-3, rtol=2e-3,
    )
    codes_j, timbre_j = analyze(dec_params, jnp.asarray(lat_t.numpy().transpose(0, 2, 1)))
    match = (np.asarray(codes_j) == codes_t.numpy()).mean()
    assert match > 0.99, f"code agreement {match}"
    assert_close(timbre_j, timbre_t.numpy(), name="fullsize timbre", atol=1e-3, rtol=1e-3)

    wav_j = synthesize(
        dec_params, jnp.asarray(lat_t.numpy().transpose(0, 2, 1)),
        jnp.asarray(timbre_t.numpy()),
    )
    assert_close(
        np.asarray(wav_j).transpose(0, 2, 1), wav_t,
        name="fullsize wav", atol=5e-3, rtol=5e-3,
    )
