"""Numerical parity: our prior generator vs the reference PyTorch code.

Every test builds the *actual reference module* with random weights,
converts the state_dict with tools/convert_torch_ckpt.py, and compares
outputs on identical inputs.  This is the strongest parity evidence
available without the unreleased pretrained checkpoints.
"""

import sys
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tests.parity_utils import SMALL_PRIOR_CFG, assert_close, prefixed_state_dict
from tests.reference_loader import load_reference
from tools.convert_torch_ckpt import convert_prior_generator

from flamed_tts_tpu.models.prior.prior_generator import PriorGenerator
from flamed_tts_tpu.models.prior.sampling import durations_from_flow
from flamed_tts_tpu.ops.masking import mask_from_lengths


@pytest.fixture(scope="module")
def setup():
    ref = load_reference()
    torch.manual_seed(0)
    ref_pg = ref.prior_generator.PriorGenerator(SMALL_PRIOR_CFG).eval()
    sd = prefixed_state_dict(ref_pg, "prior_generator")
    params = {"params": convert_prior_generator(sd)}
    our_pg = PriorGenerator(config=SMALL_PRIOR_CFG)
    return ref, ref_pg, our_pg, params


def _rand_inputs(b=2, l=11):
    rng = np.random.RandomState(3)
    phonemes = rng.randint(1, 300, (b, l)).astype(np.int64)
    src_lens = np.array([l, l - 4], dtype=np.int64)
    for i, n in enumerate(src_lens):
        phonemes[i, n:] = 0
    return phonemes, src_lens


def test_encoder_parity(setup):
    ref, ref_pg, our_pg, params = setup
    phonemes, src_lens = _rand_inputs()
    src_mask_t = ref.Models.__dict__  # noqa: F841 (namespace touch)

    from flamed.utils.tools import get_mask_from_lengths

    with torch.no_grad():
        mask_t = get_mask_from_lengths(torch.from_numpy(src_lens), phonemes.shape[1])
        ref_out = ref_pg.encoder(torch.from_numpy(phonemes), mask_t).numpy()

    mask_j = mask_from_lengths(jnp.asarray(src_lens), phonemes.shape[1])
    our_out = our_pg.apply(
        params, jnp.asarray(phonemes.astype(np.int32)), mask_j, method="encode"
    )
    assert_close(our_out, ref_out, name="encoder")


def test_pva_field_parity(setup):
    """Bucketed batch fields vs the reference run at exact length per
    utterance (the parity target of the mask-aware redesign)."""
    ref, ref_pg, our_pg, params = setup
    phonemes, src_lens = _rand_inputs()
    b, l = phonemes.shape
    rng = np.random.RandomState(4)
    enc = rng.randn(b, l, SMALL_PRIOR_CFG["transformer"]["encoder_hidden"]).astype(np.float32)
    enc[1, src_lens[1]:, :] = 0.0  # encoder zero-masks padded frames
    xt = rng.randn(b, l).astype(np.float32)
    t = np.float32(0.37)

    from flamed.utils.tools import get_mask_from_lengths

    ref_v = np.zeros((b, l), np.float32)
    ref_vs = np.zeros((b, l), np.float32)
    with torch.no_grad():
        for i in range(b):
            n = int(src_lens[i])
            mask_t = get_mask_from_lengths(torch.tensor([n]), n)
            ref_v[i, :n] = ref_pg.pva.duration_generator(
                torch.from_numpy(xt[i : i + 1, :n]),
                torch.from_numpy(enc[i : i + 1, :n]),
                torch.tensor(t), mask_t,
            ).numpy()[0]
            ref_vs[i, :n] = ref_pg.pva.sil_generator(
                torch.from_numpy(xt[i : i + 1, :n]),
                torch.from_numpy(enc[i : i + 1, :n]),
                torch.tensor(t), mask_t,
            ).numpy()[0]

    mask_j = mask_from_lengths(jnp.asarray(src_lens), l)
    our_v, our_vs = our_pg.apply(
        params, jnp.asarray(xt), jnp.asarray(xt), jnp.asarray(enc),
        jnp.asarray(t), mask_j, method="pva_fields",
    )
    assert_close(our_v, ref_v, name="duration field")
    assert_close(our_vs, ref_vs, name="silence field")


def _reference_exact_sample(ref_pg, phonemes_1, prompts_1, dur_noise_1, sil_noise_1, nfe):
    """Run the reference prior sampling for ONE exact-length utterance
    (no padding anywhere), with injected Euler noise.

    Mirrors prior_generator.py:141-196 + pva.py:88-116 faithfully.
    """
    from flamed.utils.tools import get_mask_from_lengths

    l = phonemes_1.shape[1]
    p_len = prompts_1.shape[-1]
    src_lens = torch.tensor([l])
    with torch.no_grad():
        mask_t = get_mask_from_lengths(src_lens, l)
        enc_t = ref_pg.encoder(phonemes_1, mask_t)
        ts = torch.linspace(0, 1, nfe + 1)
        dur_t, sil_t = dur_noise_1.clone(), sil_noise_1.clone()
        for i in range(1, len(ts)):
            dur_t = dur_t + (1 / nfe) * ref_pg.pva.duration_generator(
                dur_t, enc_t, ts[i - 1], mask_t
            )
            sil_t = sil_t + (1 / nfe) * ref_pg.pva.sil_generator(
                sil_t, enc_t, ts[i - 1], mask_t
            )
        phone_dur = torch.clamp(torch.round(torch.exp(dur_t) - 1), min=0)
        sil_dur = torch.clamp(torch.round(torch.exp(sil_t) - 1), min=0)
        lr_out, tgt_len = ref_pg.pva.length_regulator(
            enc_t, phone_dur, sil_dur, src_lens, None
        )
        max_t = lr_out.shape[1]
        tgt_mask_t = get_mask_from_lengths(tgt_len, max_t)
        out_t = ref_pg.bridge(lr_out)
        out_t, _ = ref_pg.shared_decoder(out_t, tgt_mask_t)
        dec_mask = get_mask_from_lengths(p_len + tgt_len, p_len + max_t)
        prompt_embs = ref_pg.code_embedding(prompts_1)
        hiddens = []
        output = out_t
        for ith, layer in enumerate(ref_pg.prior_decoder):
            q_in = ref_pg.pre_encode(
                torch.cat([prompt_embs[:, ith], output], dim=1), p_len, ith
            )
            output, dec_mask = layer(q_in, dec_mask)
            output = output[:, p_len:, :]
            hiddens.append(output.unsqueeze(1))
        ref_hiddens = torch.cat(hiddens, dim=1)
        ref_logits = ref_pg.head(ref_hiddens)
        ref_logits = ref_logits * ~tgt_mask_t.unsqueeze(1).expand(
            -1, ref_logits.size(1), -1
        ).unsqueeze(3)
    return phone_dur, int(tgt_len[0]), ref_hiddens, ref_logits


def test_full_prior_sample_parity(setup):
    """Design goal of the static-shape re-design: a bucketed *batch* run
    must equal the reference's exact-length per-utterance runs.

    The reference is executed once per utterance with no padding (the way
    its single-utterance CLI mode runs); ours runs the whole batch at
    bucketed shapes with per-utterance masks and exact-length position ids.
    """
    ref, ref_pg, our_pg, params = setup
    phonemes, src_lens = _rand_inputs()
    b, l = phonemes.shape
    nfe, temp = 4, 0.8
    rngn = np.random.RandomState(5)
    dur_noise = rngn.randn(b, l).astype(np.float32) * temp
    sil_noise = rngn.randn(b, l).astype(np.float32) * temp

    n_q = SMALL_PRIOR_CFG["codec"]["n_quantizers"]
    vocab = SMALL_PRIOR_CFG["codec"]["vocab_size"]
    p_bucket = 6
    p_lens = np.array([6, 4])
    prompts = rngn.randint(0, vocab, (b, n_q, p_bucket)).astype(np.int64)
    prompts[1, :, 4:] = vocab  # pad value (embeds to zero, masked anyway)

    # ---- reference: per-utterance exact-length runs
    ref_results = []
    for i in range(b):
        n = int(src_lens[i])
        ref_results.append(
            _reference_exact_sample(
                ref_pg,
                torch.from_numpy(phonemes[i : i + 1, :n]),
                torch.from_numpy(prompts[i : i + 1, :, : p_lens[i]]),
                torch.from_numpy(dur_noise[i : i + 1, :n]),
                torch.from_numpy(sil_noise[i : i + 1, :n]),
                nfe,
            )
        )

    # ---- ours: one bucketed batch run
    max_frames = max(r[1] for r in ref_results) + 16
    mask_j = mask_from_lengths(jnp.asarray(src_lens), l)
    enc_j = our_pg.apply(
        params, jnp.asarray(phonemes.astype(np.int32)), mask_j, method="encode"
    )
    ts_j = jnp.linspace(0.0, 1.0, nfe + 1)[:-1]
    dur_j, sil_j = jnp.asarray(dur_noise), jnp.asarray(sil_noise)
    for t_i in ts_j:
        v_d, v_s = our_pg.apply(
            params, dur_j, sil_j, enc_j, t_i, mask_j, method="pva_fields"
        )
        dur_j = dur_j + (1.0 / nfe) * v_d
        sil_j = sil_j + (1.0 / nfe) * v_s
    phone_dur_j = durations_from_flow(dur_j)
    sil_dur_j = durations_from_flow(sil_j)
    for i in range(b):
        n = int(src_lens[i])
        np.testing.assert_array_equal(
            np.asarray(phone_dur_j)[i, :n], ref_results[i][0].numpy()[0]
        )

    from flamed_tts_tpu.ops.length_regulator import length_regulate

    lr_j, tgt_len_j = length_regulate(
        enc_j, phone_dur_j, sil_dur_j, jnp.asarray(src_lens), max_frames
    )
    tgt_mask_j = mask_from_lengths(tgt_len_j, max_frames)
    hiddens_j, logits_j = our_pg.apply(
        params, lr_j, tgt_mask_j, jnp.asarray(prompts.astype(np.int32)),
        jnp.asarray(p_lens.astype(np.int32)), method="decode",
    )

    for i in range(b):
        _, ref_len, ref_hiddens, ref_logits = ref_results[i]
        assert int(tgt_len_j[i]) == ref_len
        assert_close(
            np.asarray(hiddens_j)[i, :, :ref_len, :],
            ref_hiddens.numpy()[0],
            name=f"decoder hiddens utt{i}",
            atol=5e-4, rtol=5e-4,
        )
        assert_close(
            np.asarray(logits_j)[i, :, :ref_len, :],
            ref_logits.numpy()[0],
            name=f"logits utt{i}",
            atol=1e-3, rtol=1e-3,
        )
