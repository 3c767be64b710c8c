"""Embedding tables vs the reference's three sinusoid conventions."""

import numpy as np
import pytest

import jax.numpy as jnp

from flamed_tts_tpu.ops.embeddings import (
    dit_timestep_embedding,
    flow_time_embedding,
    sinusoid_position_table,
)


def test_fastspeech_table_matches_reference():
    torch = pytest.importorskip("torch")
    from tests.reference_loader import load_reference

    ref = load_reference()
    ref_table = ref.Models.get_sinusoid_encoding_table(64, 32).numpy()
    ours = np.asarray(sinusoid_position_table(64, 32))
    np.testing.assert_allclose(ours, ref_table, atol=1e-6)


def test_flow_time_embedding_matches_reference():
    torch = pytest.importorskip("torch")
    from tests.reference_loader import load_reference

    ref = load_reference()
    emb_mod = ref.pva.SinusoidalPosEmb(32)
    t = torch.tensor([0.1, 0.5, 0.9])
    ref_emb = emb_mod(t).numpy()
    ours = np.asarray(flow_time_embedding(jnp.asarray([0.1, 0.5, 0.9]), 32))
    # scale-1000 sinusoids amplify fp32 arg differences; 1e-4 abs is fp noise
    np.testing.assert_allclose(ours, ref_emb, atol=1e-4)


def test_dit_timestep_embedding_matches_reference():
    torch = pytest.importorskip("torch")
    from tests.reference_loader import load_reference

    ref = load_reference()
    t = torch.tensor([[0.25], [0.75]])
    ref_emb = ref.prob_generator.TimestepEmbedder.timestep_embedding(t, 16).numpy()
    ours = np.asarray(dit_timestep_embedding(jnp.asarray([[0.25], [0.75]]), 16))
    np.testing.assert_allclose(ours, ref_emb, atol=1e-5)
