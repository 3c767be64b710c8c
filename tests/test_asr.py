"""Phoneme recognizer: decoding math, numpy/jax parity, embedder shape,
and (once weights are committed) recognition quality on held-out
fabricated audio.  Reference surface: the eval placeholder
(reference Makefile:103-104) and BASELINE.md's WER row."""

import os

import numpy as np
import pytest

from flamed_tts_tpu import asr

_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "flamed_tts_tpu", "lexicon", "asr_weights.npz",
)


def test_collapse_frames():
    #               sil S  S  S  IY IY sil T(1 frame -> dropped)
    s = asr.PHONE_TO_ID["S"]
    iy = asr.PHONE_TO_ID["IY"]
    t = asr.PHONE_TO_ID["T"]
    frames = np.asarray([0, s, s, s, iy, iy, 0, t])
    assert asr.collapse_frames(frames, min_run=2) == [s, iy]
    assert asr.collapse_frames(frames, min_run=1) == [s, iy, t]


def test_beam_decode_exact_sequence():
    lex = {
        "hello": ["HH", "AH0", "L", "OW1"],
        "world": ["W", "ER1", "L", "D"],
        "low": ["L", "OW1"],
    }
    trie = asr.LexiconTrie(lex)
    ids = [asr.phone_label(p) for p in ["HH", "AH0", "L", "OW1", "W", "ER1", "L", "D"]]
    assert asr.beam_decode_words(ids, trie) == ["hello", "world"]


def test_beam_decode_with_noise():
    lex = {"hello": ["HH", "AH0", "L", "OW1"], "world": ["W", "ER1", "L", "D"]}
    trie = asr.LexiconTrie(lex)
    # one substitution (AH->AE) and one spurious insertion (S)
    ids = [asr.phone_label(p) for p in ["HH", "AE1", "L", "OW1", "S", "W", "ER1", "L", "D"]]
    assert asr.beam_decode_words(ids, trie) == ["hello", "world"]


def test_forward_shapes_and_parity():
    import jax.numpy as jnp

    params = asr.init_params(np.random.RandomState(0), n_speakers=5)
    mel = np.random.RandomState(1).randn(2, 64, 80).astype(np.float32)
    out_np = asr.forward(params, np, mel)
    assert out_np.shape == (2, 64, asr.N_CLASSES)

    def to_j(t):
        if isinstance(t, dict):
            return {k: to_j(v) for k, v in t.items()}
        if isinstance(t, list):
            return [to_j(v) for v in t]
        return jnp.asarray(t)

    out_jx = np.asarray(asr.forward(to_j(params), jnp, jnp.asarray(mel)))
    np.testing.assert_allclose(out_np, out_jx, rtol=2e-4, atol=2e-4)

    emb = asr.speaker_embed(params, np, mel)
    assert emb.shape == (2, asr.SPK_EMB_DIM)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)


def test_weights_roundtrip(tmp_path):
    params = asr.init_params(np.random.RandomState(0), n_speakers=3)
    path = str(tmp_path / "asr.npz")
    asr.save_weights(params, path)
    loaded = asr.load_weights(path)
    mel = np.random.RandomState(2).randn(1, 32, 80).astype(np.float32)
    np.testing.assert_allclose(
        asr.forward(params, np, mel), asr.forward(loaded, np, mel), atol=1e-6
    )


@pytest.mark.skipif(not os.path.isfile(_WEIGHTS), reason="asr weights not trained yet")
def test_recognizer_on_fabricated_phone():
    """A single synthetic vowel in a trained speaker's voice must be
    recognized as a vowel-ish phone (coarse sanity without the corpus)."""
    from tools.fabricate_corpus import make_speaker, _phone_audio

    rng = np.random.RandomState(0)
    spk = make_speaker(3)
    wav = np.concatenate(
        [
            0.0005 * rng.randn(1600),
            _phone_audio("IY", 8000, 0.1, spk, rng),
            0.0005 * rng.randn(1600),
        ]
    ).astype(np.float32)
    rec = asr.PhonemeRecognizer(_WEIGHTS)
    phones, _ = rec.transcribe(wav)
    assert "IY" in phones, f"expected IY in {phones}"
