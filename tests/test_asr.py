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


def _logprobs_for(phone_seq, frames_per=3, favored=-0.1, other=-6.0):
    T = len(phone_seq) * frames_per
    lp = np.full((T, asr.N_CLASSES), other, np.float32)
    for i, p in enumerate(phone_seq):
        lp[i * frames_per : (i + 1) * frames_per, asr.phone_label(p)] = favored
    return lp


def test_viterbi_decode_exact():
    lex = {"hello": ["HH", "AH0", "L", "OW1"], "world": ["W", "ER1", "L", "D"]}
    trie = asr.LexiconTrie(lex)
    lp = _logprobs_for(["HH", "AH0", "L", "OW1", "W", "ER1", "L", "D"])
    assert asr.viterbi_decode_words(lp, trie) == ["hello", "world"]


def test_viterbi_recovers_non_argmax_phone():
    """The lexicon constraint must recover a phone that is never the
    framewise argmax — the property the collapsed-argmax decoder lacks."""
    lex = {"hello": ["HH", "AH0", "L", "OW1"]}
    trie = asr.LexiconTrie(lex)
    lp = _logprobs_for(["HH", "AH0", "L", "OW1"])
    l_id, r_id = asr.phone_label("L"), asr.phone_label("R")
    # over frames 6-8, R beats L — argmax collapse reads HH AH R OW
    lp[6:9, r_id] = -0.05
    lp[6:9, l_id] = -0.2
    assert asr.viterbi_decode_words(lp, trie) == ["hello"]


def test_viterbi_word_penalty_blocks_fragmenting():
    """With short filler words in the lexicon, the word penalty must keep
    the decoder from splitting one long word into many short ones."""
    lex = {
        "sacrifice": ["S", "AE1", "K", "R", "AH0", "F", "AY2", "S"],
        "a": ["AH0"], "i": ["AY1"], "us": ["AH1", "S"], "sack": ["S", "AE1", "K"],
    }
    trie = asr.LexiconTrie(lex)
    lp = _logprobs_for(["S", "AE1", "K", "R", "AH0", "F", "AY2", "S"])
    assert asr.viterbi_decode_words(lp, trie) == ["sacrifice"]


def test_viterbi_boundary_silence():
    lex = {"lo": ["L", "OW1"], "eel": ["IY1", "L"]}
    trie = asr.LexiconTrie(lex)
    seq = ["L", "OW1", "sil", "IY1", "L"]  # sil maps to class 0
    lp = _logprobs_for(seq)
    assert asr.viterbi_decode_words(lp, trie) == ["lo", "eel"]


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
