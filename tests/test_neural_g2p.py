"""Neural G2P: model math, numpy/jax parity, and (once weights are
committed) held-out quality vs the reference's g2p_en role
(reference flamed/models/flamed.py:261-264)."""

import os

import numpy as np
import pytest

from flamed_tts_tpu.text import neural_g2p as g2p
from flamed_tts_tpu.text.frontend import read_lexicon

_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "flamed_tts_tpu", "lexicon", "g2p_weights.npz",
)
_HELDOUT = os.path.join(os.path.dirname(_WEIGHTS), "g2p_heldout.txt")
_GOLD = os.path.join(os.path.dirname(_WEIGHTS), "proper-nouns-gold.txt")


def _rand_params(seed=0):
    from tools.train_g2p import init_params

    params = init_params(np.random.RandomState(seed))
    params["pos"] = g2p.sinusoid_table(max(g2p.MAX_SRC, g2p.MAX_TGT), g2p.D_MODEL)
    return params


def test_encode_word_vocab():
    ids = g2p.encode_word("o'neill-smith")
    assert ids is not None and ids[0] == g2p.BOS and ids[-1] == g2p.EOS
    assert g2p.encode_word("!!!") is None
    # phones roundtrip
    enc = g2p.encode_phones(["HH", "AH0", "L", "OW1"])
    assert list(g2p.ids_to_phones(list(enc[1:-1]))) == ["HH", "AH0", "L", "OW1"]
    assert g2p.encode_phones(["NOT_A_PHONE"]) is None


def test_numpy_jax_forward_parity():
    """The same pure-function forward must agree under numpy and jax.numpy
    (the frontend decodes with numpy; training runs under jax)."""
    import jax.numpy as jnp

    params = _rand_params()
    rng = np.random.RandomState(1)
    src = rng.randint(1, g2p.SRC_SIZE, (2, 9)).astype(np.int32)
    src[1, 6:] = g2p.PAD
    tgt = rng.randint(1, g2p.TGT_SIZE, (2, 7)).astype(np.int32)
    out_np = g2p.forward_logits(params, np, src, tgt)
    jparams = _tree_map_jnp(params)
    out_jx = np.asarray(g2p.forward_logits(jparams, jnp, jnp.asarray(src), jnp.asarray(tgt)))
    np.testing.assert_allclose(out_np, out_jx, rtol=2e-4, atol=2e-4)


def _tree_map_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _tree_map_jnp(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_tree_map_jnp(v) for v in tree]
    return jnp.asarray(tree)


def test_flatten_roundtrip(tmp_path):
    params = _rand_params()
    path = str(tmp_path / "w.npz")
    stripped = dict(params)
    stripped.pop("pos")
    np.savez_compressed(path, **g2p.flatten(stripped))
    loaded = g2p.load_weights(path)
    out_a = g2p.greedy_decode(params, g2p.encode_word("hello"))
    out_b = g2p.greedy_decode(loaded, g2p.encode_word("hello"))
    assert out_a == out_b


def _per(hyp, ref):
    from tools.train_g2p import per

    return per(hyp, ref)


@pytest.mark.skipif(not os.path.isfile(_WEIGHTS), reason="g2p weights not trained yet")
def test_heldout_per_below_threshold():
    """Held-out lexicon entries (never trained, tools/train_g2p.py split
    protocol): stress-stripped PER must beat the round-3 rule engine
    (0.25) by a wide margin."""
    model = g2p.NeuralG2P(_WEIGHTS)
    gold = read_lexicon(_HELDOUT)
    assert len(gold) > 300
    err = tot = 0
    for word, ref in gold.items():
        hyp = [p.rstrip("012") for p in model(word)]
        err += _per(hyp, [p.rstrip("012") for p in ref])
        tot += len(ref)
    assert err / tot < 0.10, f"held-out base PER {err / tot:.3f}"


_GOLD_HELDOUT = os.path.join(os.path.dirname(_WEIGHTS), "g2p_gold_heldout.txt")


@pytest.mark.skipif(not os.path.isfile(_WEIGHTS), reason="g2p weights not trained yet")
def test_proper_noun_per():
    """Held-out half of the hand-authored proper-noun gold set (the other
    half + synthetic compound names train the name phonotactics,
    tools/train_g2p.py::build_dataset)."""
    model = g2p.NeuralG2P(_WEIGHTS)
    path = _GOLD_HELDOUT if os.path.isfile(_GOLD_HELDOUT) else _GOLD
    gold = read_lexicon(path)
    assert len(gold) >= 70
    err = tot = 0
    for word, ref in gold.items():
        hyp = [p.rstrip("012") for p in model(word)]
        err += _per(hyp, [p.rstrip("012") for p in ref])
        tot += len(ref)
    # r4 gate was 0.22 (no name training at all); the r5 name legs land
    # 0.132 on the truly-held-out half (g2p_gold_heldout.txt, never in
    # training) — gate at 0.15 with headroom.  Next tightening target:
    # 0.12 (grow _NAME_ONSETS/_NAME_SUFFIXES coverage in train_g2p).
    assert err / tot < 0.15, f"proper-noun base PER {err / tot:.3f}"


@pytest.mark.skipif(not os.path.isfile(_WEIGHTS), reason="g2p weights not trained yet")
def test_frontend_uses_neural_g2p_for_oov():
    from flamed_tts_tpu.text.frontend import EnglishFrontend

    fe = EnglishFrontend()
    phones = fe.word_to_phones("zorbulak")  # not in any lexicon
    assert phones, "OOV word produced no phones"
    assert fe._neural is not None, "neural G2P not engaged for OOV"
    # determinism (cache + greedy decode)
    assert phones == fe.word_to_phones("zorbulak")
