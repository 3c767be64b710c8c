#!/usr/bin/env python3
"""Train the neural G2P (flamed_tts_tpu/text/neural_g2p.py) on the lexicon.

Replaces the reference's pretrained g2p_en OOV fallback
(flamed/models/flamed.py:261-264) with a model trained offline on the
bundled 9.7k-entry lexicon, augmented with morphologically-derived
inflections (the phonologically-regular rules in text/frontend.py).

Split protocol (leak-proof):
  * held-out = every Nth lexicon entry (deterministic, seed-stable);
  * augmentation runs over TRAIN stems only, and any augmented surface
    form colliding with a held-out word is dropped (otherwise "walked"
    in held-out would be trainable from "walk" + regular past).

Outputs:
  * flamed_tts_tpu/lexicon/g2p_weights.npz       (committed weights)
  * flamed_tts_tpu/lexicon/g2p_heldout.txt       (the held-out gold set)
  * prints held-out PER (stress-marked and base-phone)

Usage:
  python tools/train_g2p.py [--epochs 120] [--batch 256] [--device cpu|tpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from flamed_tts_tpu.text import neural_g2p as g2p
from flamed_tts_tpu.text.frontend import inflect_oov, read_lexicon
from flamed_tts_tpu.text.g2p_fallback import rule_g2p

_LEX = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..",
    "flamed_tts_tpu",
    "lexicon",
    "english-core.txt",
)
_OUT_DIR = os.path.dirname(_LEX)


_GOLD = os.path.join(_OUT_DIR, "proper-nouns-gold.txt")


_NAME_ONSETS = {
    "brad": "B R AE1 D", "carl": "K AA1 R L", "clark": "K L AA1 R K",
    "dav": "D EY1 V", "ed": "EH1 D", "frank": "F R AE1 NG K",
    "gar": "G AA1 R", "har": "HH AE1 R", "hen": "HH EH1 N",
    "jack": "JH AE1 K", "john": "JH AA1 N", "lin": "L IH1 N",
    "mar": "M AA1 R", "nor": "N AO1 R", "os": "AA1 S",
    "pat": "P AE1 T", "rob": "R AA1 B", "rich": "R IH1 CH",
    "stan": "S T AE1 N", "tom": "T AA1 M", "walt": "W AO1 L T",
    "wat": "W AA1 T", "west": "W EH1 S T", "wil": "W IH1 L",
    "ash": "AE1 SH", "black": "B L AE1 K", "brook": "B R UH1 K",
    "fair": "F EH1 R", "glen": "G L EH1 N", "green": "G R IY1 N",
    "hill": "HH IH1 L", "kings": "K IH1 NG Z", "lake": "L EY1 K",
    "long": "L AO1 NG", "mill": "M IH1 L", "oak": "OW1 K",
    "ray": "R EY1", "stone": "S T OW1 N", "spring": "S P R IH1 NG",
}
_NAME_SUFFIXES = {
    "son": "S AH0 N", "ton": "T AH0 N", "ville": "V IH2 L",
    "ford": "F ER0 D", "berg": "B ER0 G", "burg": "B ER0 G",
    "land": "L AH0 N D", "wood": "W UH2 D", "field": "F IY2 L D",
    "man": "M AH0 N", "worth": "W ER0 TH", "ley": "L IY0",
    "by": "B IY0", "dale": "D EY2 L", "mont": "M AA2 N T",
    "well": "W EH2 L", "ington": "IH0 NG T AH0 N",
}


def synthetic_names():
    """Compound proper names from authored morphemes: the onset keeps
    primary stress, the suffix reduces — the dominant stress pattern of
    English surnames/toponyms ("Bradford", "Hillsdale", "Watson")."""
    out = {}
    for on, on_ph in _NAME_ONSETS.items():
        for sfx, sfx_ph in _NAME_SUFFIXES.items():
            out[on + sfx] = (on_ph + " " + sfx_ph).split()
    return out


def build_dataset(heldout_every: int = 20, aug_ratio: float = 1.0, seed: int = 0):
    lex = read_lexicon(_LEX)
    gold = read_lexicon(_GOLD)  # hand-authored proper nouns
    # Gold split: even-indexed entries are trainable (teaching the model
    # name phonotactics), odd-indexed are the held-out gate the tests
    # enforce (tests/test_neural_g2p.py::test_proper_noun_per).
    gold_sorted = sorted(gold)
    gold_train = {w: gold[w] for w in gold_sorted[0::2]}
    gold_eval = {w: gold[w] for w in gold_sorted[1::2]}
    words = sorted(lex.keys())
    heldout = {w for i, w in enumerate(words) if i % heldout_every == 7}
    heldout |= set(gold_eval)
    train = {w: lex[w] for w in words if w not in heldout}

    # Morphological augmentation over train stems only: the derived
    # pronunciations are correct-by-construction (regular suffix
    # phonology over a verified stem), but unconstrained stem x suffix
    # products outnumber real entries ~9:1 and skew the distribution —
    # cap at aug_ratio x base, sampled deterministically.
    candidates = []
    lookup = lambda w: train.get(w)  # noqa: E731
    suffix_forms = ("s", "es", "ed", "ing", "ly", "er", "est", "ness")
    for stem in sorted(train):
        if len(stem) < 3:
            continue
        for sfx in suffix_forms:
            for surface in _surface_forms(stem, sfx):
                if surface in train or surface in heldout:
                    continue
                phones = inflect_oov(surface, lookup)
                if phones:
                    candidates.append((surface, phones))
    rng = np.random.RandomState(seed)
    rng.shuffle(candidates)
    aug = dict(candidates[: int(aug_ratio * len(train))])
    merged = dict(train)
    merged.update(aug)
    # Proper-noun phonotactics: trainable gold half + synthetic compound
    # names (repeated by the caller so the small name distribution is not
    # drowned by the ~20k common-word examples).  Held-out gold names
    # never enter training.
    names = dict(gold_train)
    names.update({w: p for w, p in synthetic_names().items()
                  if w not in heldout and w not in gold_eval})
    heldout_lex = {w: lex[w] for w in heldout if w in lex}
    return merged, names, heldout_lex, gold_eval, len(train), len(aug)


def _surface_forms(stem: str, sfx: str):
    """Plausible spellings of stem+suffix (inverse of _stem_candidates)."""
    forms = [stem + sfx]
    if stem.endswith("e") and sfx in ("ed", "ing", "er", "est", "es"):
        forms.append(stem[:-1] + sfx)  # make -> making
    if stem.endswith("y") and sfx in ("s", "ed", "er", "est", "ness"):
        mapped = {"s": "ies", "ed": "ied", "er": "ier", "est": "iest", "ness": "iness"}
        forms.append(stem[:-1] + mapped[sfx])  # carry -> carried
    return forms


def to_arrays(pairs):
    srcs, tgts = [], []
    for word, phones in pairs:
        s = g2p.encode_word(word)
        t = g2p.encode_phones(phones)
        if s is None or t is None:
            continue
        srcs.append(np.pad(s, (0, g2p.MAX_SRC - len(s))))
        tgts.append(np.pad(t, (0, g2p.MAX_TGT - len(t))))
    return np.stack(srcs).astype(np.int32), np.stack(tgts).astype(np.int32)


def init_params(rng: np.random.RandomState):
    def dense(n_in, n_out):
        return (rng.randn(n_in, n_out) * (1.0 / np.sqrt(n_in))).astype(np.float32)

    def attn():
        return {
            "wq": dense(g2p.D_MODEL, g2p.D_MODEL),
            "wk": dense(g2p.D_MODEL, g2p.D_MODEL),
            "wv": dense(g2p.D_MODEL, g2p.D_MODEL),
            "wo": dense(g2p.D_MODEL, g2p.D_MODEL),
        }

    def ffn():
        return {
            "w1": dense(g2p.D_MODEL, g2p.D_FF),
            "b1": np.zeros(g2p.D_FF, np.float32),
            "w2": dense(g2p.D_FF, g2p.D_MODEL),
            "b2": np.zeros(g2p.D_MODEL, np.float32),
        }

    def lns(names):
        out = {}
        for name in names:
            out[f"{name}_g"] = np.ones(g2p.D_MODEL, np.float32)
            out[f"{name}_b"] = np.zeros(g2p.D_MODEL, np.float32)
        return out

    params = {
        "src_emb": (rng.randn(g2p.SRC_SIZE, g2p.D_MODEL) * 0.02).astype(np.float32),
        "tgt_emb": (rng.randn(g2p.TGT_SIZE, g2p.D_MODEL) * 0.02).astype(np.float32),
        "enc": [
            {"attn": attn(), "ffn": ffn(), **lns(["ln1", "ln2"])}
            for _ in range(g2p.N_ENC)
        ],
        "dec": [
            {"self": attn(), "cross": attn(), "ffn": ffn(), **lns(["ln1", "ln2", "ln3"])}
            for _ in range(g2p.N_DEC)
        ],
        "enc_ln_g": np.ones(g2p.D_MODEL, np.float32),
        "enc_ln_b": np.zeros(g2p.D_MODEL, np.float32),
        "dec_ln_g": np.ones(g2p.D_MODEL, np.float32),
        "dec_ln_b": np.zeros(g2p.D_MODEL, np.float32),
        "out_w": dense(g2p.D_MODEL, g2p.TGT_SIZE),
        "out_b": np.zeros(g2p.TGT_SIZE, np.float32),
    }
    return params


def per(hyp, ref):
    """Levenshtein phone error count."""
    dist = np.arange(len(ref) + 1)
    for i, h in enumerate(hyp, 1):
        prev, dist[0] = dist[0], i
        for j, r in enumerate(ref, 1):
            cur = min(dist[j] + 1, dist[j - 1] + 1, prev + (h != r))
            prev, dist[j] = dist[j], cur
    return int(dist[-1])


def evaluate(params, gold, tag, log=print):
    err_s = tot_s = err_b = tot_b = exact = 0
    strip = lambda seq: [p.rstrip("012") for p in seq]  # noqa: E731
    for word, ref in sorted(gold.items()):
        src = g2p.encode_word(word)
        if src is None:
            continue
        hyp = g2p.ids_to_phones(g2p.greedy_decode(params, src))
        err_s += per(hyp, ref)
        tot_s += len(ref)
        err_b += per(strip(hyp), strip(ref))
        tot_b += len(ref)
        exact += int(hyp == ref)
    n = len(gold)
    log(
        f"[{tag}] PER(stress)={err_s / max(tot_s, 1):.4f} "
        f"PER(base)={err_b / max(tot_b, 1):.4f} "
        f"word-acc={exact / max(n, 1):.3f} (n={n})"
    )
    return err_s / max(tot_s, 1), err_b / max(tot_b, 1)


def rule_baseline(gold):
    err = tot = 0
    for word, ref in gold.items():
        hyp = rule_g2p(word)
        err += per([p.rstrip("012") for p in hyp], [p.rstrip("012") for p in ref])
        tot += len(ref)
    print(f"[rule-engine baseline] PER(base)={err / max(tot, 1):.4f}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--epochs", type=int, default=120)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--dropout", type=float, default=0.15)
    parser.add_argument("--label-smooth", type=float, default=0.1)
    parser.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--limit", type=int, default=0,
                        help="Smoke mode: train on only N examples.")
    parser.add_argument("--out", default=os.path.join(_OUT_DIR, "g2p_weights.npz"))
    args = parser.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from flamed_tts_tpu.runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    train_lex, names, heldout, gold_eval, n_base, n_aug = build_dataset()
    print(f"train: {n_base} lexicon + {n_aug} augmented + {len(names)} names (x4); "
          f"held-out: {len(heldout)} common + {len(gold_eval)} gold names")
    src, tgt = to_arrays(sorted(train_lex.items()) + 4 * sorted(names.items()))
    if args.limit:
        src, tgt = src[: args.limit], tgt[: args.limit]
    n = src.shape[0]
    print(f"examples: {n}  (src {src.shape}, tgt {tgt.shape})")

    params = init_params(np.random.RandomState(args.seed))
    params["pos"] = g2p.sinusoid_table(max(g2p.MAX_SRC, g2p.MAX_TGT), g2p.D_MODEL)

    steps_per_epoch = max(n // args.batch, 1)
    total_steps = steps_per_epoch * args.epochs
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, min(1000, total_steps // 10), total_steps, args.lr * 0.05
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=1e-4),
    )
    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    opt_state = tx.init(jparams)

    def loss_fn(p, batch_src, batch_tgt, rng):
        calls = [0]

        def drop(x):
            calls[0] += 1
            key = jax.random.fold_in(rng, calls[0])
            keep = jax.random.bernoulli(key, 1.0 - args.dropout, x.shape)
            return jnp.where(keep, x / (1.0 - args.dropout), 0.0)

        tgt_in, tgt_out = batch_tgt[:, :-1], batch_tgt[:, 1:]
        logits = g2p.forward_logits(p, jnp, batch_src, tgt_in, drop)
        valid = (tgt_out != g2p.PAD).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(tgt_out, g2p.TGT_SIZE)
        smoothed = (1 - args.label_smooth) * onehot + args.label_smooth / g2p.TGT_SIZE
        ce = -(smoothed * logp).sum(-1)
        return (ce * valid).sum() / valid.sum()

    @jax.jit
    def train_step(p, opt_state, batch_src, batch_tgt, rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch_src, batch_tgt, rng)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    rng_np = np.random.RandomState(args.seed + 1)
    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    step = 0
    for epoch in range(args.epochs):
        order = rng_np.permutation(n)
        losses = []
        for b in range(steps_per_epoch):
            idx = order[b * args.batch : (b + 1) * args.batch]
            if len(idx) < args.batch:  # static shapes: wrap around
                idx = np.concatenate([idx, order[: args.batch - len(idx)]])
            key, sub = jax.random.split(key)
            jparams, opt_state, loss = train_step(
                jparams, opt_state, jnp.asarray(src[idx]), jnp.asarray(tgt[idx]), sub
            )
            losses.append(loss)
            step += 1
        if epoch % 10 == 9 or epoch == 0:
            print(
                f"epoch {epoch + 1}/{args.epochs} loss={float(np.mean(jax.device_get(jnp.stack(losses)))):.4f} "
                f"({step} steps, {time.time() - t0:.0f}s)",
                flush=True,
            )
        if epoch % 10 == 9 and epoch != args.epochs - 1:
            # periodic save so an interrupted run still yields weights
            snap = jax.tree_util.tree_map(np.asarray, jax.device_get(jparams))
            snap.pop("pos", None)
            np.savez_compressed(args.out, **g2p.flatten(snap))

    final = jax.tree_util.tree_map(np.asarray, jax.device_get(jparams))
    final.pop("pos", None)
    np.savez_compressed(args.out, **g2p.flatten(final))
    print(f"saved {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB)")

    with open(os.path.join(_OUT_DIR, "g2p_heldout.txt"), "w") as fout:
        for word in sorted(heldout):
            fout.write(f"{word.upper()}\t{' '.join(heldout[word])}\n")

    with open(os.path.join(_OUT_DIR, "g2p_gold_heldout.txt"), "w") as fout:
        for word in sorted(gold_eval):
            fout.write(f"{word.upper()}\t{' '.join(gold_eval[word])}\n")

    loaded = g2p.load_weights(args.out)
    rule_baseline(heldout)
    evaluate(loaded, heldout, "held-out")
    rule_baseline(gold_eval)
    evaluate(loaded, gold_eval, "proper-nouns-heldout")


if __name__ == "__main__":
    main()
