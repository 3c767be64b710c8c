#!/usr/bin/env python3
"""Matched/mismatched-prompt speaker-discrimination evaluation.

The round-3 verdict's core objection to the eval harness: both committed
speaker-similarity numbers were saturation artifacts (random codec
timbre ~0.9999 for everything), so nothing demonstrated the evaluator
can *discriminate*.  This tool makes discrimination itself the metric,
in two falsifiable stages:

Stage 1 — embedder ground truth (no TTS checkpoint needed):
  On the fabricated corpus (tools/fabricate_corpus.py, N-speaker voice
  pool), compute speaker embeddings of REAL audio with both embedders
  (codec timbre encoder + independent mel-stats), and report
  mean cosine(same-speaker pairs) - mean cosine(different-speaker pairs)
  plus pair-ranking accuracy.  A positive margin with high accuracy
  proves the embedder separates the corpus voices; a ~0 margin flags a
  saturated embedder (expected for a random-weight codec encoder).

Stage 2 — TTS speaker-transfer margins (--ckpt <trained .npz>):
  For K held-out items, synthesize the item's text with a prompt from
  speaker A, then compare sim(synth, prompt A) against
  sim(synth, audio of a different speaker B).  matched > mismatched by
  a clear margin means the system actually transfers the prompt
  speaker — the product-level claim of zero-shot TTS (reference
  flamed/models/flamed.py:89-166 is the sampling surface under test;
  the reference itself ships no eval — its Makefile:103-104 eval target
  is a placeholder).

Usage:
  python tools/eval_discrimination.py --corpus _work/corpus_r4            # stage 1
  python tools/eval_discrimination.py --corpus _work/corpus_r4 \
      --ckpt exp/demo/ckpt_best.npz --cfg configs_demo [--n-synth 12]     # + stage 2

Prints one JSON report line to stdout (and a human-readable table to
stderr).
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tools.evaluate import _cosine, mel_stats_embedding  # noqa: E402

SR = 16000


def read_corpus(corpus_dir: str) -> List[Tuple[str, str, str]]:
    """[(wav_path, transcript, speaker_id)] joining manifest + speakers."""
    spk = {}
    with open(os.path.join(corpus_dir, "speakers.txt"), encoding="utf-8") as fin:
        for line in fin:
            if "|" in line:
                stem, s = line.strip().split("|", 1)
                spk[stem] = s
    items = []
    with open(os.path.join(corpus_dir, "fab_manifest.txt"), encoding="utf-8") as fin:
        for line in fin:
            parts = line.strip().split("|")
            if len(parts) < 3:
                continue
            wav_path, _tg, text = parts[0], parts[1], parts[2]
            stem = os.path.splitext(os.path.basename(wav_path))[0]
            if stem in spk:
                items.append((wav_path, text, spk[stem]))
    return items


def trim_to_speech(wav: np.ndarray, seconds: float = 3.0) -> np.ndarray:
    """Crop a centered window (skips the leading/trailing silence the
    fabricator always emits) so prompt buckets stay small and the
    embedding is dominated by speech, not silence."""
    n = int(seconds * SR)
    if len(wav) <= n:
        return wav
    start = (len(wav) - n) // 2
    return wav[start : start + n]


def pair_margins(
    embs: Dict[str, List[np.ndarray]],
) -> Tuple[float, float, float, int, int]:
    """(same_mean, diff_mean, rank_acc, n_same, n_diff) over all pairs.

    rank_acc: fraction of (same-pair, diff-pair) comparisons where the
    same-speaker pair scores higher — a threshold-free separability
    statistic (1.0 = perfectly separable, 0.5 = chance).
    """
    same, diff = [], []
    speakers = sorted(embs.keys())
    for s in speakers:
        for a, b in itertools.combinations(embs[s], 2):
            same.append(_cosine(a, b))
    for s1, s2 in itertools.combinations(speakers, 2):
        for a in embs[s1]:
            for b in embs[s2]:
                diff.append(_cosine(a, b))
    if not same or not diff:
        return float("nan"), float("nan"), float("nan"), len(same), len(diff)
    same_a, diff_a = np.asarray(same), np.asarray(diff)
    # Sampled ranking accuracy (full cross product can be large).
    rng = np.random.RandomState(0)
    k = min(20000, len(same_a) * len(diff_a))
    acc = float(
        np.mean(
            same_a[rng.randint(len(same_a), size=k)]
            > diff_a[rng.randint(len(diff_a), size=k)]
        )
    )
    return float(same_a.mean()), float(diff_a.mean()), acc, len(same), len(diff)


def load_recognizer():
    """ONE PhonemeRecognizer shared by the ASR speaker embedder and the
    WER transcriber (weights npz + lexicon trie load once), or None when
    no committed weights exist.  Only a missing weights file is
    tolerated; a genuine code breakage (ImportError etc.) propagates."""
    from flamed_tts_tpu.asr import PhonemeRecognizer

    try:
        return PhonemeRecognizer()
    except FileNotFoundError:
        return None


def asr_speaker_embedder(rec):
    """wav -> (64,) embedding from the trained recognizer's speaker head
    (flamed_tts_tpu/asr.py, trained by tools/train_asr.py), or None when
    the weights carry no speaker head.  This is the only *learned on real
    speaker labels* embedder in the harness."""
    if rec is None or "spk_w" not in rec.params:
        return None
    return rec.speaker_embedding


def stage1(items, codec, n_utts: int, seed: int, rec=None) -> Dict:
    """Embedder ground truth on real corpus audio."""
    from flamed_tts_tpu.utils.audio import load_wav

    asr_embed = asr_speaker_embedder(rec)
    rng = np.random.RandomState(seed)
    by_spk: Dict[str, List[Tuple[str, str]]] = {}
    for wav_path, text, s in items:
        by_spk.setdefault(s, []).append((wav_path, text))
    # Keep speakers with >= 2 utterances; sample utterances evenly.
    speakers = sorted(s for s, lst in by_spk.items() if len(lst) >= 2)
    per_spk = max(2, n_utts // max(len(speakers), 1))

    embs_codec: Dict[str, List[np.ndarray]] = {}
    embs_mel: Dict[str, List[np.ndarray]] = {}
    embs_asr: Dict[str, List[np.ndarray]] = {}
    for s in speakers:
        lst = by_spk[s]
        idx = rng.permutation(len(lst))[:per_spk]
        for i in idx:
            wav = trim_to_speech(load_wav(lst[i][0]))
            _, timbre = codec.encode_prompt(wav)
            embs_codec.setdefault(s, []).append(timbre)
            embs_mel.setdefault(s, []).append(mel_stats_embedding(wav))
            if asr_embed is not None:
                embs_asr.setdefault(s, []).append(asr_embed(wav))

    out = {}
    embedders = [("codec_timbre", embs_codec), ("melstats", embs_mel)]
    if asr_embed is not None:
        embedders.append(("asr_spk", embs_asr))
    for name, embs in embedders:
        same, diff, acc, n_s, n_d = pair_margins(embs)
        out[name] = {
            "same_mean": round(same, 4),
            "diff_mean": round(diff, 4),
            "margin": round(same - diff, 4),
            "rank_acc": round(acc, 4),
            "n_same_pairs": n_s,
            "n_diff_pairs": n_d,
        }
        print(
            f"[stage1] {name:13s} same {same:.4f}  diff {diff:.4f}  "
            f"margin {same - diff:+.4f}  rank_acc {acc:.3f} "
            f"({n_s}/{n_d} pairs)",
            file=sys.stderr,
        )
    out["n_speakers"] = len(speakers)
    return out


def stage2(
    items, codec, ckpt: str, cfg_dir: str, n_synth: int, nsteps: int,
    seed: int, out_dir: Optional[str], rec=None,
) -> Dict:
    """Synthesize with matched prompts; measure matched-vs-mismatched
    similarity margins of the SYNTHESIZED audio."""
    import jax

    from flamed_tts_tpu.config import compose_training_config, load_yaml
    from flamed_tts_tpu.models.flamed import Flamed
    from flamed_tts_tpu.utils.audio import load_wav, save_wav

    if os.path.isdir(cfg_dir):
        cfg = compose_training_config(
            *(os.path.join(cfg_dir, f"{n}.yaml")
              for n in ("prior", "prob", "codec", "optimizer", "data"))
        )
    else:
        cfg = load_yaml(cfg_dir)
    model = Flamed.from_pretrained(cfg, ckpt)

    rng = np.random.RandomState(seed)
    by_spk: Dict[str, List[Tuple[str, str]]] = {}
    for wav_path, text, s in items:
        by_spk.setdefault(s, []).append((wav_path, text))
    speakers = sorted(s for s, lst in by_spk.items() if len(lst) >= 2)
    if len(speakers) < 2:
        raise SystemExit("need >= 2 speakers with >= 2 utterances for stage 2")

    asr_embed = asr_speaker_embedder(rec)
    recognizer = rec
    from tools.evaluate import word_error_rate

    margins_codec, margins_mel, margins_asr, wers = [], [], [], []
    rows = []
    for k in range(n_synth):
        spk_a, spk_b = rng.choice(speakers, size=2, replace=False)
        # prompt and text from DIFFERENT utterances of speaker A
        (p_idx, t_idx) = rng.permutation(len(by_spk[spk_a]))[:2]
        prompt_wav = trim_to_speech(load_wav(by_spk[spk_a][p_idx][0]))
        # short text window: bounds synthesis length + compile buckets
        text = " ".join(by_spk[spk_a][t_idx][1].split()[:8])
        other_wav = trim_to_speech(
            load_wav(by_spk[spk_b][rng.randint(len(by_spk[spk_b]))][0])
        )

        out = model.sample(
            text=text,
            prompt_raw=prompt_wav,
            codec=codec,
            nsteps_durgen=nsteps,
            nsteps_denoiser=nsteps,
            rng=jax.random.PRNGKey(seed + k),
        )
        synth = out["wav"]
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            save_wav(os.path.join(out_dir, f"disc{k:03d}_{spk_a}.wav"), synth)

        _, t_synth = codec.encode_prompt(np.asarray(synth))
        _, t_prompt = codec.encode_prompt(prompt_wav)
        _, t_other = codec.encode_prompt(other_wav)
        m_codec = _cosine(t_synth, t_prompt) - _cosine(t_synth, t_other)

        e_synth = mel_stats_embedding(np.asarray(synth))
        m_mel = _cosine(e_synth, mel_stats_embedding(prompt_wav)) - _cosine(
            e_synth, mel_stats_embedding(other_wav)
        )
        margins_codec.append(m_codec)
        margins_mel.append(m_mel)
        row = {"spk": spk_a, "vs": spk_b, "text": text,
               "dur_s": round(len(synth) / SR, 2),
               "margin_codec": round(m_codec, 4), "margin_mel": round(m_mel, 4)}
        if recognizer is not None:
            _, hyp = recognizer.transcribe(np.asarray(synth))
            w = word_error_rate(text, hyp, canon=recognizer.canon)
            wers.append(w)
            row["wer"] = round(w, 4)
            row["hyp"] = hyp
        m_asr = None
        if asr_embed is not None:
            a_synth = asr_embed(np.asarray(synth))
            m_asr = _cosine(a_synth, asr_embed(prompt_wav)) - _cosine(
                a_synth, asr_embed(other_wav)
            )
            margins_asr.append(m_asr)
            row["margin_asr"] = round(m_asr, 4)
        rows.append(row)
        print(
            f"[stage2] {k:2d} {spk_a}->vs {spk_b}: codec {m_codec:+.4f} "
            f"mel {m_mel:+.4f}"
            + (f" asr {m_asr:+.4f}" if m_asr is not None else "")
            + (f" wer {row['wer']:.2f}" if "wer" in row else "")
            + f" ({len(synth) / SR:.2f}s)",
            file=sys.stderr,
        )

    def _summ(vals):
        v = np.asarray(vals)
        return {
            "mean_margin": round(float(v.mean()), 4),
            "frac_positive": round(float((v > 0).mean()), 3),
        }

    out = {
        "n_synth": n_synth,
        "nfe": nsteps,
        "codec_timbre": _summ(margins_codec),
        "melstats": _summ(margins_mel),
        "items": rows,
    }
    if margins_asr:
        out["asr_spk"] = _summ(margins_asr)
    if wers:
        out["wer_synth"] = {
            "mean": round(float(np.mean(wers)), 4),
            "median": round(float(np.median(wers)), 4),
            "n": len(wers),
        }
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--corpus", required=True,
                        help="fabricated-corpus dir (fab_manifest.txt + speakers.txt)")
    parser.add_argument("--ckpt", default=None,
                        help="trained Flamed .npz; omit (or 'random'/'none') "
                             "to run stage 1 only")
    parser.add_argument("--cfg", default="configs_demo")
    parser.add_argument("--codec-dir", default="random")
    parser.add_argument("--n-utts", type=int, default=48,
                        help="stage-1 utterance budget across speakers")
    parser.add_argument("--n-synth", type=int, default=12)
    parser.add_argument("--nsteps", type=int, default=32)
    parser.add_argument("--out-dir", default=None,
                        help="where to keep the stage-2 synthesized wavs")
    parser.add_argument("--out-json", default=None,
                        help="write the report here after EVERY stage "
                             "(stdout still gets the final JSON)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--holdout-speakers", default="",
                        help="Comma-separated speaker ids excluded from all "
                             "training; adds stage1_heldout/stage2_heldout "
                             "reports restricted to them.")
    parser.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    args = parser.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from flamed_tts_tpu.config import load_default_config
    from flamed_tts_tpu.models.codec_wrapper import FaCodec

    if args.codec_dir == "random":
        codec = FaCodec.random_init(jax.random.PRNGKey(0))
    else:
        codec = FaCodec.from_pretrained(
            load_default_config()["codec_cfg"], ckpt_dir=args.codec_dir
        )

    items = read_corpus(args.corpus)
    rec = load_recognizer()
    holdout = set(s for s in args.holdout_speakers.split(",") if s)
    report: Dict = {"corpus": args.corpus, "n_items": len(items)}

    def flush():
        # Incremental: a wall-clock kill mid-stage keeps every finished
        # stage (a 25-min run dying 20 s before the end must not lose
        # its artifact).
        if args.out_json:
            with open(args.out_json, "w", encoding="utf-8") as f:
                json.dump(report, f)

    report["stage1"] = stage1(items, codec, args.n_utts, args.seed, rec=rec)
    flush()
    if holdout:
        held_items = [it for it in items if it[2] in holdout]
        print(f"[stage1] held-out speakers only ({sorted(holdout)}):",
              file=sys.stderr)
        report["stage1_heldout"] = stage1(
            held_items, codec, args.n_utts, args.seed, rec=rec
        )
        flush()

    if args.ckpt and args.ckpt not in ("random", "none"):
        report["stage2"] = stage2(
            items, codec, args.ckpt, args.cfg, args.n_synth, args.nsteps,
            args.seed, args.out_dir, rec=rec,
        )
        flush()
        if holdout:
            # zero-shot leg: prompts from speakers excluded from ALL
            # training (codec, Flamed, ASR) — the product claim under test
            held_items = [it for it in items if it[2] in holdout]
            print(f"[stage2] held-out-speaker prompts only:", file=sys.stderr)
            report["stage2_heldout"] = stage2(
                held_items, codec, args.ckpt, args.cfg, args.n_synth,
                args.nsteps, args.seed,
                args.out_dir and args.out_dir + "_heldout", rec=rec,
            )
            flush()

    print(json.dumps(report))


if __name__ == "__main__":
    main()
