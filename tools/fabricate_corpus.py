#!/usr/bin/env python3
"""Fabricate a realistic training corpus: wav + MFA-style TextGrid pairs.

The reference trains from LibriTTS wavs + MFA alignments (reference
dataset.py:197-327); neither corpus nor aligner exists in this
environment, so this tool fabricates one with the same *shape*:

* transcripts sampled from the built-in lexicon's word list (5-40 words,
  Zipf-weighted toward short sentences),
* phones from the English frontend (lexicon + rule G2P — the exact
  phones training would see for this text),
* per-phone durations drawn log-normally around ~7 code frames (80 fps)
  with inter-word silences (p=0.18, 'sp'/'sil') and edge silences,
  giving a realistic 3-15 s utterance spread,
* a long-form TextGrid "phones" tier with interval boundaries on exact
  code-frame multiples (so compute_alignment round-trips losslessly),
* a 16 kHz wav of matching length (harmonic stack + noise bursts; the
  codec only needs plausible scale, not speech),
* a `manifest.txt` of `wav|textgrid|transcript` lines — the exact input
  of tools/precompute_dataset.py.

Usage:
  python tools/fabricate_corpus.py --out-dir /tmp/corpus --n 300 [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SR = 16000
HOP = 200          # codec hop: 80 frames/s
FPS = SR // HOP


def _textgrid(intervals, path: str) -> None:
    """Write a long-form TextGrid with one IntervalTier named 'phones'."""
    xmax = intervals[-1][1]
    lines = [
        'File type = "ooTextFile"',
        'Object class = "TextGrid"',
        "",
        "xmin = 0",
        f"xmax = {xmax:.6f}",
        "tiers? <exists>",
        "size = 1",
        "item []:",
        "    item [1]:",
        '        class = "IntervalTier"',
        '        name = "phones"',
        "        xmin = 0",
        f"        xmax = {xmax:.6f}",
        f"        intervals: size = {len(intervals)}",
    ]
    for i, (a, b, text) in enumerate(intervals, 1):
        lines += [
            f"        intervals [{i}]:",
            f"            xmin = {a:.6f}",
            f"            xmax = {b:.6f}",
            f'            text = "{text}"',
        ]
    with open(path, "w", encoding="utf-8") as fout:
        fout.write("\n".join(lines) + "\n")


def _wav_for(intervals, rng: np.random.RandomState) -> np.ndarray:
    """Speech-shaped filler audio: voiced harmonics during phones, low
    noise during silences."""
    n = int(round(intervals[-1][1] * SR))
    t = np.arange(n) / SR
    f0 = 110.0 * (1.0 + 0.3 * np.sin(2 * np.pi * 0.7 * t + rng.rand() * 6))
    phase = 2 * np.pi * np.cumsum(f0) / SR
    voiced = 0.12 * np.sin(phase) + 0.06 * np.sin(2 * phase) + 0.03 * np.sin(3 * phase)
    wav = 0.003 * rng.randn(n).astype(np.float64)
    for a, b, text in intervals:
        if text:  # a phone interval
            i, j = int(round(a * SR)), int(round(b * SR))
            env = np.hanning(max(j - i, 2)) * 0.7 + 0.3
            wav[i:j] += voiced[i:j] * env[: j - i]
    return wav.astype(np.float32)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--n", type=int, default=300)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dur-max", type=float, default=15.0,
                        help="Resample utterances whose draw exceeds this (s).")
    args = parser.parse_args()

    from flamed_tts_tpu.text.frontend import EnglishFrontend

    frontend = EnglishFrontend()
    words = sorted(frontend.lexicon.keys() or frontend.builtin.keys())
    rng = np.random.RandomState(args.seed)

    os.makedirs(args.out_dir, exist_ok=True)
    manifest = []
    durations = []
    for u in range(args.n):
        for _attempt in range(20):
            # Zipf-ish word-count draw in [5, 40].
            n_words = int(np.clip(rng.lognormal(np.log(14), 0.45), 5, 40))
            sent = [words[rng.randint(len(words))] for _ in range(n_words)]

            # phones per word + silence decisions
            intervals = []  # (start_s, end_s, label)
            frame = 0

            def emit(label: str, n_frames: int):
                nonlocal frame
                intervals.append(
                    (frame / FPS, (frame + n_frames) / FPS, label)
                )
                frame += n_frames

            emit("sil", int(rng.randint(4, 20)))  # leading silence
            for w_i, word in enumerate(sent):
                for ph in frontend.word_to_phones(word):
                    d = int(np.clip(rng.lognormal(np.log(6.0), 0.45), 2, 40))
                    emit(ph, d)
                if w_i < len(sent) - 1 and rng.rand() < 0.18:
                    emit("sp" if rng.rand() < 0.7 else "sil",
                         int(rng.randint(3, 30)))
            emit("sil", int(rng.randint(4, 24)))  # trailing silence

            dur = frame / FPS
            if dur <= args.dur_max:
                break
        durations.append(dur)

        stem = f"utt{u:05d}"
        tg = os.path.join(args.out_dir, f"{stem}.TextGrid")
        wv = os.path.join(args.out_dir, f"{stem}.wav")
        _textgrid(intervals, tg)
        from flamed_tts_tpu.utils.audio import save_wav

        save_wav(wv, _wav_for(intervals, rng))
        manifest.append(f"{wv}|{tg}|{' '.join(sent)}")

    with open(os.path.join(args.out_dir, "fab_manifest.txt"), "w") as fout:
        fout.write("\n".join(manifest) + "\n")
    d = np.asarray(durations)
    print(
        f"Fabricated {args.n} utterances -> {args.out_dir}\n"
        f"duration s: min {d.min():.1f} p50 {np.percentile(d, 50):.1f} "
        f"p95 {np.percentile(d, 95):.1f} max {d.max():.1f} total {d.sum()/60:.1f} min"
    )


if __name__ == "__main__":
    main()
