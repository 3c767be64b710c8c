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
* a 16 kHz wav of matching length with PHONE-DEPENDENT formant audio in
  one of N distinct speaker voices (f0 / vocal-tract scale / tilt): a
  recognizer can learn phones from the spectrogram and a speaker
  embedder can separate voices, so round-trip WER and matched-vs-
  mismatched speaker similarity are real, falsifiable metrics,
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


# --- phone-dependent formant synthesis ----------------------------------
# Each base ARPAbet phone gets a distinct spectral recipe (formant pair
# for voiced sonorants, noise band for fricatives, closure+burst for
# stops).  This makes the corpus audio carry REAL phone information:
# a recognizer can learn phones from the spectrogram, and a TTS system
# must place the right spectra at the right times to round-trip —
# the fabricated-corpus equivalent of intelligibility.  (The round-2
# fabricator emitted the same harmonics for every phone, which made any
# audio-level eval vacuous.)

# (F1, F2) in Hz — standard American English vowel chart values.
_VOWEL_FORMANTS = {
    "IY": (270, 2290), "IH": (390, 1990), "EH": (530, 1840),
    "AE": (660, 1720), "AA": (730, 1090), "AO": (570, 840),
    "UH": (440, 1020), "UW": (300, 870), "AH": (640, 1190),
    "ER": (490, 1350), "EY": (400, 2100), "AY": (660, 1400),
    "AW": (680, 1100), "OY": (550, 960), "OW": (450, 950),
}
# voiced sonorant consonants: murmur-like formant pairs
_SONORANT_FORMANTS = {
    "W": (300, 700), "Y": (280, 2250), "R": (350, 1300), "L": (380, 1200),
    "M": (250, 1100), "N": (250, 1700), "NG": (250, 2000),
}
# fricatives: (band_lo, band_hi, voiced, amplitude)
_FRICATIVES = {
    "S": (5500, 7800, False, 0.10), "SH": (2500, 4500, False, 0.11),
    "Z": (5500, 7800, True, 0.08), "ZH": (2500, 4200, True, 0.08),
    "F": (4000, 6800, False, 0.07), "V": (3500, 5500, True, 0.07),
    "TH": (4500, 7200, False, 0.05), "DH": (4000, 6500, True, 0.06),
    "HH": (500, 2500, False, 0.05),
}
# stops: (burst_lo, burst_hi, voiced)
_STOPS = {
    "P": (600, 1500, False), "B": (600, 1500, True),
    "T": (4000, 7000, False), "D": (3000, 6000, True),
    "K": (1500, 3500, False), "G": (1200, 3000, True),
}
_AFFRICATES = {"CH": ("T", "SH"), "JH": ("D", "ZH")}


def make_speaker(spk_id: int):
    """Deterministic speaker voice: f0 base, vocal-tract scale, tilt."""
    srng = np.random.RandomState(1000 + spk_id)
    return {
        "f0": float(np.exp(srng.uniform(np.log(90.0), np.log(260.0)))),
        "vt_scale": float(srng.uniform(0.85, 1.2)),   # formant/band scaling
        "tilt": float(srng.uniform(0.3, 1.1)),        # spectral slope exponent
        "vibrato": float(srng.uniform(0.1, 0.35)),
    }


def _band_noise(n, lo, hi, rng):
    """White noise band-limited to [lo, hi] Hz via rFFT masking."""
    noise = rng.randn(n)
    spec = np.fft.rfft(noise)
    freqs = np.fft.rfftfreq(n, 1.0 / SR)
    spec[(freqs < lo) | (freqs > hi)] = 0.0
    out = np.fft.irfft(spec, n)
    peak = np.abs(out).max() + 1e-9
    return out / peak


def _voiced_segment(n, t0, spk, formants, rng):
    """Harmonic stack shaped by two formant resonances."""
    t = t0 + np.arange(n) / SR
    f0 = spk["f0"] * (1.0 + spk["vibrato"] * 0.05 * np.sin(2 * np.pi * 5.5 * t))
    phase0 = 2 * np.pi * np.cumsum(f0) / SR
    n_harm = max(int(4800 / spk["f0"]), 3)
    k = np.arange(1, n_harm + 1)[:, None]
    freqs = k * spk["f0"]
    f1, f2 = formants[0] * spk["vt_scale"], formants[1] * spk["vt_scale"]
    w = (
        np.exp(-0.5 * ((freqs - f1) / 120.0) ** 2)
        + 0.7 * np.exp(-0.5 * ((freqs - f2) / 180.0) ** 2)
        + 0.02
    ) / k ** spk["tilt"]
    seg = (w * np.sin(k * phase0[None, :])).sum(0)
    peak = np.abs(seg).max() + 1e-9
    return seg / peak


def _phone_audio(base, n, t0, spk, rng):
    """Waveform for one phone interval (n samples starting at t0 s)."""
    if base in ("sil", "sp", "spn", ""):
        return 0.0005 * rng.randn(n)
    if base in _AFFRICATES:
        stop, fric = _AFFRICATES[base]
        n1 = max(n // 3, 1)
        return np.concatenate(
            [_phone_audio(stop, n1, t0, spk, rng),
             _phone_audio(fric, n - n1, t0 + n1 / SR, spk, rng)]
        )
    scale = spk["vt_scale"]
    if base in _VOWEL_FORMANTS:
        return 0.22 * _voiced_segment(n, t0, spk, _VOWEL_FORMANTS[base], rng)
    if base in _SONORANT_FORMANTS:
        return 0.13 * _voiced_segment(n, t0, spk, _SONORANT_FORMANTS[base], rng)
    if base in _FRICATIVES:
        lo, hi, voiced, amp = _FRICATIVES[base]
        seg = amp * _band_noise(n, lo * scale, min(hi * scale, 7900), rng)
        if voiced:
            seg = seg + 0.10 * _voiced_segment(n, t0, spk, (300, 1000), rng)
        return seg
    if base in _STOPS:
        lo, hi, voiced = _STOPS[base]
        closure = max(int(n * 0.55), 1)
        burst = n - closure
        seg = np.zeros(n)
        seg[:closure] = 0.0005 * rng.randn(closure)
        if voiced:
            seg[:closure] += 0.03 * _voiced_segment(closure, t0, spk, (200, 600), rng)
        if burst > 0:
            env = np.exp(-np.arange(burst) / (0.35 * burst + 1))
            seg[closure:] = 0.16 * env * _band_noise(
                burst, lo * scale, min(hi * scale, 7900), rng
            )
        return seg
    # unknown symbol: weak mid noise, still distinct from silence
    return 0.02 * _band_noise(n, 800, 2400, rng)


def _wav_for(intervals, spk, rng: np.random.RandomState) -> np.ndarray:
    """Phone-dependent formant audio in the given speaker's voice."""
    n_total = int(round(intervals[-1][1] * SR))
    wav = np.zeros(n_total, dtype=np.float64)
    for a, b, text in intervals:
        i, j = int(round(a * SR)), int(round(b * SR))
        j = min(j, n_total)
        if j <= i:
            continue
        seg = _phone_audio(text.rstrip("012"), j - i, a, spk, rng)
        m = min(len(seg), j - i)
        ramp = min(32, m // 4)
        if ramp > 0:  # declick
            seg[:ramp] *= np.linspace(0, 1, ramp)
            seg[m - ramp : m] *= np.linspace(1, 0, ramp)
        wav[i : i + m] += seg[:m]
    wav += 0.0015 * rng.randn(n_total)
    return wav.astype(np.float32)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--n", type=int, default=300)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--n-speakers", type=int, default=24,
                        help="Speaker-pool size (voices: f0/tract-scale/tilt).")
    parser.add_argument("--dur-max", type=float, default=15.0,
                        help="Resample utterances whose draw exceeds this (s).")
    parser.add_argument("--prefix", default="utt",
                        help="Utterance stem prefix; distinct prefixes let "
                             "independently fabricated batches share one "
                             "precompute dir without filename collisions.")
    args = parser.parse_args()

    from flamed_tts_tpu.text.frontend import EnglishFrontend

    frontend = EnglishFrontend()
    words = sorted(frontend.lexicon.keys() or frontend.builtin.keys())
    rng = np.random.RandomState(args.seed)

    os.makedirs(args.out_dir, exist_ok=True)
    speakers = [make_speaker(s) for s in range(args.n_speakers)]
    manifest = []
    spk_map = []
    durations = []
    for u in range(args.n):
        spk_id = int(rng.randint(args.n_speakers))
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

        stem = f"{args.prefix}{u:05d}"
        tg = os.path.join(args.out_dir, f"{stem}.TextGrid")
        wv = os.path.join(args.out_dir, f"{stem}.wav")
        _textgrid(intervals, tg)
        from flamed_tts_tpu.utils.audio import save_wav

        save_wav(wv, _wav_for(intervals, speakers[spk_id], rng))
        manifest.append(f"{wv}|{tg}|{' '.join(sent)}")
        spk_map.append(f"{stem}|spk{spk_id:03d}")

    with open(os.path.join(args.out_dir, "fab_manifest.txt"), "w") as fout:
        fout.write("\n".join(manifest) + "\n")
    # utterance -> speaker map (consumed by the matched/mismatched-prompt
    # speaker-similarity eval; training itself never reads it)
    with open(os.path.join(args.out_dir, "speakers.txt"), "w") as fout:
        fout.write("\n".join(spk_map) + "\n")
    d = np.asarray(durations)
    print(
        f"Fabricated {args.n} utterances -> {args.out_dir}\n"
        f"duration s: min {d.min():.1f} p50 {np.percentile(d, 50):.1f} "
        f"p95 {np.percentile(d, 95):.1f} max {d.max():.1f} total {d.sum()/60:.1f} min"
    )


if __name__ == "__main__":
    main()
