#!/usr/bin/env python3
"""Render docs/runs/eval_disc_r*.json into EVAL_REPORT markdown tables
(stage-1/stage-2 margins, wer_synth) so the committed report can never
cite numbers its artifact doesn't contain."""

from __future__ import annotations

import json
import sys


def stage1_table(s):
    rows = []
    for name, d in s.items():
        if not isinstance(d, dict) or "margin" not in d:
            continue
        rows.append(
            f"| {name} | {d['same_mean']:.4f} | {d['diff_mean']:.4f} "
            f"| {d['margin']:+.4f} | {d['rank_acc']:.3f} |"
        )
    return (
        "| embedder | same-spk cos | diff-spk cos | margin | rank-acc |\n"
        "|---|---|---|---|---|\n" + "\n".join(rows)
    )


def stage2_table(s):
    rows = []
    for key, label in (
        ("asr_spk", "ASR speaker head (trained)"),
        ("melstats", "mel-stats"),
        ("codec_timbre", "codec timbre (trained r5)"),
    ):
        d = s.get(key)
        if not d:
            continue
        rows.append(
            f"| {label} | {d['mean_margin']:+.4f} | {d['frac_positive']:.3f} |"
        )
    out = (
        "| embedder | mean margin | frac positive |\n|---|---|---|\n"
        + "\n".join(rows)
    )
    w = s.get("wer_synth")
    if w:
        out += (
            f"\n\nwer_synth (nfe {s.get('nfe', '?')}): mean **{w['mean']:.3f}**, "
            f"median {w['median']:.3f} (n={w['n']})"
        )
    return out


def main():
    d = json.load(open(sys.argv[1]))
    for sec in ("stage1", "stage1_heldout", "stage2", "stage2_heldout"):
        if sec in d and isinstance(d[sec], dict):
            print(f"### {sec}\n")
            print(stage1_table(d[sec]) if sec.startswith("stage1") else stage2_table(d[sec]))
            print()


if __name__ == "__main__":
    main()
