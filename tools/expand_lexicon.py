#!/usr/bin/env python3
"""Materialize the morphological closure of the core lexicon.

The reference's frontend expects a ~200k-entry LibriSpeech lexicon
(reference flamed/models/flamed.py:238-249, absent from its release
mount) and falls back to g2p_en per word.  This offline environment has
no lexicon download, so coverage is grown the other defensible way:
English inflectional/derivational morphology is phonologically regular,
and expanding the 9.7k *verified* stems of english-core.txt with the
standard suffix sandhi rules (the same rules the runtime OOV path uses,
flamed_tts_tpu/text/frontend.py::inflect_oov) produces pronunciations
that are correct wherever the surface form is a real word, and harmless
otherwise (never looked up).

Generates lexicon/english-expanded.txt: `WORD<TAB>PH ON EH0 Z` lines,
sorted, excluding any word already present in the core lexicon.  The
frontend loads it as the lowest-priority lookup layer.

Usage:
  python tools/expand_lexicon.py [--out flamed_tts_tpu/lexicon/english-expanded.txt]
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Optional, Tuple

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from flamed_tts_tpu.text.frontend import (  # noqa: E402
    _BUILTIN_LEXICON,
    _SUFFIX_PHONES,
    _past_phones,
    _plural_phones,
    read_lexicon,
)

_VOWELS = "aeiou"


def plural_spelling(w: str) -> str:
    if w.endswith(("s", "x", "z", "ch", "sh")):
        return w + "es"
    if len(w) > 2 and w.endswith("y") and w[-2] not in _VOWELS:
        return w[:-1] + "ies"
    return w + "s"


def past_spelling(w: str) -> str:
    if w.endswith("e"):
        return w + "d"
    if len(w) > 2 and w.endswith("y") and w[-2] not in _VOWELS:
        return w[:-1] + "ied"
    return w + "ed"


def ing_spelling(w: str) -> str:
    if w.endswith("e") and not w.endswith(("ee", "oe", "ye")):
        return w[:-1] + "ing"
    return w + "ing"


def er_spelling(w: str, sfx: str) -> str:  # sfx in ("er", "est")
    if w.endswith("e"):
        return w + sfx[1:]
    if len(w) > 2 and w.endswith("y") and w[-2] not in _VOWELS:
        return w[:-1] + "i" + sfx
    return w + sfx


def ly_spelling(w: str) -> Optional[str]:
    if w.endswith("ly"):
        return None
    if len(w) > 2 and w.endswith("y") and w[-2] not in _VOWELS:
        return w[:-1] + "ily"
    if w.endswith("le"):
        return w[:-1] + "y"  # simple -> simply
    return w + "ly"


def ness_spelling(w: str) -> str:
    if len(w) > 2 and w.endswith("y") and w[-2] not in _VOWELS:
        return w[:-1] + "iness"
    return w + "ness"


_PREFIXES: List[Tuple[str, List[str]]] = [
    ("un", ["AH0", "N"]),
    ("re", ["R", "IY0"]),
    ("dis", ["D", "IH0", "S"]),
    ("mis", ["M", "IH0", "S"]),
    ("non", ["N", "AA1", "N"]),
    ("pre", ["P", "R", "IY0"]),
    ("over", ["OW1", "V", "ER0"]),
    ("out", ["AW1", "T"]),
    ("under", ["AH1", "N", "D", "ER0"]),
]


def _ily_phones(phones: List[str]) -> List[str]:
    # happy (HH AE1 P IY0) -> happily (HH AE1 P AH0 L IY0)
    if phones and phones[-1].rstrip("012") == "IY":
        return phones[:-1] + ["AH0", "L", "IY0"]
    return phones + _SUFFIX_PHONES["ly"]


def expand(core: Dict[str, List[str]]) -> Dict[str, List[str]]:
    out: Dict[str, List[str]] = {}

    def add(word: Optional[str], phones: List[str]):
        if not word or word in core:
            return
        out.setdefault(word, phones)

    for w, ph in core.items():
        if not w.isalpha() or len(w) < 2:
            continue
        ph = list(ph)
        pl = _plural_phones(ph)
        pa = _past_phones(ph)
        add(plural_spelling(w), pl)
        add(past_spelling(w), pa)
        add(ing_spelling(w), ph + _SUFFIX_PHONES["ing"])
        add(ing_spelling(w) + "s", _plural_phones(ph + _SUFFIX_PHONES["ing"]))
        er = er_spelling(w, "er")
        add(er, ph + _SUFFIX_PHONES["er"])
        add(plural_spelling(er), _plural_phones(ph + _SUFFIX_PHONES["er"]))
        add(er_spelling(w, "est"), ph + _SUFFIX_PHONES["est"])
        ly = ly_spelling(w)
        if ly:
            add(ly, _ily_phones(ph))
        add(ness_spelling(w), ph + _SUFFIX_PHONES["ness"])
        add(w + "ment", ph + _SUFFIX_PHONES["ment"])
        add(w + "ful", ph + _SUFFIX_PHONES["ful"])
        add(w + "less", ph + _SUFFIX_PHONES["less"])
        for pre, pre_ph in _PREFIXES:
            if not w.startswith(pre):
                add(pre + w, pre_ph + ph)
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(_BUILTIN_LEXICON), "english-expanded.txt"),
    )
    args = parser.parse_args()

    core = read_lexicon(_BUILTIN_LEXICON)
    expanded = expand(core)
    with open(args.out, "w", encoding="utf-8") as fout:
        for w in sorted(expanded):
            fout.write(f"{w.upper()}\t{' '.join(expanded[w])}\n")
    print(f"core {len(core)} stems -> {len(expanded)} expanded entries "
          f"({len(core) + len(expanded)} total) -> {args.out}")


if __name__ == "__main__":
    main()
