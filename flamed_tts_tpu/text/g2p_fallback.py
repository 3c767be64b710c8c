"""Rule-based English grapheme-to-phoneme fallback.

The reference falls back to the ``g2p_en`` neural G2P for words missing
from the lexicon (reference: flamed/models/flamed.py:261-264).  That
package is not available in this environment, so out-of-vocabulary words
are handled by a compact letter-to-sound rule engine producing ARPAbet.
When ``g2p_en`` IS importable it is preferred (see frontend.py).

This is intentionally simple: the LibriSpeech lexicon covers the vast
majority of words; the fallback only needs to produce pronounceable,
deterministic output for the tail.
"""

from __future__ import annotations

import re
from typing import List

# Ordered rules: (pattern at current position, phones, chars consumed).
# Longest-match-first within each leading letter.  Vowel phones carry no
# stress here; stress is assigned afterwards (primary on first vowel).
_RULES = [
    # multi-letter consonant clusters / digraphs
    ("tion", ["SH", "AH0", "N"]), ("sion", ["ZH", "AH0", "N"]),
    ("ough", ["AO", "F"]), ("augh", ["AE", "F"]),
    ("igh", ["AY"]), ("tch", ["CH"]), ("dge", ["JH"]),
    ("sch", ["S", "K"]), ("chr", ["K", "R"]),
    ("ck", ["K"]), ("ch", ["CH"]), ("sh", ["SH"]), ("th", ["TH"]),
    ("ph", ["F"]), ("wh", ["W"]), ("gh", ["G"]), ("ng", ["NG"]),
    ("qu", ["K", "W"]), ("wr", ["R"]), ("kn", ["N"]), ("gn", ["N"]),
    ("ps", ["S"]), ("mb$", ["M"]), ("cc", ["K", "S"]),
    # vowel teams
    ("eau", ["OW"]), ("iou", ["IY", "AH0"]),
    ("ai", ["EY"]), ("ay", ["EY"]), ("ea", ["IY"]), ("ee", ["IY"]),
    ("ei", ["EY"]), ("ey", ["IY"]), ("ie", ["IY"]), ("oa", ["OW"]),
    ("oe", ["OW"]), ("oi", ["OY"]), ("oy", ["OY"]), ("oo", ["UW"]),
    ("ou", ["AW"]), ("ow", ["OW"]), ("ue", ["UW"]), ("ui", ["UW"]),
    ("au", ["AO"]), ("aw", ["AO"]), ("eu", ["UW"]), ("ew", ["UW"]),
    # r-controlled vowels
    ("ar", ["AA", "R"]), ("er", ["ER"]), ("ir", ["ER"]),
    ("or", ["AO", "R"]), ("ur", ["ER"]),
    # single letters
    ("a", ["AE"]), ("b", ["B"]), ("c", ["K"]), ("d", ["D"]),
    ("e", ["EH"]), ("f", ["F"]), ("g", ["G"]), ("h", ["HH"]),
    ("i", ["IH"]), ("j", ["JH"]), ("k", ["K"]), ("l", ["L"]),
    ("m", ["M"]), ("n", ["N"]), ("o", ["AA"]), ("p", ["P"]),
    ("r", ["R"]), ("s", ["S"]), ("t", ["T"]), ("u", ["AH"]),
    ("v", ["V"]), ("w", ["W"]), ("x", ["K", "S"]), ("y", ["IY"]),
    ("z", ["Z"]),
]

_VOWEL_PHONES = {
    "AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY",
    "IH", "IY", "OW", "OY", "UH", "UW",
}

_SOFT_C_E = re.compile(r"^c[eiy]")
_SOFT_G_E = re.compile(r"^g[eiy]")


def _apply_rules(word: str) -> List[str]:
    phones: List[str] = []
    i = 0
    n = len(word)
    while i < n:
        rest = word[i:]
        # Context-sensitive softenings.
        if _SOFT_C_E.match(rest):
            phones.append("S")
            i += 1
            continue
        if _SOFT_G_E.match(rest):
            phones.append("JH")
            i += 1
            continue
        # Silent final e after a consonant (magic e).
        if rest == "e" and phones and phones[-1] not in _VOWEL_PHONES and len(word) > 2:
            break
        matched = False
        for pattern, rule_phones in _RULES:
            if pattern.endswith("$"):
                stem = pattern[:-1]
                if rest == stem:
                    phones.extend(rule_phones)
                    i += len(stem)
                    matched = True
                    break
            elif rest.startswith(pattern):
                phones.extend(rule_phones)
                i += len(pattern)
                matched = True
                break
        if not matched:
            i += 1  # skip unpronounceable character
    return phones


def rule_g2p(word: str) -> List[str]:
    """ARPAbet phones for a single word (lowercase letters only kept)."""
    cleaned = re.sub(r"[^a-z']", "", word.lower()).replace("'", "")
    if not cleaned:
        return []
    phones = _apply_rules(cleaned)
    # Stress: primary on the first vowel, none elsewhere; phones already
    # carrying an explicit stress digit (e.g. AH0 from -tion) keep it.
    out: List[str] = []
    stressed = False
    for p in phones:
        if p in _VOWEL_PHONES:
            if not stressed:
                out.append(p + "1")
                stressed = True
            else:
                out.append(p + "0")
        else:
            out.append(p)
    return out
