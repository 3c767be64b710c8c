"""English text -> phoneme-id preprocessing (host side).

Mirrors the reference's ``Flamed._preprocess_english``
(flamed/models/flamed.py:251-270): strip trailing punctuation, split on
punctuation/whitespace, look each word up in a pronouncing lexicon with a
G2P fallback, wrap as "{sp ...}", and run through ``text_to_sequence``.
"""

from __future__ import annotations

import os
import re
from string import punctuation
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from flamed_tts_tpu.text import text_to_sequence
from flamed_tts_tpu.text.g2p_fallback import rule_g2p
from flamed_tts_tpu.text.numbers_norm import normalize_numbers

_WORD_SPLIT_RE = re.compile(r"([,;.\-\?\!\s+])")
_EMPTY_BRACE_RE = re.compile(r"\{[^\w\s]?\}")

_DEFAULT_LEXICON = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "lexicon",
    "librispeech-lexicon.txt",
)


def read_lexicon(lexicon_path: Optional[str] = None) -> Dict[str, List[str]]:
    """Parse a whitespace-separated word -> phones lexicon file.

    First occurrence of each (lowercased) word wins, as in the reference
    (flamed/models/flamed.py:238-249).  Missing files yield an empty
    lexicon (the reference's lexicon blob is absent from its release too;
    the G2P fallback then handles every word).
    """
    path = lexicon_path or _DEFAULT_LEXICON
    lexicon: Dict[str, List[str]] = {}
    if not os.path.isfile(path):
        return lexicon
    with open(path, encoding="utf-8") as fin:
        for line in fin:
            fields = re.split(r"\s+", line.strip("\n"))
            if not fields or not fields[0]:
                continue
            word, phones = fields[0], fields[1:]
            key = word.lower()
            if key not in lexicon:
                lexicon[key] = phones
    return lexicon


def _load_optional_g2p():
    try:  # pragma: no cover - exercised only when g2p_en is installed
        from g2p_en import G2p

        return G2p()
    except Exception:
        return None


class EnglishFrontend:
    """Stateful frontend bundling the lexicon and the G2P fallback."""

    def __init__(
        self,
        lexicon_path: Optional[str] = None,
        cleaners: Sequence[str] = ("english_cleaners",),
    ):
        self.lexicon = read_lexicon(lexicon_path)
        self.cleaners = list(cleaners)
        self._g2p = _load_optional_g2p()

    def word_to_phones(self, word: str) -> List[str]:
        key = word.lower()
        if key in self.lexicon:
            return list(self.lexicon[key])
        if self._g2p is not None:
            return [p for p in self._g2p(word) if p != " "]
        return rule_g2p(word)

    def text_to_phone_string(self, text: str) -> str:
        # The reference's g2p_en fallback normalizes digits internally; our
        # rule fallback does not, so expand numbers up front.
        text = normalize_numbers(text)
        text = text.rstrip(punctuation)
        phones: List[str] = []
        for word in _WORD_SPLIT_RE.split(text):
            if not word:
                continue
            phones.extend(self.word_to_phones(word))
        phone_string = "{sp " + " ".join(phones) + "}"
        phone_string = _EMPTY_BRACE_RE.sub("{sp}", phone_string)
        return phone_string.replace("}{", " ")

    def __call__(self, text: str) -> Tuple[np.ndarray, str, str]:
        """Return (phoneme ids int32 [1, L], original text, phone string)."""
        phone_string = self.text_to_phone_string(text)
        sequence = np.asarray(
            text_to_sequence(phone_string, self.cleaners), dtype=np.int32
        )
        return sequence[None, :], text, phone_string
