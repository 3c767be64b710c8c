"""Text frontend: symbol-table and sequence parity with the reference."""

import numpy as np
import pytest

from flamed_tts_tpu.text import sequence_to_text, text_to_sequence
from flamed_tts_tpu.text.symbols import SYMBOL_TO_ID, symbols
from flamed_tts_tpu.text.frontend import EnglishFrontend
from flamed_tts_tpu.text.numbers_norm import normalize_numbers


def test_symbol_table_size():
    assert len(symbols) == 360


def test_symbol_table_exact():
    import sys
    import types
    import importlib.util

    pkg = types.ModuleType("flamed")
    pkg.__path__ = ["/root/reference/flamed"]
    sys.modules.setdefault("flamed", pkg)
    tpkg = types.ModuleType("flamed.text")
    tpkg.__path__ = ["/root/reference/flamed/text"]
    sys.modules.setdefault("flamed.text", tpkg)

    def load(name, path):
        if name in sys.modules:
            return sys.modules[name]
        spec = importlib.util.spec_from_file_location(name, path)
        m = importlib.util.module_from_spec(spec)
        sys.modules[name] = m
        spec.loader.exec_module(m)
        return m

    load("flamed.text.cmudict", "/root/reference/flamed/text/cmudict.py")
    load("flamed.text.pinyin", "/root/reference/flamed/text/pinyin.py")
    ref_symbols = load("flamed.text.symbols", "/root/reference/flamed/text/symbols.py")
    assert list(ref_symbols.symbols) == list(symbols)


def test_arpabet_sequences():
    seq = text_to_sequence("{sp HH AH0 L OW1}", ["basic_cleaners"])
    assert seq[0] == SYMBOL_TO_ID["@sp"]
    assert seq[1] == SYMBOL_TO_ID["@HH"]
    assert seq[-1] == SYMBOL_TO_ID["@OW1"]


def test_mixed_text_and_phones():
    seq = text_to_sequence("ab {K AE1 T} cd", ["basic_cleaners"])
    decoded = sequence_to_text(seq)
    assert "{K AE1 T}" in decoded or "K AE1 T" in decoded


def test_invalid_symbols_dropped():
    assert text_to_sequence("{ZZZ}", ["basic_cleaners"]) == []


def test_number_normalization():
    assert normalize_numbers("1984") == "nineteen eighty-four"
    assert normalize_numbers("2000") == "two thousand"
    assert normalize_numbers("2005") == "two thousand five"
    assert normalize_numbers("$5.25") == "five dollars, twenty-five cents"
    assert normalize_numbers("3rd") == "third"
    assert normalize_numbers("21st") == "twenty-first"
    # 1000 < n < 3000 is spoken year-style, matching the reference's
    # inflect(group=2) call (flamed/text/numbers.py:49-62).
    assert normalize_numbers("1,234") == "twelve thirty-four"
    assert normalize_numbers("3,456") == "three thousand four hundred fifty-six"
    assert normalize_numbers("10.5") == "ten point five"


def test_frontend_wraps_sp():
    fe = EnglishFrontend()
    ids, _, phone_string = fe("Hello world")
    assert phone_string.startswith("{sp ")
    assert ids.ndim == 2 and ids.dtype == np.int32
    assert ids[0, 0] == SYMBOL_TO_ID["@sp"]


def test_frontend_lexicon_lookup(tmp_path):
    lex = tmp_path / "lex.txt"
    lex.write_text("HELLO  HH AH0 L OW1\nWORLD  W ER1 L D\n")
    fe = EnglishFrontend(lexicon_path=str(lex))
    ids, _, phone_string = fe("hello world")
    assert phone_string == "{sp HH AH0 L OW1 W ER1 L D}"
