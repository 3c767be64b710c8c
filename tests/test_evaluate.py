"""Evaluation harness units."""

from tools.evaluate import word_error_rate


def test_wer_exact_match():
    assert word_error_rate("the cat sat", "the cat sat") == 0.0


def test_wer_substitution():
    assert word_error_rate("the cat sat", "the dog sat") == 1 / 3


def test_wer_insert_delete():
    assert word_error_rate("a b c d", "a b d") == 0.25
    assert word_error_rate("a b", "a x b y") == 1.0


def test_wer_case_insensitive():
    assert word_error_rate("Hello World", "hello world") == 0.0


def test_wer_empty_reference():
    assert word_error_rate("", "anything here") == 0.0
