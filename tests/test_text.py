"""Text frontend tests.

The reference text pipeline is pure Python, so expected outputs here are
golden strings derived from the reference behavior
(/root/reference/text/__init__.py, cleaners.py, numbers.py).
"""

import io

import pytest

from tacotron2_tpu.text import (
    CMUDict, N_SYMBOLS, SYMBOL_TO_ID, SYMBOLS, sequence_to_text,
    text_to_sequence,
)
from tacotron2_tpu.text.cleaners import english_cleaners, to_ascii
from tacotron2_tpu.text.numbers import (
    normalize_numbers, number_to_words, ordinal_words,
)


class TestSymbols:
    def test_inventory_size(self):
        assert N_SYMBOLS == 148

    def test_layout(self):
        # pad, special, punctuation, letters, arpabet — reference order.
        assert SYMBOLS[0] == "_"
        assert SYMBOLS[1] == "-"
        assert SYMBOLS[2] == "!"
        assert SYMBOL_TO_ID["a"] == 38
        assert SYMBOL_TO_ID["@AA"] == 64
        assert SYMBOLS[-1] == "@ZH"

    def test_unique(self):
        assert len(set(SYMBOLS)) == len(SYMBOLS)


class TestNumberWords:
    @pytest.mark.parametrize("n,words", [
        (0, "zero"),
        (7, "seven"),
        (15, "fifteen"),
        (42, "forty-two"),
        (100, "one hundred"),
        (101, "one hundred one"),
        (999, "nine hundred ninety-nine"),
        (3000, "three thousand"),
        (1234567, "one million, two hundred thirty-four thousand, "
                  "five hundred sixty-seven"),
    ])
    def test_cardinal(self, n, words):
        assert number_to_words(n, andword="") == words

    @pytest.mark.parametrize("n,words", [
        (1, "first"), (2, "second"), (3, "third"), (4, "fourth"),
        (5, "fifth"), (9, "ninth"), (12, "twelfth"), (20, "twentieth"),
        (21, "twenty-first"), (100, "one hundredth"), (33, "thirty-third"),
    ])
    def test_ordinal(self, n, words):
        assert ordinal_words(n) == words

    @pytest.mark.parametrize("text,expected", [
        # year-style readings (reference numbers.py:50-60)
        ("in 1984.", "in nineteen eighty-four."),
        ("in 1906.", "in nineteen oh six."),
        ("in 2000.", "in two thousand."),
        ("in 2008.", "in two thousand eight."),
        ("in 1900.", "in nineteen hundred."),
        ("in 3001.", "in three thousand, one."),
        # currency
        ("$1.50", "one dollar, fifty cents"),
        ("$1", "one dollar"),
        ("$0.99", "ninety-nine cents"),
        ("$2", "two dollars"),
        ("£100", "one hundred pounds"),
        # decimals, ordinals, comma groups. Note the reference expands each
        # digit run independently after the point ('14' -> 'fourteen'), and
        # de-comma'd 1,234 lands in the year-style group-of-two reading.
        ("3.14", "three point fourteen"),
        ("21st", "twenty-first"),
        ("1,234", "twelve thirty-four"),
        ("4,001", "four thousand, one"),
    ])
    def test_normalize(self, text, expected):
        assert normalize_numbers(text) == expected


class TestCleaners:
    def test_english_pipeline(self):
        assert english_cleaners("Dr. Smith   bought 2 apples!") == \
            "doctor smith bought two apples!"

    def test_abbreviations_case_insensitive(self):
        assert english_cleaners("MRS. Jones met Lt. Brown") == \
            "misess jones met lieutenant brown"

    def test_transliteration(self):
        assert to_ascii("Crème brûlée à la café") == "Creme brulee a la cafe"
        assert to_ascii("Æsop's œuvre — naïve") == "AEsop's oeuvre -- naive"

    def test_whitespace_collapse(self):
        assert english_cleaners("a\t b\n  c") == "a b c"


class TestSequences:
    def test_roundtrip_plain(self):
        seq = text_to_sequence("hello, world.", ["english_cleaners"])
        assert sequence_to_text(seq) == "hello, world."

    def test_arpabet_passthrough(self):
        seq = text_to_sequence(
            "Turn left on {HH AW1 S T AH0 N} Street.", ["english_cleaners"])
        text = sequence_to_text(seq)
        assert "{HH AW1 S T AH0 N}" in text
        # ARPAbet IDs are in the @-symbol range
        assert any(s >= 64 for s in seq)

    def test_unknown_chars_dropped(self):
        seq = text_to_sequence("a#b", ["basic_cleaners"])
        assert sequence_to_text(seq) == "ab"

    def test_pad_never_emitted(self):
        seq = text_to_sequence("a_b", ["basic_cleaners"])
        assert 0 not in seq

    def test_empty(self):
        assert text_to_sequence("", ["english_cleaners"]) == []


class TestCMUDict:
    def test_parse_and_lookup(self):
        data = io.StringIO(
            ";;; comment line\n"
            "HELLO  HH AH0 L OW1\n"
            "HELLO(1)  HH EH0 L OW1\n"
            "WORLD  W ER1 L D\n"
            "BADPHONE  QQ XX\n"
        )
        d = CMUDict(data)
        assert len(d) == 2
        assert d.lookup("hello") == ["HH AH0 L OW1", "HH EH0 L OW1"]
        assert d.lookup("WORLD") == ["W ER1 L D"]
        assert d.lookup("badphone") is None

    def test_unambiguous_filter(self):
        data = io.StringIO(
            "HELLO  HH AH0 L OW1\n"
            "HELLO(1)  HH EH0 L OW1\n"
            "WORLD  W ER1 L D\n"
        )
        d = CMUDict(data, keep_ambiguous=False)
        assert len(d) == 1
        assert d.lookup("hello") is None


class TestRobustness:
    """Fuzz-ish inputs must never crash the frontend."""

    @pytest.mark.parametrize("text", [
        "", " ", "...", "{}", "{", "}", "{}{}{}", "a{b", "a}b",
        "1234567890" * 5, "$", "£", "éüßæ",
        "你好世界",  # non-Latin drops to nothing
        "MiXeD CaSe With 3rd and $5.50 totals!",
        "tabs\tand\nnewlines\r\n", "'''''", "a" * 500,
    ])
    def test_never_crashes(self, text):
        seq = text_to_sequence(text, ["english_cleaners"])
        assert isinstance(seq, list)
        assert all(0 < s < 148 for s in seq)
        sequence_to_text(seq)  # roundtrip also safe

    def test_nested_braces_degrade_gracefully(self):
        seq = text_to_sequence("{HH {AH0} S}", ["english_cleaners"])
        assert isinstance(seq, list)
