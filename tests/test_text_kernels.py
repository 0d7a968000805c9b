"""Ray-free unit tests for the frozen per-doc text kernels."""

import numpy as np

from ccrawler_ray.functions.dedup import word_hashes
from ccrawler_ray.functions.text import (REP_DUP5_MAX, REP_TOP2_MAX,
                                         _repetition_row)


def _row(text: str):
    return _repetition_row(word_hashes(text.split()))


def test_repetition_empty_and_short():
    assert _row("") == (0, 0.0, 0.0, 0.0, True)
    # single word: no bigram/5-gram slots
    n, dupw, top2, dup5, keep = _row("hello")
    assert (n, dupw, top2, dup5, keep) == (1, 0.0, 0.0, 0.0, True)
    # four words: still no 5-gram slots
    assert _row("a b c d")[3] == 0.0


def test_repetition_all_unique():
    n, dupw, top2, dup5, keep = _row("one two three four five six seven")
    assert n == 7
    assert dupw == 0.0 and dup5 == 0.0
    # every bigram occurs once: top fraction = 1/(n-1)
    assert top2 == np.floor(10_000 / 6) / 10_000
    assert keep


def test_repetition_pathological():
    # "a a a ... a" — every word duplicated, one bigram fills every
    # slot, every 5-gram duplicated
    n, dupw, top2, dup5, keep = _row("a " * 50)
    assert n == 50
    assert dupw == np.floor(49 * 10_000 / 50) / 10_000
    assert top2 == 1.0 and dup5 == 1.0
    assert not keep


def test_repetition_thresholds_exact():
    # keep flips exactly at the documented thresholds
    assert REP_TOP2_MAX == 0.18 and REP_DUP5_MAX == 0.30
    # doc with a repeated phrase but mostly unique text stays kept
    text = "the quick brown fox jumps over the lazy dog " * 1 + \
        "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    assert _row(text)[4]


def test_repetition_dup5_counts_all_duplicated_slots():
    # phrase of 5 words repeated twice with unique filler between:
    # both occurrences of the gram count as duplicated slots
    filler = " ".join(f"u{i}" for i in range(20))
    text = "p q r s t " + filler + " p q r s t"
    n, _, _, dup5, _ = _row(text)
    assert n == 30
    assert dup5 == np.floor(2 * 10_000 / (n - 4)) / 10_000
