"""Unit tests for the frozen per-doc text kernels (Ray-free except
the lm_perplexity engine≡serial differential)."""

import numpy as np
import pytest

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


# ---------------------------------------------------------------------------
# bigram-LM perplexity
# ---------------------------------------------------------------------------


def test_lm_kernel_known_values():
    """Hand-checked xent on a 2-doc toy model."""
    from ccrawler_ray.functions.text import _lm_doc_xent, _lm_lookup, _REP_C1

    # vocabulary {a, b}; training text "a b a b": uni a=2 b=2, bigrams
    # ab=2 ba=1; N=4 V=2
    ha, hb = np.uint64(11), np.uint64(22)
    uni_k = np.sort(np.array([ha, hb]))
    uni_c = np.array([2, 2], dtype=np.int64)
    C = np.uint64(_REP_C1)
    kab = ha * C + hb
    kba = hb * C + ha
    bi_k = np.sort(np.array([kab, kba]))
    bi_c = np.array([2 if bi_k[0] == kab else 1,
                     1 if bi_k[1] == kba else 2], dtype=np.int64)
    # doc "a b": p(a)=(2+1)/(4+2)=0.5, p(b|a)=(2+1)/(2+2)=0.75
    h = np.array([ha, hb], dtype=np.uint64)
    want = float(np.floor(-(np.log2(0.5) + np.log2(0.75)) * 10_000 / 2)
                 / 10_000)
    assert _lm_doc_xent(h, uni_k, uni_c, bi_k, bi_c, 4, 2) == want
    # empty doc
    assert _lm_doc_xent(np.array([], dtype=np.uint64),
                        uni_k, uni_c, bi_k, bi_c, 4, 2) == 0.0
    # OOV word: p = 1/(4+2) unigram, bigram denom = 0+V
    hx = np.uint64(33)
    assert _lm_lookup(uni_k, uni_c, np.array([hx], dtype=np.uint64))[0] == 0


@pytest.mark.usefixtures("ray_session")
def test_lm_perplexity_engine_eq_serial():
    """Distributed training + actor-pool scoring is bitwise equal to
    the serial dict-trained mirror at sf0.001."""
    import pandas as pd

    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions.text import lm_perplexity

    sf = "/root/testdata/sf0.001"
    got = (lm_perplexity(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = SR.lm_perplexity(sf).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)   # no tolerance: bitwise
    # the keep threshold actually splits the corpus
    assert 0.05 < got["keep"].mean() < 0.95


@pytest.mark.usefixtures("ray_session")
def test_ccnet_buckets_bitwise_and_tercile_sizes():
    """Engine (histogram-cut path, forced tiny blocks) == serial
    mirror (per-lang sort + 3*rank rule) bitwise; tercile sizes differ
    by at most 1 within every language."""
    import pandas as pd
    import ray.data

    from ccrawler_ray import serial_ref as SR
    from ccrawler_ray.functions.text import ccnet_buckets

    sf = "/root/testdata/sf0.001"
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024
    try:
        got = (ccnet_buckets(sf).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
    finally:
        ctx.target_max_block_size = old
    want = SR.ccnet_buckets(sf).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    for _, g in got.groupby("lang"):
        sizes = g["bucket"].value_counts()
        assert sizes.max() - sizes.min() <= 1


# --- Gopher rule filter: polars (rust-regex, engine) vs Python re
# (serial mirror) count equality on adversarial strings, plus frozen
# rule-threshold pins.

_GOPHER_TRICKY = [
    "",
    " ",
    "word",
    "the the the",
    "- bullet line\n* another\n• third\nplain",
    "ends with dots...\nand ellipsis…\nno end",
    "### ## # hash camp",
    "a#b ...c d... ...",
    "123 456 7a8 #9 ok",
    "mixed\nlines...\n- bullet...\nthe be to of and that have with",
    "tab\tsep  double  space\n\ntrailing \n",
    "…\n...\n.…\n..",
    "* \n-\n•x",
    "word... word…",
]


def test_gopher_counts_polars_eq_re():
    import re

    import polars as pl

    from ccrawler_ray.functions.text import (GOPHER_ALPHA_WORD_RE,
                                             GOPHER_BULLET_RE,
                                             GOPHER_ELLIPSIS_RE,
                                             GOPHER_NONSPACE_RE,
                                             GOPHER_STOPWORDS,
                                             GOPHER_SYM_RE,
                                             GOPHER_WORD_RE)

    t = pl.Series(_GOPHER_TRICKY)
    for pat in (GOPHER_WORD_RE, GOPHER_NONSPACE_RE, GOPHER_ALPHA_WORD_RE,
                GOPHER_SYM_RE, GOPHER_BULLET_RE, GOPHER_ELLIPSIS_RE):
        got = t.str.count_matches(pat).to_list()
        want = [len(re.findall(pat, s)) for s in _GOPHER_TRICKY]
        assert got == want, f"pattern {pat!r}: polars {got} != re {want}"
    for w in GOPHER_STOPWORDS:
        got = t.str.contains(rf"\b{w}\b").to_list()
        want = [bool(re.search(rf"\b{w}\b", s)) for s in _GOPHER_TRICKY]
        assert got == want, f"stopword {w}: {got} != {want}"


def test_gopher_flags_frozen_thresholds():
    from ccrawler_ray.functions.text import _gopher_flags

    # exactly at each boundary: 50 words, mwl 3.0, symbol ratio just
    # under 0.1, 90% bullets, 30% ellipsis, 80% alpha, 2 stopwords
    flags = _gopher_flags(n_words=50, mwl_q=30_000, syms=4, bullets=9,
                          ells=3, n_lines=10, alpha_words=40, stop_hits=2)
    assert all(bool(f) for f in flags)
    # one past each boundary flips exactly that flag
    assert not _gopher_flags(49, 30_000, 4, 9, 3, 10, 40, 2)[0]
    assert not _gopher_flags(50, 29_999, 4, 9, 3, 10, 40, 2)[1]
    assert not _gopher_flags(50, 30_000, 5, 9, 3, 10, 40, 2)[2]
    assert not _gopher_flags(50, 30_000, 4, 10, 3, 10, 40, 2)[3]
    assert not _gopher_flags(50, 30_000, 4, 9, 4, 10, 40, 2)[4]
    assert not _gopher_flags(50, 30_000, 4, 9, 3, 10, 39, 2)[5]
    assert not _gopher_flags(50, 30_000, 4, 9, 3, 10, 40, 1)[6]
