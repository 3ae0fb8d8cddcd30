"""BatchComparator API parity (batch ≡ individual, both directions —
reference invariant src/distance/levenshtein.rs:1847-1875) and the
composite scorers (extensions; no reference vectors, see SURVEY §2.1)."""

import math
import random

import numpy as np
import pytest

from fuzzspark.kernels import ALL_METRICS, partial_ratio, ratio, token_set_ratio, token_sort_ratio
from fuzzspark.kernels.comparator import BatchComparator, RatioBatchComparator

PAIRS = [("South Korea", "North Korea"), ("kitten", "sitting"),
         ("", ""), ("", "abc"), ("aaaa", "bbbb"),
         ("Иванко", "Петрунко"), ("a" * 100, "a" * 99 + "b")]


@pytest.mark.parametrize("scorer", ["levenshtein", "lcs_seq", "osa",
                                    "indel", "jaro", "jaro_winkler",
                                    "damerau_levenshtein", "ratio"])
def test_batch_equals_individual_both_directions(scorer):
    for s1, s2 in PAIRS:
        c1 = BatchComparator(s1, scorer=scorer)
        c2 = BatchComparator(s2, scorer=scorer)
        a = c1.normalized_similarity(s2)
        b = c2.normalized_similarity(s1)
        assert math.isclose(a, b, abs_tol=1e-12)
        arr = c1.normalized_similarities([s2, s2, s1])
        assert math.isclose(arr[0], a, abs_tol=1e-12)
        assert math.isclose(arr[1], a, abs_tol=1e-12)


def test_ratio_batch_comparator():
    rc = RatioBatchComparator("this is a test")
    assert rc.ratio("this is a test!") == pytest.approx(0.9655172, abs=1e-4)
    out = rc.ratios(["this is a test!", "this is a test", "zzz"],
                    score_cutoff=0.9)
    assert out[0] == pytest.approx(0.9655172, abs=1e-4)
    assert out[1] == 1.0
    assert np.isnan(out[2])


def test_comparator_cutoff_semantics():
    c = BatchComparator("South Korea", scorer="levenshtein")
    assert c.distance("North Korea", score_cutoff=2) == 2
    assert c.distance("North Korea", score_cutoff=1) is None


def test_weighted_comparator():
    c = BatchComparator("kitten", scorer="levenshtein", weights=(1, 1, 2))
    assert c.distance("sitting") == 5
    assert list(c.distances(["sitting", "kitten"])) == [5.0, 0.0]


# ----------------------------- composites -------------------------------

def test_partial_ratio_semantics():
    # shorter contained in longer -> 1.0
    assert partial_ratio("test", "this is a test!") == 1.0
    assert partial_ratio("", "") == 1.0
    assert partial_ratio("", "abc") == 0.0
    # window never beats full equality
    assert partial_ratio("abcd", "abcd") == 1.0
    # bounded by ratio of best window, >= plain ratio
    for a, b in [("new york mets", "the wonderful new york mets"),
                 ("abcxyz", "qqabcqq")]:
        assert partial_ratio(a, b) >= ratio(a, b) - 1e-12


def test_token_sort_ratio_semantics():
    assert token_sort_ratio("fuzzy wuzzy was a bear",
                            "wuzzy fuzzy was a bear") == 1.0
    assert token_sort_ratio("a b c", "c b a") == 1.0
    assert token_sort_ratio("abc", "xyz") == 0.0


def test_token_set_ratio_semantics():
    # shared token set -> 1.0 regardless of duplicates/order
    assert token_set_ratio("fuzzy fuzzy bear", "bear fuzzy") == 1.0
    # supersets score >= token_sort
    a, b = "the quick brown fox", "quick fox jumps"
    assert token_set_ratio(a, b) >= token_sort_ratio(a, b) - 1e-12
    assert token_set_ratio("", "") == 1.0


def test_composites_cutoff():
    s = token_sort_ratio("a b", "b a")
    assert token_sort_ratio("a b", "b a", score_cutoff=s) == s
    assert token_set_ratio("abc", "xyz", score_cutoff=0.5) is None
    assert partial_ratio("ab", "zzzz", score_cutoff=0.9) is None
