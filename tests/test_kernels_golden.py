"""Golden-vector parity tests, ported from the reference unit tests.

Every case cites the reference test it was lifted from (file:line of
/root/reference).  These pin the exact result semantics of the scorer
kernels — the correctness anchor for the whole pipeline.
"""

import math

import pytest

from fuzzspark.kernels import (
    HammingError,
    damerau_levenshtein,
    hamming,
    indel,
    jaro,
    jaro_winkler,
    lcs_seq,
    levenshtein,
    osa,
    postfix,
    prefix,
    ratio,
)

from golden_matrices import JARO_NAMES, JARO_SCORES, JW_NAMES, JW_SCORES

A = 1e-4  # reference assert_delta tolerance


def approx(x):
    return pytest.approx(x, abs=A)


# ---------------------------------------------------------------- fuzz.ratio
# src/fuzz.rs:44-46, 181-245
FILLER = "a" * 64  # not in reference; long-path smoke


@pytest.mark.parametrize("s1,s2,expected", [
    ("this is a test", "this is a test!", 0.9655172),  # src/fuzz.rs:44-46
    ("test", "test", 1.0),                             # src/fuzz.rs:181-203
    ("new york mets", "the wonderful new york mets", 0.65),  # src/fuzz.rs:206-213
    ("", "", 1.0),                                     # src/fuzz.rs:216-222
    ("test", "", 0.0),                                 # src/fuzz.rs:225-233
    ("", "test", 0.0),                                 # src/fuzz.rs:236-245
])
def test_ratio_golden(s1, s2, expected):
    assert ratio(s1, s2) == approx(expected)


@pytest.mark.parametrize("s1,s2", [
    ("South Korea", "North Korea"),  # issue206, src/fuzz.rs:248-273
    ("bc", "bca"),                   # issue210, src/fuzz.rs:276-301
])
def test_ratio_cutoff_boundary(s1, s2):
    score = ratio(s1, s2)
    assert ratio(s1, s2, score_cutoff=score + 0.0001) is None
    assert ratio(s1, s2, score_cutoff=score - 0.0001) == approx(score)


# ------------------------------------------------------------- levenshtein
# constants src/distance/levenshtein.rs:1825-1832
TEST, NO_SUFFIX, NO_SUFFIX2 = "aaaa", "aaa", "aaab"
SWAPPED1, SWAPPED2, REPLACE_ALL = "abaa", "baaa", "bbbb"


def test_lev_empty():
    # src/distance/levenshtein.rs:1922-1939 (empty) + docs :16-32
    assert levenshtein.distance("", "") == 0
    assert levenshtein.distance(TEST, "") == 4
    assert levenshtein.distance("kitten", "sitting") == 3
    assert levenshtein.distance("kitten", "sitting", weights=(1, 1, 2)) == 5


def test_lev_simple():
    # src/distance/levenshtein.rs:1941-1977
    assert levenshtein.distance(TEST, TEST) == 0
    assert levenshtein.distance(TEST, NO_SUFFIX) == 1
    assert levenshtein.distance(TEST, NO_SUFFIX2) == 1
    assert levenshtein.distance(SWAPPED1, SWAPPED2) == 2
    assert levenshtein.distance(TEST, REPLACE_ALL) == 4
    for pair, exp in [((TEST, TEST), 1.0), ((TEST, NO_SUFFIX), 0.75),
                      ((TEST, NO_SUFFIX2), 0.75), ((SWAPPED1, SWAPPED2), 0.5),
                      ((TEST, REPLACE_ALL), 0.0)]:
        assert levenshtein.normalized_similarity(*pair, score_cutoff=0.0) == approx(exp)


def test_lev_weighted_simple():
    # src/distance/levenshtein.rs:1981-2022
    w = (1, 1, 2)
    assert levenshtein.distance(TEST, TEST, weights=w) == 0
    assert levenshtein.distance(TEST, NO_SUFFIX, weights=w) == 1
    assert levenshtein.distance(SWAPPED1, SWAPPED2, weights=w) == 2
    assert levenshtein.distance(TEST, NO_SUFFIX2, weights=w) == 2
    assert levenshtein.distance(TEST, REPLACE_ALL, weights=w) == 8
    for pair, exp in [((TEST, TEST), 1.0), ((TEST, NO_SUFFIX), 0.8571),
                      ((SWAPPED1, SWAPPED2), 0.75), ((TEST, NO_SUFFIX2), 0.75),
                      ((TEST, REPLACE_ALL), 0.0)]:
        assert levenshtein.normalized_similarity(
            *pair, score_cutoff=0.0, weights=w) == approx(exp)


def test_lev_mbleven():
    # src/distance/levenshtein.rs:2024-2068
    a, b = "South Korea", "North Korea"
    assert levenshtein.distance(a, b) == 2
    assert levenshtein.distance(a, b, score_cutoff=4) == 2
    assert levenshtein.distance(a, b, score_cutoff=2) == 2
    assert levenshtein.distance(a, b, score_cutoff=1) is None
    assert levenshtein.distance(a, b, score_cutoff=0) is None
    w = (1, 1, 2)
    assert levenshtein.distance(a, b, weights=w) == 4
    assert levenshtein.distance(a, b, weights=w, score_cutoff=4) == 4
    assert levenshtein.distance(a, b, weights=w, score_cutoff=3) is None
    a, b = "aabc", "cccd"
    assert levenshtein.distance(a, b) == 4
    assert levenshtein.distance(a, b, score_cutoff=3) is None
    assert levenshtein.distance(a, b, weights=w) == 6
    assert levenshtein.distance(a, b, weights=w, score_cutoff=6) == 6
    assert levenshtein.distance(a, b, weights=w, score_cutoff=5) is None


BANDED_CASES = [
    # src/distance/levenshtein.rs:2070-2131 (whitespace in the Rust
    # source's string continuations is not part of the literals)
    ("kkkkbbbbfkkkkkkibfkkkafakkfekgkkkkkkkkkkbdbbddddddddddafkkkekkkhkk",
     "khddddddddkkkkdgkdikkccccckcckkkekkkkdddddddddddafkkhckkkkkdckkkcc", 36),
    ("ccddcddddddddddddddddddddddddddddddddddddddddddddddddddddaaaaaaaaaaa",
     "aaaaaaaaaaaaaadddddddddbddddddddddddddddddddddddddddddddddbddddddddd", 26),
]


@pytest.mark.parametrize("s1,s2,exp", BANDED_CASES)
def test_lev_banded(s1, s2, exp):
    assert levenshtein.distance(s1, s2) == exp
    assert levenshtein.distance(s2, s1) == exp


def test_lev_blockwise_and_unicode():
    # src/distance/levenshtein.rs:2133-2138, :2164-2169
    assert levenshtein.distance("a" * 128, "b" * 128) == 128
    assert levenshtein.distance("Иванко", "Петрунко") == 5


# ------------------------------------------------------------------- indel
def test_indel_golden():
    # src/distance/indel.rs:742-804
    a, b = "South Korea", "North Korea"
    assert indel.distance(a, b) == 4
    assert indel.distance(a, b, score_cutoff=5) == 4
    assert indel.distance(a, b, score_cutoff=4) == 4
    assert indel.distance(a, b, score_cutoff=3) is None
    assert indel.distance(a, b, score_cutoff=0) is None
    a, b = "aabc", "cccd"
    assert indel.distance(a, b) == 6
    assert indel.distance(a, b, score_cutoff=6) == 6
    assert indel.distance(a, b, score_cutoff=5) is None
    # src/distance/indel.rs:806-816
    assert indel.normalized_similarity("001", "220", score_cutoff=0.0) == approx(1 / 3)
    # src/distance/indel.rs:858-864 fuzzing regression
    assert indel.distance("ab", "ac") == 2
    # src/distance/indel.rs:850-856 unicode
    assert indel.distance("Иванко", "Петрунко") == 8


def test_indel_banded_regression():
    # src/distance/indel.rs:818-848 (508-edit and 231-edit cases);
    # exact literals extracted to _indel_banded_strings.py
    from _indel_banded_strings import S1, S2, S3, S4
    assert indel.distance(S1, S2) == 508
    assert indel.distance(S1, S2, score_cutoff=508) == 508
    assert indel.distance(S1, S2, score_cutoff=507) is None
    assert indel.distance(S3, S4) == 231


# ------------------------------------------------------------------ lcs_seq
def test_lcs_golden():
    # src/distance/lcs_seq.rs:1139-1246 ladders (subset)
    assert lcs_seq.similarity("South Korea", "North Korea") == 9
    assert lcs_seq.distance("South Korea", "North Korea") == 2
    assert lcs_seq.similarity("aaaa", "aaaa") == 4
    assert lcs_seq.distance("aaaa", "") == 4
    assert lcs_seq.similarity("abaa", "baaa") == 3


# --------------------------------------------------------------------- osa
def test_osa_golden():
    # src/distance/osa.rs:670-684
    assert osa.distance("", "") == 0
    assert osa.distance("aaaa", "") == 4
    assert osa.distance("aaaa", "", score_cutoff=1) is None
    assert osa.distance("CA", "ABC") == 3
    assert osa.distance("CA", "AC") == 1
    filler = "a" * 64
    s1 = "a" + filler + "CA" + filler + "a"
    s2 = "b" + filler + "AC" + filler + "b"
    assert osa.distance(s1, s2) == 3
    assert osa.distance("Иванко", "Петрунко") == 5


# ------------------------------------------------------- damerau_levenshtein
def test_damerau_golden():
    # src/distance/damerau_levenshtein.rs:639-700
    assert damerau_levenshtein.distance("", "") == 0
    assert damerau_levenshtein.distance(TEST, "") == 4
    assert damerau_levenshtein.distance(TEST, TEST) == 0
    assert damerau_levenshtein.distance(TEST, NO_SUFFIX) == 1
    assert damerau_levenshtein.distance(TEST, NO_SUFFIX2) == 1
    assert damerau_levenshtein.distance(SWAPPED1, SWAPPED2) == 1
    assert damerau_levenshtein.distance(TEST, REPLACE_ALL) == 4
    assert damerau_levenshtein.distance("CA", "ABC") == 2  # vs OSA == 3
    for pair, exp in [((TEST, TEST), 1.0), ((TEST, NO_SUFFIX), 0.75),
                      ((TEST, NO_SUFFIX2), 0.75), ((SWAPPED1, SWAPPED2), 0.75),
                      ((TEST, REPLACE_ALL), 0.0)]:
        assert damerau_levenshtein.normalized_similarity(
            *pair, score_cutoff=0.0) == approx(exp)
    assert damerau_levenshtein.distance("Иванко", "Петрунко") == 5


def test_damerau_unrestricted_transpositions():
    # unrestricted DL can edit inside a transposed block: d("ab","bca")=2
    assert damerau_levenshtein.distance("ab", "bca") == 2
    assert osa.distance("ab", "bca") == 3


# ----------------------------------------------------------------- hamming
def test_hamming_golden():
    # src/distance/hamming.rs:553-641
    assert hamming.distance("hamming", "hamming", pad=False) == 0
    assert hamming.distance("hamming", "hammers", pad=False) == 3
    assert hamming.distance("hammers", "hamming", pad=True) == 3
    assert hamming.distance("hammers", "hamming", pad=True, score_cutoff=3) == 3
    assert hamming.distance("hammers", "hamming", pad=True, score_cutoff=2) is None
    assert hamming.distance("hamming", "h香mmüng", pad=False) == 2
    with pytest.raises(HammingError):
        hamming.distance("ham", "hamming", pad=False)
    assert hamming.distance("ham", "hamming", pad=True) == 4
    assert hamming.distance("ham", "hamming", pad=True, score_cutoff=3) is None
    assert hamming.distance("Friedrich Nietzs", "Jean-Paul Sartre", pad=False) == 14


# ------------------------------------------------------------ prefix/postfix
def test_prefix_postfix():
    # src/distance/prefix.rs:47-69, postfix.rs:47-69 semantics
    assert prefix.similarity("prefix", "preference") == 4
    assert prefix.distance("prefix", "preference") == 6
    assert prefix.normalized_similarity("prefix", "preference") == approx(0.4)
    assert postfix.similarity("running", "jogging") == 3
    assert postfix.distance("running", "jogging") == 4
    assert prefix.similarity("", "") == 0
    assert prefix.normalized_distance("", "") == 0.0  # maximum==0 -> 0.0


# ------------------------------------------------------------- jaro family
def test_jaro_james_robert():
    # src/distance/jaro.rs:1081-1093
    assert jaro.similarity("james", "robert") == approx(0.455556)


def test_jaro_golden_matrix():
    # src/distance/jaro.rs:1095-1190: 20x20 matrix, 12 cutoffs
    n = len(JARO_NAMES)
    cutoffs = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0, 1.1]
    for i, n1 in enumerate(JARO_NAMES):
        for j, n2 in enumerate(JARO_NAMES):
            score = JARO_SCORES[i * n + j]
            assert jaro.similarity(n1, n2) == approx(score), (n1, n2)
            for c in cutoffs:
                sim = jaro.similarity(n1, n2, score_cutoff=c)
                dist = jaro.distance(n1, n2, score_cutoff=1.0 - c)
                if c <= score:
                    assert sim == approx(score)
                    assert dist == approx(1.0 - score)
                else:
                    assert sim is None
                    assert dist is None


def test_jaro_unicode():
    # src/distance/jaro.rs:1192-1200
    assert jaro.distance("Иванко", "Петрунко", score_cutoff=1.0) == approx(0.375)


def test_jaro_fuzzing_regressions():
    # src/distance/jaro.rs:1239-1257
    assert jaro.similarity("00", "0000000000000000000000000000000000"
                           ) == approx(jaro.similarity(
                               "0000000000000000000000000000000000", "00"))


def test_jw_golden_matrix():
    # src/distance/jaro_winkler.rs:694-799: 22x22 matrix
    n = len(JW_NAMES)
    for i, n1 in enumerate(JW_NAMES):
        for j, n2 in enumerate(JW_NAMES):
            score = JW_SCORES[i * n + j]
            assert jaro_winkler.similarity(n1, n2) == approx(score), (n1, n2)
            assert jaro_winkler.distance(n1, n2) == approx(1.0 - score)


def test_jw_prefix_boost():
    # jw("aaaaaaaa","aabaaab") = 0.82381 (src/distance/jaro_winkler.rs:790-791)
    assert jaro_winkler.similarity("aaaaaaaa", "aabaaab") == approx(0.82381)


# ---------------------------------------------------------- large inputs
# vendored from the reference's example data file
# (src/distance/example/ocr.rs — two OCR byte sequences, MIT/Apache
# licensed test data), gzip-packed so this test runs without
# /root/reference present: tools/vendor_ocr_fixture.py regenerates it.
OCR_VENDORED = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "data", "ocr_fixture.bin.gz")


def test_levenshtein_large_band_ocr():
    """Large-input sanity point (src/distance/levenshtein.rs:2140-2162):
    distance between the 106,514- and 107,244-element OCR sequences is
    5,278; cutoff 2500 suppresses it.  Bytes mapped to code points."""
    import gzip
    import struct
    with gzip.open(OCR_VENDORED, "rb") as f:
        payload = f.read()
    n1, n2 = struct.unpack("<II", payload[:8])
    s1 = payload[8:8 + n1].decode("latin-1")
    s2 = payload[8 + n1:8 + n1 + n2].decode("latin-1")
    assert (len(s1), len(s2)) == (106514, 107244)
    assert levenshtein.distance(s1, s2) == 5278
    assert levenshtein.distance(s1, s2, score_cutoff=2500) is None
    # indel/LCS large-input consistency: dist parity bound
    ind = indel.distance(s1, s2)
    assert ind >= 5278 and ind <= 2 * 5278
