"""Spark round-trip: createDataFrame → scorer UDF → collect must equal
the scalar kernels (reference batch ≡ individual invariant,
src/distance/levenshtein.rs:1847-1875, lifted to the Spark layer)."""

import pytest

from fuzzspark.kernels import ALL_METRICS
from fuzzspark.kernels.fuzz import ratio_raw
from fuzzspark.functions import length_prefilter, scorer_column

from pyspark.sql import functions as F

PAIRS = [
    ("this is a test", "this is a test!"),
    ("South Korea", "North Korea"),
    ("kitten", "sitting"),
    ("", ""), ("", "abc"), ("abc", ""),
    ("Иванко", "Петрунко"),
    ("a" * 80 + "x", "a" * 80 + "y"),
    ("CA", "ABC"),
    (None, "abc"), ("abc", None),
]


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(PAIRS, "s1: string, s2: string").cache()


@pytest.mark.parametrize("scorer", ["levenshtein", "indel", "lcs_seq", "osa",
                                    "damerau_levenshtein", "jaro",
                                    "jaro_winkler", "prefix", "postfix"])
def test_udf_matches_scalar(spark, pairs_df, scorer):
    mod = ALL_METRICS[scorer]
    rows = (pairs_df
            .withColumn("d", scorer_column(scorer, "s1", "s2", "distance"))
            .withColumn("ns", scorer_column(scorer, "s1", "s2",
                                            "normalized_similarity"))
            .collect())
    for r in rows:
        if r["s1"] is None or r["s2"] is None:
            assert r["d"] is None and r["ns"] is None
            continue
        assert r["d"] == pytest.approx(mod.distance(r["s1"], r["s2"]), abs=1e-9)
        assert r["ns"] == pytest.approx(
            mod.normalized_similarity(r["s1"], r["s2"]), abs=1e-9)


def test_ratio_udf_with_cutoff(spark, pairs_df):
    rows = (pairs_df
            .withColumn("r", scorer_column("ratio", "s1", "s2",
                                           "normalized_similarity",
                                           score_cutoff=0.9))
            .collect())
    for r in rows:
        if r["s1"] is None or r["s2"] is None:
            assert r["r"] is None
            continue
        exact = ratio_raw(r["s1"], r["s2"])
        if exact >= 0.9:
            assert r["r"] == pytest.approx(exact, abs=1e-9)
        else:
            assert r["r"] is None


def test_length_prefilter_never_prunes_a_passing_pair(spark, pairs_df):
    """prefilter is an upper bound: anything it prunes scores < cutoff."""
    cutoff = 0.8
    for scorer in ["ratio", "levenshtein", "jaro", "jaro_winkler"]:
        kept = (pairs_df.where(F.col("s1").isNotNull() & F.col("s2").isNotNull())
                .withColumn("keep", length_prefilter(
                    F.length("s1"), F.length("s2"), scorer, cutoff))
                .withColumn("ns", scorer_column(scorer, "s1", "s2",
                                                "normalized_similarity"))
                .collect())
        for r in kept:
            if not r["keep"]:
                assert r["ns"] < cutoff, (scorer, r)


def test_weighted_lev_udf(spark, pairs_df):
    mod = ALL_METRICS["levenshtein"]
    rows = (pairs_df
            .withColumn("d", scorer_column("levenshtein", "s1", "s2",
                                           "distance", weights=(1, 1, 2)))
            .collect())
    for r in rows:
        if r["s1"] is None or r["s2"] is None:
            continue
        assert r["d"] == mod.distance(r["s1"], r["s2"], weights=(1, 1, 2))


def test_hamming_udf_null_on_unequal_without_pad(spark):
    df = spark.createDataFrame([("ham", "hamming"), ("abc", "abd")],
                               "s1: string, s2: string")
    rows = (df.withColumn("d", scorer_column("hamming", "s1", "s2", "distance",
                                             pad=False))
            .withColumn("dp", scorer_column("hamming", "s1", "s2", "distance",
                                            pad=True))
            .collect())
    assert rows[0]["d"] is None          # reference Err -> NULL
    assert rows[0]["dp"] == 4.0
    assert rows[1]["d"] == 1.0
