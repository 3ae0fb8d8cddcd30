"""Round-6 fixes, pinned.

1. length_prefilter has NO valid bound for the composite scorers
   (ADVICE r5 high): partial_ratio / token_set_ratio / token_sort_ratio
   emit lit(True) — score_pairs must not drop perfect matches.
2. score_pairs splits exact-duplicate rows off BEFORE the scorer UDF
   (plan-level union, not a when() over the UDF column) (ADVICE r5).
3. connected_components drops self-loops consistently in both the
   pre-contracted and plain paths (ADVICE r5).
4. run_pipeline leaves the CC checkpoint dir in place when the caller
   had no checkpoint dir configured (ADVICE r5).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------- length_prefilter


@pytest.mark.parametrize("scorer,a,b", [
    # a short string contained in a long one scores 1.0 under
    # partial_ratio while 2*min/(l1+l2) = 0.25
    ("partial_ratio", "alpha", "zz alpha zz plus padding"),
    # token subset: token_set_ratio == 1.0, bound would be ~0.27
    ("token_set_ratio", "alpha", "alpha beta gamma delta epsilon zeta"),
    # whitespace collapse: token_sort_ratio == 1.0, raw-length bound < 1
    ("token_sort_ratio", "b     a", "a b"),
])
def test_score_pairs_no_length_prune_for_composites(spark, scorer, a, b):
    from fuzzspark.functions import length_prefilter, score_pairs
    from fuzzspark.kernels.batch import batch_scores

    # the kernel really does score these pairs at 1.0
    assert batch_scores(scorer, "normalized_similarity", [a], [b])[0] \
        == pytest.approx(1.0)
    df = spark.createDataFrame([(a, b)], "s1: string, s2: string")
    out = score_pairs(df, "s1", "s2", scorer=scorer, score_cutoff=0.9)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["score"] == pytest.approx(1.0)
    # and the predicate itself is a plain TRUE for these scorers
    kept = df.where(length_prefilter(F.length("s1"), F.length("s2"),
                                     scorer, 0.99)).count()
    assert kept == 1


def test_length_prefilter_still_prunes_ratio(spark):
    from fuzzspark.functions import length_prefilter

    df = spark.createDataFrame([("ab", "abcdefghij")], "s1: string, s2: string")
    assert df.where(length_prefilter(F.length("s1"), F.length("s2"),
                                     "ratio", 0.9)).count() == 0


# ------------------------------------------- score_pairs exact split


def test_score_pairs_exact_rows_bypass_udf_in_plan(spark):
    from fuzzspark.functions import score_pairs

    df = spark.createDataFrame(
        [("same", "same"), ("kitten", "sitting"), (None, "x")],
        "s1: string, s2: string")
    out = score_pairs(df, "s1", "s2", scorer="ratio", keep_suppressed=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # plan-level split: ONE ArrowEvalPython branch under a Union — the
    # exact side never reaches the python worker
    assert plan.count("ArrowEvalPython") == 1
    assert "Union" in plan
    got = {(r["s1"], r["s2"]): r["score"] for r in out.collect()}
    assert got[("same", "same")] == pytest.approx(1.0)
    assert 0.0 < got[("kitten", "sitting")] < 1.0
    assert got[(None, "x")] is None


# -------------------------------------------------- CC self-loops


def _labels(df):
    return sorted((r["id"], r["cluster_id"]) for r in df.collect())


@pytest.mark.parametrize("pre", [True, False])
def test_cc_self_loop_only_node_consistent(spark, pre):
    from fuzzspark.pipeline.cluster import connected_components

    edges = spark.createDataFrame([(1, 1), (2, 3), (9, 9)],
                                  "left_id: long, right_id: long")
    out = connected_components(edges, pre_contract=pre)
    # self-loop-only nodes (1, 9) count as isolated in BOTH paths
    assert _labels(out) == [(2, 2), (3, 2)]


@pytest.mark.parametrize("pre", [True, False])
def test_cc_all_self_loops_empty(spark, pre):
    from fuzzspark.pipeline.cluster import connected_components

    edges = spark.createDataFrame([(4, 4)], "left_id: long, right_id: long")
    assert connected_components(edges, pre_contract=pre).count() == 0


# ------------------------------------- CC checkpoint dir, no prev


def test_cc_checkpoint_dir_kept_when_no_prev(spark, tmp_path):
    """With no caller-configured checkpoint dir, run_pipeline must NOT
    delete the _cc_checkpoint dir the context still points at (a later
    df.checkpoint() would write into a vanished directory)."""
    import os

    from fuzzspark.pipeline import (LinkageConfig, corpus_to_spark,
                                    generate_corpus, run_pipeline)

    jsc = spark.sparkContext._jsc.sc()
    prev_opt = jsc.getCheckpointDir()
    prev = prev_opt.get() if prev_opt.isDefined() else None
    try:
        # clear: SparkContext.setCheckpointDir(null) -> Option(null) = None
        jsc.setCheckpointDir(None)
        assert not jsc.getCheckpointDir().isDefined()
        files, _p, _t = corpus_to_spark(
            spark, generate_corpus(n_clusters=10, seed=3, threshold=0.9))
        wd = str(tmp_path / "wd")
        run_pipeline(spark, files, wd, LinkageConfig(threshold=0.9))
        cc_dir = os.path.join(wd, "_cc_checkpoint")
        cur = jsc.getCheckpointDir()
        assert cur.isDefined() and cc_dir in cur.get()
        # the dir the context points at still exists
        assert os.path.isdir(cc_dir)
    finally:
        if prev is not None:
            spark.sparkContext.setCheckpointDir(prev)
