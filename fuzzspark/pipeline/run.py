"""End-to-end record-linkage pipeline (BASELINE.json:north_rule).

stages: 01_files (+sha256 integrity) → 02_blocks → 03_pairs →
04_scores → 05_clusters.  Every stage checkpoints via StageRunner and
resumes mid-pipeline after a kill.  All heavy compute is vectorized
(scorer pandas UDF over Arrow batches; everything else Catalyst-native).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from fuzzspark.functions import scorer_column, sha256_column
from fuzzspark.pipeline.blocking import block_keys, defuse_skew
from fuzzspark.pipeline.checkpoint import StageRunner
from fuzzspark.pipeline.cluster import connected_components
from fuzzspark.pipeline.pairs import candidate_pairs

__all__ = ["LinkageConfig", "run_pipeline"]


from fuzzspark.pipeline.util import parse_bytes as _parse_bytes


def _dir_bytes(path: str) -> int | None:
    """Total data-file bytes of a persisted stage dir (driver-side
    listing; the same listing any scan planning pays)."""
    try:
        total = 0
        for f in os.listdir(path):
            if f.startswith(("_", ".")):
                continue
            total += os.path.getsize(os.path.join(path, f))
        return total
    except OSError:
        return None


@dataclass
class LinkageConfig:
    scorer: str = "ratio"
    threshold: float = 0.9
    n_bands: int = 8
    rows_per_band: int = 4
    shingle: int = 5
    max_chars: int = 2000
    max_block: int = 200
    window: int = 20
    use_exact: bool = True
    use_path: bool = True
    use_minhash: bool = True
    cc_max_iter: int = 20
    # finish CC driver-side once the contracted edge set is this small
    # (0 = fully-distributed fixpoint; None = auto-size from
    # spark.driver.memory — 1/16 of the heap as raw 16 B edges with a
    # 4M floor, see cluster._auto_driver_finish.  Round 6: the manifest
    # round_edges series showed a fixed default re-tuned at every scale
    # tier, so the default now derives from the resource that actually
    # bounds it)
    cc_driver_finish: int | None = None
    # stage-storage DataSource format (parquet/orc/...; "iceberg" with
    # the runtime jar + catalog configured)
    table_format: str = "parquet"

    def as_dict(self):
        return dict(self.__dict__)


def run_pipeline(spark: SparkSession, files: DataFrame, workdir: str,
                 config: LinkageConfig | None = None) -> dict:
    """Returns dict of stage DataFrames: files, blocks, pairs, scores,
    clusters — plus the StageRunner (for resume introspection).

    ``files`` must have columns (id, repo, path, commit, lang, content).
    """
    cfg = config or LinkageConfig()
    runner = StageRunner(spark, workdir, params=cfg.as_dict(),
                         table_format=cfg.table_format)

    def widen(df: DataFrame, input_bytes: int | None = None) -> DataFrame:
        """Guarantee a UDF-heavy stage gets enough tasks even when its
        input is a small persisted stage (single parquet split).  Width
        is tunable via spark conf ``fuzzspark.python.parallelism``
        (single-box local mode saturates memory bandwidth well below
        the vCPU count — see BENCH_SCALING.md).

        Round 5: when the caller knows the on-disk input size and the
        scan ALONE already yields >= target splits
        (bytes / maxPartitionBytes), the repartition is skipped — at
        100 TB the unconditional widen re-shuffles the entire corpus
        just to guarantee task parallelism the file splits deliver for
        free.  (df.rdd.getNumPartitions() would answer the same
        question but forces an RDD conversion of the analyzed plan.)"""
        default = spark.sparkContext.defaultParallelism
        target = int(spark.conf.get("fuzzspark.python.parallelism",
                                    str(default)))
        if input_bytes is not None:
            mpb = _parse_bytes(spark.conf.get(
                "spark.sql.files.maxPartitionBytes", "134217728"))
            if mpb > 0 and input_bytes // mpb >= target:
                return df
        return df.repartition(target)

    integrity_obs: list = []

    def _files():
        # a source-provided content_sha256 column is KEPT as the
        # source-table assertion (BASELINE: per-row sha256 equality vs
        # the source); otherwise the hash is computed here and the
        # check degenerates to in-flight self-consistency
        df = files
        if "content_sha256" not in files.columns:
            df = df.withColumn("content_sha256", sha256_column("content"))
        df = df.withColumn("content_len", F.length("content"))
        # round 5: the per-row integrity check RIDES THE WRITE JOB (an
        # Observation counting recomputed-sha mismatches) instead of
        # paying a second full corpus scan per run — at 100 TB the old
        # re-scan was the same size as the write itself
        try:
            from pyspark.sql import Observation
            obs = Observation("integrity_01_files")
            df = df.observe(obs, F.sum(
                (sha256_column("content") != F.col("content_sha256"))
                .cast("long")).alias("sha_mismatch"))
            integrity_obs.append(obs)
        except ImportError:  # pragma: no cover — very old pyspark
            pass
        return df

    files_ck = runner.run("01_files", _files)

    if integrity_obs and "01_files" in runner.stages_run:
        n_drift = int(integrity_obs[0].get["sha_mismatch"] or 0)
    else:
        # resumed (stage skipped — no write job to ride): verify the
        # PERSISTED stage instead, i.e. the storage roundtrip
        n_drift = (files_ck
                   .withColumn("_recheck", sha256_column("content"))
                   .where(F.col("_recheck") != F.col("content_sha256"))
                   .limit(1).count())
    if n_drift:
        raise RuntimeError("content sha256 integrity violation in 01_files")

    def _blocks():
        # widen BEFORE the minhash UDF: the persisted 01_files stage is
        # tiny on disk and would otherwise reach the python workers as a
        # single input split.  Round 7: defuse_skew is a single subtree
        # now (one census exchange, no union), so the block-key rows
        # have exactly one consumer and the old bk.persist() would only
        # pay cache materialization for nothing.
        bk = block_keys(widen(files_ck,
                              input_bytes=_dir_bytes(runner._dir("01_files"))),
                        use_exact=cfg.use_exact,
                        use_path=cfg.use_path, use_minhash=cfg.use_minhash,
                        n_bands=cfg.n_bands, rows_per_band=cfg.rows_per_band,
                        shingle=cfg.shingle, max_chars=cfg.max_chars)
        return defuse_skew(bk, files_ck.select("id", "content_len"),
                           max_block=cfg.max_block, window=cfg.window)

    blocks = runner.run("02_blocks", _blocks)

    # round 7: the block rows carry content_len, so candidate_pairs
    # reads both pair lengths off the join sides and decides exact_equal
    # from the x: key family — the two side-attach joins (two full
    # shuffles of the amplified pair set, the 3200x-tier scratch-ceiling
    # driver) are gone and the dedup exchange runs on the length-pruned
    # set.  Falls back to the attach path if the blocks stage predates
    # the len-carrying schema (resume from an old workdir).
    pairs = runner.run(
        "03_pairs",
        lambda: candidate_pairs(
            files_ck, blocks, scorer=cfg.scorer, cutoff=cfg.threshold,
            attach_sides="content_len" not in blocks.columns))

    def _score():
        # 03_pairs is id-only (text never rides the pair checkpoint —
        # see candidate_pairs); join content back by id here.  Exact
        # duplicates skip the join and the scorer entirely (score 1.0
        # from the sha equality decided at pair time).  Cutoff is
        # pushed into the kernel: sub-threshold scores come back NULL
        # (identical to the post-hoc WHERE, per reference cutoff
        # semantics src/common.rs:73-86)
        out_cols = ["left_id", "right_id", "len1", "len2",
                    "exact_equal", "score"]
        # NULL-safe split (ADVICE r4): under three-valued logic a bare
        # predicate AND its negation both drop NULL rows — coalesce so
        # a NULL exact_equal (NULL content/sha) takes the scorer path
        # and surfaces as a NULL score, as the old when/otherwise did
        exact_flag = F.coalesce(F.col("exact_equal"), F.lit(False))
        # round 7: the skinny pair checkpoint carries no lengths (they
        # would have doubled the pair dedup shuffle) — re-derive them
        # here: the scorer branch gets them free off the content it
        # attaches anyway; the exact branch (len1 == len2 by
        # definition) attaches ONE side's stored content_len
        skinny = "len1" not in pairs.columns
        exact = pairs.where(exact_flag)
        content = files_ck.select("id", "content")
        todo_ids = pairs.where(~exact_flag)
        # round 7: when the persisted corpus stage is small enough to
        # broadcast (on-disk bytes from the driver listing — free), the
        # content attach becomes two BroadcastHashJoins and the id-only
        # pair set never shuffles; the widen happens BEFORE the joins on
        # slim id rows so the scorer UDF still gets its task width
        # (guide §3.1).  Above the threshold (conf
        # ``fuzzspark.broadcast.content.max_bytes``, default 64m) the
        # shuffle joins distribute the output across
        # spark.sql.shuffle.partitions as before — a post-join widen()
        # would re-shuffle every text-attached row a second time; at
        # the 200x tier that extra shuffle alone is ~100 GB
        files_bytes = _dir_bytes(runner._dir("01_files"))
        bc_max = _parse_bytes(spark.conf.get(
            "fuzzspark.broadcast.content.max_bytes", "64m"))
        if files_bytes is not None and files_bytes <= bc_max:
            # Round 7 (second pass, guide §8): within the broadcast
            # gate, resolve content IN the python worker instead of
            # attaching it row-wise in the JVM.  The corpus (id,
            # content) ships ONCE per executor as a broadcast variable
            # (bounded by the same conf that bounded the old
            # F.broadcast), only the ~17 B id pairs cross the Arrow
            # boundary, and no per-pair string is materialized JVM-side
            # — the old ArrowEvalPython path allocated a fresh python
            # string per pair SIDE (~2 × pairs × doc_len bytes).  The
            # exact branch folds into the same mapper (score 1.0, no
            # kernel), so the split/union and its extra scan of the
            # pair checkpoint disappear.  Above the gate the shuffle
            # joins below distribute exactly as before.
            import numpy as np
            rows = content.collect()  # ≤ bc_max on-disk by the gate
            b_ids = np.array([r[0] for r in rows], dtype=np.int64)
            b_txt = np.array([r[1] for r in rows], dtype=object)
            order = np.argsort(b_ids)
            bcv = spark.sparkContext.broadcast(
                (b_ids[order], b_txt[order]))
            scorer_name, thr = cfg.scorer, cfg.threshold

            def score_map(batches):
                import pyarrow as pa
                from fuzzspark.kernels.batch import batch_scores
                ids, texts = bcv.value
                for batch in batches:
                    li = batch.column("left_id").to_numpy()
                    ri = batch.column("right_id").to_numpy()
                    ex_raw = batch.column("exact_equal")
                    n = len(li)
                    ex = np.asarray(
                        ex_raw.fill_null(False)
                        .to_numpy(zero_copy_only=False), dtype=bool)
                    i1 = np.searchsorted(ids, li)
                    i2 = np.searchsorted(ids, ri)
                    if n and (len(ids) == 0
                              or (ids[np.clip(i1, 0, len(ids) - 1)]
                                  != li).any()
                              or (ids[np.clip(i2, 0, len(ids) - 1)]
                                  != ri).any()):
                        raise RuntimeError(
                            "04_scores: pair id missing from the corpus "
                            "broadcast (pairs must derive from 01_files)")
                    s1 = texts[i1] if n else texts[:0]
                    s2 = texts[i2] if n else texts[:0]
                    out = np.full(n, np.nan)
                    todo = ~ex
                    if todo.any():
                        out[todo] = batch_scores(
                            scorer_name, "normalized_similarity",
                            s1[todo], s2[todo], score_cutoff=thr)
                    out[ex] = 1.0
                    l1 = np.fromiter(
                        (len(s) if s is not None else 0 for s in s1),
                        np.int64, n).astype(np.int32)
                    l2 = np.fromiter(
                        (len(s) if s is not None else 0 for s in s2),
                        np.int64, n).astype(np.int32)
                    m1 = np.fromiter((s is None for s in s1), bool, n)
                    m2 = np.fromiter((s is None for s in s2), bool, n)
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(li), pa.array(ri),
                         pa.array(l1, mask=m1), pa.array(l2, mask=m2),
                         ex_raw, pa.array(out, mask=np.isnan(out))],
                        names=out_cols)

            # pass ONLY the columns the mapper reads (guide §4.1) —
            # the widen shuffle then moves 17 B rows
            return widen(pairs.select("left_id", "right_id",
                                      "exact_equal")).mapInArrow(
                score_map,
                "left_id long, right_id long, len1 int, len2 int, "
                "exact_equal boolean, score double")
        # above the broadcast gate: shuffle joins attach content to the
        # scorer side.  NOTE (measured): a shared-child alias form does
        # NOT get ReusedExchange here — the analyzer's attribute dedup
        # gives each branch fresh ids and neither the rule nor AQE
        # stage reuse matches them, so the exact branch must keep its
        # NARROW len-only attach (16 B rows); routing it through the
        # content projection "to share the exchange" actually added a
        # full content shuffle+sort at the 200x tier.
        c1, c2 = content.alias("c1"), content.alias("c2")
        todo = (todo_ids.alias("p")
                .join(c1, F.col("p.left_id") == F.col("c1.id"))
                .join(c2, F.col("p.right_id") == F.col("c2.id"))
                .select("p.*", F.col("c1.content").alias("s1"),
                        F.col("c2.content").alias("s2")))
        if skinny:
            todo = todo.withColumn("len1", F.length("s1")) \
                       .withColumn("len2", F.length("s2"))
            # exact rows: len1 == len2 by definition (content-equal);
            # the stored content_len attaches as a 16 B row
            exact = (exact.join(files_ck.select(
                F.col("id").alias("left_id"),
                F.col("content_len").alias("len1")), "left_id")
                .withColumn("len2", F.col("len1")))
        exact = exact.withColumn("score", F.lit(1.0)).select(*out_cols)
        scored = todo.withColumn(
            "score", scorer_column(cfg.scorer, "s1", "s2",
                                   "normalized_similarity",
                                   score_cutoff=cfg.threshold))
        return scored.select(*out_cols).unionByName(exact)

    scores = runner.run("04_scores", _score, score_col="score")

    cc_stats: dict = {}

    cc_dir = os.path.join(workdir, "_cc_checkpoint")

    def _cluster():
        # reliable per-round checkpoints for the CC fixpoint: a lost
        # localCheckpoint block is unrecoverable (truncated lineage);
        # checkpoint files under the workdir survive eviction/executor
        # loss and cost one small write per contracted round
        spark.sparkContext.setCheckpointDir(cc_dir)
        edges = scores.where(F.col("score") >= cfg.threshold) \
                      .select("left_id", "right_id")
        # round 7: the 04_scores manifest row count (free — already on
        # disk) upper-bounds the edge count; when it fits the driver-
        # finish threshold, CC skips its contraction passes, reliable
        # checkpoint and fingerprint jobs outright (identical labels)
        ub_edges = None
        try:
            import json as _json
            with open(runner.manifest_path("04_scores")) as f:
                m = _json.load(f)
            if m.get("complete"):
                ub_edges = int(m["row_count"])
        except Exception:
            ub_edges = None
        labels = connected_components(
            edges, max_iter=cfg.cc_max_iter,
            driver_finish_edges=cfg.cc_driver_finish, stats=cc_stats,
            upper_bound_edges=ub_edges)
        # isolated nodes -> singleton clusters
        return (files_ck.select("id").join(labels, "id", "left_outer")
                .select("id", F.coalesce("cluster_id", "id").alias("cluster_id")))

    # the stage's global session state is restored afterwards (ADVICE
    # r4): capture any pre-existing checkpoint dir before _cluster
    # overrides it
    try:
        prev_opt = spark.sparkContext._jsc.sc().getCheckpointDir()
        prev_ck = prev_opt.get() if prev_opt.isDefined() else None
    except Exception:  # pragma: no cover — py4j API drift
        prev_ck = None

    # cc_stats lands in the 05_clusters manifest: per-round contracted
    # edge counts size the cc_driver_finish knob at any scale
    clusters = runner.run("05_clusters", _cluster, extra_manifest=cc_stats)

    # 05_clusters is persisted, so the CC round checkpoints are dead
    # weight — delete them (they'd otherwise accumulate for the life of
    # the app, one dir per round) and put the session's checkpoint dir
    # back where the caller had it.  On a crash mid-CC the files simply
    # stay for the next attempt; CC recomputes from 04_scores anyway.
    # When the caller had NO checkpoint dir configured there is nothing
    # to restore — the context keeps pointing at cc_dir, so deleting it
    # would leave a later caller-side df.checkpoint() writing into a
    # directory that vanishes with the workdir (ADVICE r5): leave it in
    # place in that case.
    if prev_ck and prev_ck != cc_dir:
        shutil.rmtree(cc_dir, ignore_errors=True)
        spark.sparkContext.setCheckpointDir(prev_ck)

    return dict(files=files_ck, blocks=blocks, pairs=pairs, scores=scores,
                clusters=clusters, runner=runner)


def evaluate_f1(scores: DataFrame, labeled: DataFrame, threshold: float) -> dict:
    """Pairwise P/R/F1 of predicted matches vs labeled same-block pairs."""
    pred = (scores.where(F.col("score") >= threshold)
            .select("left_id", "right_id").withColumn("pred", F.lit(True)))
    j = labeled.join(pred, ["left_id", "right_id"], "left_outer")
    agg = j.agg(
        F.sum(F.when(F.col("is_match") & F.col("pred").isNotNull(), 1)
              .otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_match") & F.col("pred").isNotNull(), 1)
              .otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_match") & F.col("pred").isNull(), 1)
              .otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = agg["tp"] or 0, agg["fp"] or 0, agg["fn"] or 0
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return dict(tp=tp, fp=fp, fn=fn, precision=precision, recall=recall, f1=f1)
