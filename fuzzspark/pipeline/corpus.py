"""Deterministic synthetic source-code corpus with planted duplicates.

Produces the exact input shape mandated by BASELINE.json:input_hint:
``(repo:string, path:string, commit:string, lang:string, content:string)``
plus ground-truth sidecars for F1 evaluation:

* ``pairs_labeled(left_id, right_id, is_match)`` — every intra-cluster
  pair, labeled by the *reference-parity scalar scorer* at the pipeline
  threshold (our kernels are pinned to the reference by the golden
  tests, so these labels are reference labels);
* ``clusters_truth(id, cluster_id)`` — transitive ground truth.

Seeded ``numpy.random.Generator`` end to end — same seed, same corpus.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from fuzzspark.kernels.fuzz import ratio_raw

LANGS = ["python", "rust", "java", "go", "c"]

_TOKENS = (
    "def fn let mut pub static void int float return if else for while match "
    "class struct impl import from package use include namespace template "
    "self this result value index count buffer stream parse load dump read "
    "write open close init update delete insert query filter map reduce fold "
    "async await lock mutex thread spawn join channel send recv error panic "
    "assert test bench config option vector string bytes slice array tuple"
).split()

_STEMS = ["parse", "util", "core", "main", "model", "index", "server",
          "client", "codec", "cache", "sched", "proto", "metrics", "auth"]
_DIRS = ["src", "lib", "internal", "pkg", "core", "util", "io", "net"]
_EXT = {"python": "py", "rust": "rs", "java": "java", "go": "go", "c": "c"}


def _hexhash(*parts) -> str:
    h = hashlib.sha1("|".join(str(p) for p in parts).encode()).hexdigest()
    return h


def _make_content(rng: np.random.Generator, n_tokens: int) -> str:
    idx = rng.integers(0, len(_TOKENS), size=n_tokens)
    words = [_TOKENS[i] for i in idx]
    # line structure every ~8 tokens
    out = []
    for k, w in enumerate(words):
        out.append(w)
        out.append("\n" if (k + 1) % 8 == 0 else " ")
    return "".join(out)


def _mutate(rng: np.random.Generator, s: str, n_edits: int) -> str:
    """n seeded char-level edits (ins/del/sub/adjacent transpose)."""
    chars = list(s)
    for _ in range(n_edits):
        if not chars:
            chars.append(chr(97 + int(rng.integers(0, 26))))
            continue
        op = int(rng.integers(0, 4))
        pos = int(rng.integers(0, len(chars)))
        c = chr(97 + int(rng.integers(0, 26)))
        if op == 0:
            chars.insert(pos, c)
        elif op == 1:
            del chars[pos]
        elif op == 2:
            chars[pos] = c
        elif pos + 1 < len(chars):
            chars[pos], chars[pos + 1] = chars[pos + 1], chars[pos]
    return "".join(chars)


@dataclass
class SyntheticCorpus:
    rows: list          # dicts with repo/path/commit/lang/content + id/cluster
    pairs_labeled: list  # (left_id, right_id, is_match)
    clusters_truth: list  # (id, cluster_id)
    threshold: float

    @property
    def n_rows(self):
        return len(self.rows)


def generate_corpus(n_clusters: int = 300, seed: int = 42,
                    threshold: float = 0.9,
                    mean_cluster: float = 1.6,
                    n_tokens_range=(40, 160)) -> SyntheticCorpus:
    rng = np.random.default_rng(seed)
    rows, truth, pairs = [], [], []
    rid = 0
    for c in range(n_clusters):
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        stem = _STEMS[int(rng.integers(0, len(_STEMS)))]
        d = _DIRS[int(rng.integers(0, len(_DIRS)))]
        base = _make_content(rng, int(rng.integers(*n_tokens_range)))
        size = 1 + int(rng.poisson(mean_cluster - 1.0))
        member_ids, contents = [], []
        for k in range(size):
            if k == 0:
                content = base
            else:
                # few edits -> near-dup; occasionally many -> hard negative
                hard = rng.random() < 0.25
                max_edits = max(2, len(base) // 6) if hard else max(1, len(base) // 40)
                content = _mutate(rng, base, 1 + int(rng.integers(0, max_edits)))
            repo = f"repo_{int(rng.integers(0, max(2, n_clusters // 10))):04d}"
            path = f"{d}/{stem}_{c}.{_EXT[lang]}" if k == 0 else \
                f"{d}/{stem}_{c}_v{k}.{_EXT[lang]}"
            commit = _hexhash("commit", c, k, seed)[:12]
            rows.append(dict(id=rid, repo=repo, path=path, commit=commit,
                             lang=lang, content=content))
            member_ids.append(rid)
            contents.append(content)
            rid += 1
        for a in range(len(member_ids)):
            for b in range(a + 1, len(member_ids)):
                is_match = ratio_raw(contents[a], contents[b]) >= threshold
                pairs.append((member_ids[a], member_ids[b], is_match))
        for m in member_ids:
            truth.append((m, member_ids[0]))
    return SyntheticCorpus(rows, pairs, truth, threshold)


def corpus_to_spark(spark, corpus: SyntheticCorpus):
    """(files_df, pairs_df, truth_df) as DataFrames."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType, BooleanType)
    files_schema = StructType([
        StructField("id", LongType()), StructField("repo", StringType()),
        StructField("path", StringType()), StructField("commit", StringType()),
        StructField("lang", StringType()), StructField("content", StringType()),
    ])
    files = spark.createDataFrame(
        [(r["id"], r["repo"], r["path"], r["commit"], r["lang"], r["content"])
         for r in corpus.rows], schema=files_schema)
    pairs = spark.createDataFrame(
        corpus.pairs_labeled,
        StructType([StructField("left_id", LongType()),
                    StructField("right_id", LongType()),
                    StructField("is_match", BooleanType())]))
    truth = spark.createDataFrame(
        corpus.clusters_truth,
        StructType([StructField("id", LongType()),
                    StructField("cluster_id", LongType())]))
    return files, pairs, truth


def corpus_from_documents(docs_df):
    """Map the driver-provided ``documents`` table onto the corpus shape
    (repo, path, commit, lang, content) so the flagship pipeline runs on
    driver test data."""
    from pyspark.sql import functions as F
    return docs_df.select(
        F.col("doc_id").alias("id"),
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/"), F.col("doc_id").cast("string"),
                 F.lit(".txt")).alias("path"),
        F.sha2(F.col("text").cast("binary"), 256).substr(1, 12).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
