"""The flagship linkage_clusters DuckDB oracle (round-3 VERDICT item #1).

Three layers:

1. the blocked multi-word bit-parallel LCS (the oracle's exact scorer
   for pairs the levenshtein bounds can't decide) matches the python
   kernel on arbitrary-length strings, including word boundaries;
2. the FULL oracle equals the Spark pipeline on a crafted corpus whose
   edge decisions land in the undecided band (so the exact-LCS branch
   is exercised in both the accept and reject directions), plus exact
   duplicates and singletons;
3. the full oracle equals the Spark pipeline on the driver smoke data.
"""

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from fuzzspark.kernels.metrics import lcs_similarity_raw


def _lcs_sql_eval(pairs):
    """Evaluate the blocked-LCS SQL on (s1, s2) pairs, shorter as pattern."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s1 VARCHAR, s2 VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    nb_e, pm_e = entrymod._sql_lcs_prep("pat")
    q = (f"SELECT {entrymod._sql_lcs_blocked('pat', 'txt')} FROM ("
         f"SELECT pat, txt, {nb_e} AS nb, {pm_e} AS pmt FROM ("
         f"SELECT CASE WHEN length(s1) <= length(s2) THEN s1 ELSE s2 END AS pat, "
         f"CASE WHEN length(s1) <= length(s2) THEN s2 ELSE s1 END AS txt "
         f"FROM t))")
    return [r[0] for r in con.execute(q).fetchall()]


def test_sql_lcs_blocked_matches_kernel():
    rng = np.random.default_rng(17)

    def rand_s(n, alpha=8):
        return "".join(chr(97 + int(c)) for c in rng.integers(0, alpha, n))

    def mutate(s, k):
        ch = list(s)
        for _ in range(k):
            op = int(rng.integers(0, 3))
            pos = int(rng.integers(0, max(1, len(ch))))
            c = chr(97 + int(rng.integers(0, 26)))
            if op == 0:
                ch.insert(pos, c)
            elif op == 1 and ch:
                del ch[pos]
            elif ch:
                ch[pos] = c
        return "".join(ch)

    pairs = [("", ""), ("", "abc"), ("abc", ""), ("a", "a"), ("a", "b")]
    # word-boundary lengths: 61/62/63 (1->2 words), 124/125 (2->3), long
    for n in (5, 30, 61, 62, 63, 124, 125, 200, 300, 558):
        s1 = rand_s(n)
        pairs.append((s1, mutate(s1, max(1, n // 10))))
        pairs.append((s1, rand_s(max(0, n - 7))))
        pairs.append((s1, s1))
    got = _lcs_sql_eval(pairs)
    want = [lcs_similarity_raw(a, b) for a, b in pairs]
    assert got == want


def test_sql_lcs_blocked_printable_ascii_sweep():
    """The blocked-LCS SQL equals the kernel across the full printable
    ASCII range (the oracle's documented domain), independent lengths
    per side including cross-word-boundary mixes."""
    rng = np.random.default_rng(23)
    pairs = []
    for _ in range(80):
        la, lb = int(rng.integers(0, 160)), int(rng.integers(0, 160))
        a = "".join(chr(32 + int(c)) for c in rng.integers(0, 95, la))
        b = "".join(chr(32 + int(c)) for c in rng.integers(0, 95, lb))
        pairs.append((a, b))
    got = _lcs_sql_eval(pairs)
    want = [lcs_similarity_raw(a, b) for a, b in pairs]
    assert got == want


def _crafted_docs():
    """documents-shaped corpus whose ratio decisions at t=0.85 straddle
    the levenshtein accept/reject bounds (lev <= indel <= 2*lev):

    * und-accept: 70-char base vs 10 deletions -> indel == lev == 10,
      L = 130: 1 - 2*10/130 = 0.846 < 0.85 <= 1 - 10/130 = 0.923
      (bounds undecided), true ratio = 1 - 10/130 = 0.923 -> edge;
    * und-reject: 40-char base vs 7 substitutions -> indel = 14,
      lev = 7, L = 80: bounds undecided (0.825 < 0.85 <= 0.9125),
      true ratio = 1 - 14/80 = 0.825 -> no edge;
    * exact duplicates (score 1.0 short-circuit, x: block family);
    * bound-accepted near-dups (2 edits on 70 chars);
    * unrelated singletons.
    """
    rng = np.random.default_rng(1234)

    def rand_s(n):
        return "".join(chr(97 + int(c)) for c in rng.integers(0, 8, n))

    docs = []

    def add(text, lang="en"):
        docs.append(dict(doc_id=len(docs), text=text, lang=lang,
                         source="crafted", n_chars=len(text)))

    base_a = rand_s(70)
    drop = sorted(rng.choice(70, size=10, replace=False).tolist(), reverse=True)
    var_a = list(base_a)
    for p in drop:
        del var_a[p]
    add(base_a)
    add("".join(var_a))                     # und-accept pair with doc 0

    base_b = rand_s(40)
    var_b = list(base_b)
    for k, p in enumerate(range(1, 40, 5)):  # 7 spaced substitutions
        var_b[p] = chr(97 + (ord(base_b[p]) - 97 + 9 + k) % 26)
    add(base_b)
    add("".join(var_b))                     # und-reject pair with doc 2

    dup = rand_s(55)
    add(dup)
    add(dup)                                # exact duplicates

    base_c = rand_s(70)
    nd = list(base_c)
    nd[3] = "z"
    del nd[40]
    add(base_c)
    add("".join(nd))                        # bound-accepted near-dup

    for _ in range(12):                     # singles (mixed langs)
        add(rand_s(int(rng.integers(30, 90))),
            lang=["en", "de", "es"][int(rng.integers(0, 3))])
    add("abc")                              # short-string fnv shingle path
    return pd.DataFrame(docs)


def test_linkage_oracle_undecided_band(spark, tmp_path):
    docs = _crafted_docs()
    sf_dir = str(tmp_path / "crafted")
    os.makedirs(sf_dir)
    docs.to_parquet(os.path.join(sf_dir, "documents.parquet"), index=False)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")

    # prove (kernel-side) the undecided band is non-empty BOTH ways, so
    # the oracle's exact-LCS branch decides at least one edge and at
    # least one non-edge below
    t = 0.85
    from fuzzspark.kernels.fuzz import ratio_raw
    from fuzzspark.kernels.metrics import levenshtein_distance_raw
    txt = docs.set_index("doc_id")["text"]
    n_acc = n_rej = 0
    for i in range(len(txt)):
        for j in range(i + 1, len(txt)):
            a, b = txt[i], txt[j]
            L = len(a) + len(b)
            if a == b or L == 0:
                continue
            lev = levenshtein_distance_raw(a, b)
            if 1.0 - lev / L >= t and 1.0 - (2 * lev) / L < t:
                if ratio_raw(a, b) >= t:
                    n_acc += 1
                else:
                    n_rej += 1
    assert n_acc >= 1 and n_rej >= 1, (n_acc, n_rej)

    sdf = entrymod.q_linkage_clusters(spark, sf_dir).toPandas()
    odf = con.execute(entrymod._linkage_oracle_sql()).fetchdf()
    s = sdf.sort_values(["id"]).reset_index(drop=True)
    o = odf.sort_values(["id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        s.astype("int64"), o[["id", "cluster_id"]].astype("int64"))
    # exact dup pair clustered, und-accept clustered, und-reject split
    lab = dict(zip(s["id"], s["cluster_id"]))
    assert lab[0] == lab[1], "und-accept pair must cluster"
    assert lab[2] != lab[3], "und-reject pair must stay apart"
    assert lab[4] == lab[5], "exact duplicates must cluster"
    assert lab[6] == lab[7], "bound-accepted near-dup must cluster"


def test_linkage_oracle_driver_smoke(spark, sf_dir):
    sdf = entrymod.q_linkage_clusters(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    odf = con.execute(entrymod._linkage_oracle_sql()).fetchdf()
    s = sdf.sort_values(["id"]).reset_index(drop=True)
    o = odf.sort_values(["id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        s.astype("int64"), o[["id", "cluster_id"]].astype("int64"))
