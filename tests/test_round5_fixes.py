"""Round-5 fixes, pinned.

1. CC pre-contraction: partition-local union-find before the first
   distributed star round (VERDICT r4 item 1).
2. Vectorized hamming + token_set scorer paths (item 2).
3. Bounded _pad_codes memory on the no-compiler fallback (item 3).
4. sha256 integrity riding the 01_files write job (item 4) + drift
   detection against a source-provided hash.
5. NULL exact_equal pairs take the scorer path (ADVICE r4).
6. candidate_pairs broadcast_threshold is functional (item 7).
"""

from __future__ import annotations

import numpy as np
import pytest

# ---------------------------------------------------------------- CC


def _labels(df):
    return sorted((r["id"], r["cluster_id"]) for r in df.collect())


def test_union_find_roots_matches_bfs():
    from fuzzspark.kernels._native import union_find_roots

    rng = np.random.default_rng(11)
    n = 500
    du = rng.integers(0, n, 800)
    dv = rng.integers(0, n, 800)
    roots = union_find_roots(du, dv, n)
    # brute-force components
    import collections
    adj = collections.defaultdict(set)
    for a, b in zip(du.tolist(), dv.tolist()):
        adj[a].add(b)
        adj[b].add(a)
    seen = set()
    for s in range(n):
        if s in seen:
            continue
        comp, q = [s], [s]
        seen.add(s)
        while q:
            x = q.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    comp.append(y)
                    q.append(y)
        mn = min(comp)
        for x in comp:
            assert roots[x] == mn


def test_pre_contract_preserves_components(spark):
    from fuzzspark.pipeline.cluster import _pre_contract, connected_components

    rng = np.random.default_rng(23)
    edges = [(int(a), int(b))
             for a, b in zip(rng.integers(0, 400, 900),
                             rng.integers(0, 400, 900)) if a != b]
    df = spark.createDataFrame(edges, "left_id: long, right_id: long") \
              .repartition(6)
    contracted = _pre_contract(df)
    # sparsification: never more output edges than input, same components
    assert contracted.count() <= df.count()
    base = connected_components(df, pre_contract=False)
    via = connected_components(
        contracted.withColumnRenamed("u", "left_id")
                  .withColumnRenamed("v", "right_id"),
        pre_contract=False)
    assert _labels(base) == _labels(via)


@pytest.mark.parametrize("driver_finish", [0, 1_000_000])
def test_cc_pre_contract_identical_labels(spark, driver_finish):
    from fuzzspark.pipeline.cluster import connected_components

    rng = np.random.default_rng(5)
    edges = [(int(a), int(b))
             for a, b in zip(rng.integers(0, 1500, 2500),
                             rng.integers(0, 1500, 2500)) if a != b]
    df = spark.createDataFrame(edges, "left_id: long, right_id: long") \
              .repartition(8)
    s_on, s_off = {}, {}
    on = connected_components(df, driver_finish_edges=driver_finish,
                              stats=s_on, pre_contract=True)
    off = connected_components(df, driver_finish_edges=driver_finish,
                               stats=s_off, pre_contract=False)
    assert _labels(on) == _labels(off)
    assert s_on["pre_contract"] and not s_off["pre_contract"]
    # contraction never inflates the first-shuffle edge count
    assert s_on["round_edges"][0] <= s_off["round_edges"][0]
