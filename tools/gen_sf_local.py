"""Local sf-scale measurement data (round 7).

The driver's round-end bench may run at a driver-GENERATED scale factor
(BENCH_r06 recorded sf=1.0) that is not present under /root/testdata
after a sandbox reset.  This tool builds a structurally faithful local
stand-in by replicating /root/testdata/sf0.1 REPLICAS times with
deterministic key shifts + per-replica text/vector perturbation, so
optimization before/after numbers can be taken at the driver's scale:

* documents: doc_id += r * 1_000_000 (keeps every ``doc_id % m``
  sampling pattern), per-replica suffix keeps replicas near- (not
  exact-) duplicates; lang distribution preserved, so the blocked
  self-join pair count scales ~(REPLICAS)^2 like the driver's own
  generator (47.66M pairs at its sf1.0 vs 0.458M at sf0.1 = 104x).
* embeddings: vec_id += r * 1_000_000 (divisible by 50 -> the
  ``vec_id % 50`` query-set fraction is preserved), small deterministic
  per-replica rotation so replicas are not exact duplicates.
* events / part / customer / supplier / orders / lineitem: keys shifted
  by r * 10_000_000 so mod-based filters keep their hit rates.

This is MEASUREMENT tooling only: nothing in the engine or bench reads
these files unless $SPARK_GRAFT_SF_DIR points at them explicitly.

Usage: python tools/gen_sf_local.py [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1.0_local"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

ID_COLS = {
    "documents": ("doc_id", 1_000_000),
    "embeddings": ("vec_id", 1_000_000),
    "events": ("event_id", 10_000_000),
    "part": ("p_partkey", 10_000_000),
    "customer": ("c_custkey", 10_000_000),
    "supplier": ("s_suppkey", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "lineitem": ("l_orderkey", 10_000_000),
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name in ["region", "nation"]:  # tiny dims: copy verbatim
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t, f"{OUT}/{name}.parquet")
    for name, (idc, shift) in ID_COLS.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        reps = []
        for r in range(REPLICAS):
            cols = {}
            for field in t.schema.names:
                col = t.column(field)
                if field == idc:
                    col = pc.add(col, r * shift)
                elif name == "documents" and field == "text" and r > 0:
                    # near-dup (not exact-dup) replicas, like the
                    # pipeline smoke tools
                    col = pc.binary_join_element_wise(
                        col, pa.array([f" r{r}"] * len(t)), "")
                elif name == "documents" and field == "n_chars" and r > 0:
                    col = pc.add(col, len(f" r{r}"))
                elif name == "embeddings" and field == "embedding" and r > 0:
                    arr = np.array(col.to_pylist(), dtype=np.float32)
                    rng = np.random.default_rng(1000 + r)
                    arr = arr + rng.normal(0, 0.05, arr.shape).astype(
                        np.float32)
                    col = pa.array(list(arr), type=col.type)
                elif name == "orders" and field == "o_custkey":
                    col = pc.add(col, r * 10_000_000)
                elif name == "lineitem" and field in ("l_partkey",
                                                      "l_suppkey"):
                    col = pc.add(col, r * 10_000_000)
                elif name == "events" and field == "user_id":
                    col = pc.add(col, r * 10_000_000)
                cols[field] = col
            reps.append(pa.table(cols))
        big = pa.concat_tables(reps)
        pq.write_table(big, f"{OUT}/{name}.parquet")
        print(name, big.num_rows)
    open(f"{OUT}/_DONE", "w").close()


if __name__ == "__main__":
    main()
