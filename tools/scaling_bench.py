"""Scaling-efficiency evidence (BASELINE.json: efficiency >= 0.8 from
N to 4N executors; sandbox proxy per driver instructions: identical job
at two local parallelism levels).

Method: materialize the blocked candidate-pair table ONCE (untimed) to
parquet with a fixed partition count, then time the scorer stage (read
-> ratio pandas UDF -> threshold count) in SEPARATE JVMs at local[N]
and local[4N].  This isolates the embarrassingly-parallel stage that
dominates cost at 10^12 scale; the same-partitioning input makes the
two runs differ only in core count.
  eff = T_N / (4 * T_4N).

Round-3 protocol: the two legs of each sample run BACK-TO-BACK (paired)
with leg order alternating between samples, and the reported statistic
is the median of >= SCALING_PAIRS paired efficiencies — host-tenancy
noise on this VM drifts slowly, so adjacent legs see correlated
conditions and the ratio cancels it (single legs vary 1.6x; see the
no-Spark controls in BENCH_SCALING.md).  Appends all samples plus the
median to BENCH_SCALING.md; exit 0 iff median >= 0.8.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PAIR_MOD = int(os.environ.get("SCALING_PAIR_MOD", "1"))
N_PARTS = int(os.environ.get("SCALING_PARTS", "128"))

PREP = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from fuzzspark.session import get_spark
spark = get_spark("scaling-prep", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
d = spark.read.parquet(%(sf)r + "/documents.parquet")
a, b = d.alias("a"), d.alias("b")
pairs = (a.join(b, (F.col("a.lang") == F.col("b.lang"))
                 & (F.col("a.doc_id") < F.col("b.doc_id")))
          .where((F.col("a.doc_id") + F.col("b.doc_id")) %% %(mod)d == 0)
          .select(F.col("a.text").alias("s1"), F.col("b.text").alias("s2")))
pairs.repartition(%(parts)d).write.mode("overwrite").parquet(%(out)r)
print("PAIRS", spark.read.parquet(%(out)r).count())
spark.stop()
"""

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from fuzzspark.session import get_spark
from fuzzspark.functions import scorer_column
cpus = int(sys.argv[1])
# UDF-heavy scan: small input splits so tasks >> cores (default 128MB
# bin-packing collapses the 128 files into ~6 partitions)
spark = get_spark("scaling-bench", cpus=cpus, shuffle_partitions=max(cpus, 8),
                  extra_conf={"spark.sql.files.maxPartitionBytes": "4m",
                              "spark.sql.files.openCostInBytes": "1m"})
spark.sparkContext.setLogLevel("ERROR")
pairs = spark.read.parquet(%(out)r)
# warmup: spin up a python worker on EVERY core (limit() touches one
# partition only and leaves 4N-1 cold workers inside the timed run)
warm = spark.range(0, cpus * 4, 1, cpus * 4).selectExpr(
    "repeat('w', 64) as s1", "repeat('x', 64) as s2")
warm.withColumn("r", scorer_column("ratio", "s1", "s2")).agg(F.sum("r")).collect()
t0 = time.time()
n = (pairs.withColumn("score", scorer_column("ratio", "s1", "s2"))
     .where(F.col("score") >= 0.0).count())
dt = time.time() - t0
print(json.dumps({"cpus": cpus, "pairs": n, "sec": dt,
                  "pairs_per_sec": n / dt}))
spark.stop()
"""


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else 0.5 * (s[m - 1] + s[m])


def main():
    """Paired-interleaved protocol (round-3): the N and 4N legs run
    back-to-back inside each pair (host-tenancy noise on this VM drifts
    on a seconds-to-minutes scale, so adjacent legs see correlated
    conditions and their RATIO cancels it); leg order alternates
    NH/HN between pairs to cancel any first-run effect; the reported
    statistic is the MEDIAN of >= SCALING_PAIRS paired efficiencies
    (not the best run, not independent-leg medians)."""
    n = int(os.environ.get("SCALING_N", "8"))
    n_pairs_runs = int(os.environ.get("SCALING_PAIRS", "8"))
    out = os.path.join(tempfile.mkdtemp(prefix="fuzzspark_scaling_"), "pairs")
    prep = PREP % {"repo": REPO, "sf": SF_DIR, "mod": PAIR_MOD,
                   "parts": N_PARTS, "out": out}
    r = subprocess.run([sys.executable, "-c", prep], capture_output=True,
                       text=True, timeout=1200)
    npairs = int([l for l in r.stdout.splitlines()
                  if l.startswith("PAIRS")][0].split()[1])

    def run_at(cpus: int) -> dict:
        code = CHILD % {"repo": REPO, "out": out}
        res = subprocess.run([sys.executable, "-c", code, str(cpus)],
                             capture_output=True, text=True, timeout=2400)
        line = [l for l in res.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        return json.loads(line)

    samples = []
    for i in range(n_pairs_runs):
        if i % 2 == 0:
            lo = run_at(n)
            hi = run_at(4 * n)
        else:
            hi = run_at(4 * n)
            lo = run_at(n)
        eff = lo["sec"] / (4.0 * hi["sec"])
        samples.append({"i": i, "order": "N,4N" if i % 2 == 0 else "4N,N",
                        "sec_at_n": round(lo["sec"], 2),
                        "sec_at_4n": round(hi["sec"], 2),
                        "pairs_per_sec_at_n": round(lo["pairs_per_sec"], 1),
                        "pairs_per_sec_at_4n": round(hi["pairs_per_sec"], 1),
                        "efficiency": round(eff, 3)})
        print(json.dumps(samples[-1]), flush=True)

    effs = [s["efficiency"] for s in samples]
    med = _median(effs)
    trimmed = (_median(effs) if len(effs) < 4 else
               sum(sorted(effs)[1:-1]) / (len(effs) - 2))
    result = {
        "job": "ratio scoring stage over materialized candidate pairs "
               "(paired-interleaved legs)",
        "sf_dir": SF_DIR, "pairs": npairs,
        "n_cores": n, "n4_cores": 4 * n, "n_paired_runs": len(effs),
        "efficiencies": effs,
        "median_efficiency": round(med, 3),
        "trimmed_mean_efficiency": round(trimmed, 3),
    }
    print(json.dumps(result))
    stamp = time.strftime("%Y-%m-%d %H:%M")
    path = os.path.join(REPO, "BENCH_SCALING.md")
    with open(path, "a") as f:
        f.write(f"\n**{stamp} paired-interleaved {n}->{4*n}** "
                f"({len(effs)} pairs, alternating leg order, "
                f"{npairs} scored pairs/leg): samples {effs} -> "
                f"median **{round(med, 3)}**, "
                f"trimmed mean {round(trimmed, 3)}.\n")
        f.write("| when | sf | pairs | N | 4N | sec@N | sec@4N | "
                "pairs/s@N | pairs/s@4N | efficiency |\n"
                "|---|---|---|---|---|---|---|---|---|---|\n")
        for s in samples:
            f.write(f"| {stamp} #{s['i']} ({s['order']}) "
                    f"| {SF_DIR.split('/')[-1]} | {npairs} "
                    f"| {n} | {4*n} | {s['sec_at_n']} "
                    f"| {s['sec_at_4n']} | {s['pairs_per_sec_at_n']} "
                    f"| {s['pairs_per_sec_at_4n']} "
                    f"| **{s['efficiency']}** |\n")
    return 0 if med >= 0.8 else 1


if __name__ == "__main__":
    raise SystemExit(main())
