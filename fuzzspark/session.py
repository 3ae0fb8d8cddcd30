"""SparkSession factory with scale-appropriate defaults.

Local test/bench sessions mirror the configs we would ship to a real
cluster: AQE on (skew-join splitting + partition coalescing), Arrow
batches bounded so Python-worker memory stays flat regardless of
content size (the reference allocates O(N) per comparison,
src/distance/levenshtein.rs:48-62 — our analog is bounding rows/batch).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
ARROW_MAX_RECORDS_PER_BATCH = 2048


def get_spark(app_name: str = "fuzzspark", cpus: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(ARROW_MAX_RECORDS_PER_BATCH))
        # UDF-heavy scans need tasks >> cores; the 128MB default
        # bin-packs small stage outputs into single tasks and silently
        # serializes the python scorers (see BENCH_SCALING.md)
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "2m")
        # align AQE's shuffle coalescing with the scan split size: the
        # 64m default would merge a small-but-UDF-heavy stage into one
        # or two tasks and serialize the python scorers
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        # shuffle/spill compression codec (guide §2.3 / §9): zstd —
        # A/B at the 400x tier measured 1.7x less shuffle write and
        # 2.2x less spill at IDENTICAL wall (32.7 vs 32.8 s), and
        # scratch disk is the binding resource at the top smoke tiers
        # (the r6 3200x attempt died on it).  Env-overridable, never
        # hard-coded (OPTIMIZATION_r07.md records the A/B)
        .config("spark.io.compression.codec",
                os.environ.get("FUZZSPARK_IO_CODEC", "zstd"))
        .config("spark.driver.memory", os.environ.get("FUZZSPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    _ship_package(spark)
    return spark


def package_zip(dest_dir: str | None = None) -> str:
    """Zip the fuzzspark package for spark-submit --py-files / addPyFile."""
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    dest = os.path.join(dest_dir or tempfile.gettempdir(), "fuzzspark_pkg.zip")
    with zipfile.ZipFile(dest, "w") as zf:
        for dirpath, _dirs, fnames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in fnames:
                # ship the C kernel source too — workers compile it
                # once per machine into the shared cache
                if fn.endswith((".py", ".c")):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return dest


def _ship_package(spark: SparkSession) -> None:
    """Make ``fuzzspark`` importable on executors regardless of cwd —
    the addPyFile equivalent of ``spark-submit --py-files`` (north_rule
    packaging requirement), idempotent per session."""
    sc = spark.sparkContext
    if getattr(sc, "_fuzzspark_shipped", False):
        return
    try:
        sc.addPyFile(package_zip())
    except Exception:  # already added under this name
        pass
    # pre-compile the native kernels on the driver so local-mode python
    # workers hit the warm cache immediately (cluster executors compile
    # once per machine via the same atomic cache path)
    try:
        from fuzzspark.kernels import _native
        _native._compile()
    except Exception:
        pass
    sc._fuzzspark_shipped = True
