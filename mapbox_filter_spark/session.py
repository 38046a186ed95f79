"""SparkSession factory tuned for the sandbox (local[N]) but written so the
same config ships to a real cluster via spark-submit --py-files.

At cluster scale the only local-mode assumptions are the master URL and
driver memory; shuffle partitioning, AQE and Arrow settings are the ones we
would set on a 1000-executor job too.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    cores: int | None = None,
    app_name: str = "mapbox_filter_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``cores=None`` -> ``local[*]``; shuffle partitions default to the core
    count (local rule of thumb: ~1 shuffle partition per core; on a real
    cluster this is set to 2-3x total executor cores instead).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)

    # Python workers must be able to import THIS package (module-level
    # pandas-UDF kernels pickle by reference): make the package root visible
    # to worker processes regardless of the consumer's cwd.  Local mode
    # inherits the driver env; a real cluster ships the same code via
    # spark-submit --py-files (scripts/package.py) instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pypath}" if pypath else pkg_root)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        # tmpfs shuffle dir: local-mode shuffles hit one disk; ramdisk keeps
        # them off it (the reference recommends the same trick for its hash
        # DB, /root/reference/README.md:137-143).  Real clusters use local
        # SSDs per executor instead.
        .config("spark.local.dir",
                os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
                if os.path.isdir("/dev/shm") else "/tmp")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # ObjectHashAggregate (collect_list/collect_set aggs: tile assembly,
        # hash_diff, dedup buckets) falls back to SORT-based aggregation
        # after only 128 distinct keys per task by default — i.e. every
        # tile-keyed assembly (<= 4^z keys/task) was sorting its whole input
        # per task.  64Ki keys keeps those aggs in the hash regime at any
        # scale where per-partition group counts are bounded by the shuffle
        # partition sizing (guide: partitions in the 100MB-1GB range); the
        # sort fallback still guards the genuinely-unbounded case.
        # Measured on hash_diff sf0.1: ~0.87s -> ~0.69s median.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                os.environ.get("SPARK_GRAFT_OBJ_AGG_FALLBACK", "65536"))
    )
    # Throughput GC for batch work: JDK17 defaults to G1 (pause-target
    # oriented); this engine is allocation-heavy batch (UnsafeRow churn,
    # collect_list buffers) with no latency SLO, where ParallelGC's
    # compacting young-gen throughput wins — measured 14% on the frozen
    # suite (sf0.1: 3.54s -> 3.04s, hash_diff cpu 7.6s -> 5.5s).  The same
    # choice ships to executors on a real cluster (standard Spark GC tuning
    # practice, not a local-mode artifact).  Override/disable with
    # SPARK_GRAFT_GC (e.g. "-XX:+UseG1GC" or "" to keep JVM defaults).
    gc_opts = os.environ.get("SPARK_GRAFT_GC", "-XX:+UseParallelGC")
    if gc_opts:
        builder = (builder
                   .config("spark.driver.extraJavaOptions", gc_opts)
                   .config("spark.executor.extraJavaOptions", gc_opts))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
