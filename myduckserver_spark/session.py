"""SparkSession bootstrap for the engine.

Mirrors the reference's catalog/session init (reference:
catalog/provider.go:108-239 — schema bootstrap, timezone pinning,
checkpoint pragmas) re-expressed as Spark session configuration.

Design notes for scale: these defaults are tuned for local[N] testing
but every knob is overridable; on a real cluster the same builder is
used with `master` / shuffle-partition counts supplied by the deploy.
AQE is always on so runtime stats re-plan joins (skew, broadcast) at
100 TB without hand-tuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "myduckserver_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) the tuned SparkSession.

    Pinned semantics that matter for oracle parity with DuckDB:
    - session timezone UTC (DuckDB timestamps are UTC-naive),
    - ANSI mode OFF (MySQL-ish permissive coercions, matches the
      reference's MySQL front door; see SURVEY.md §7 risk register).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst=true (the default) coalesces only down to the
        # cluster's parallelism (32 here), so a 6-row aggregate still pays
        # 32 shuffle tasks of pure scheduling overhead. False makes AQE
        # honor advisoryPartitionSizeInBytes instead — tiny shuffles
        # coalesce to 1 task locally while 100 TB shuffles keep ~64 MB
        # partitions. This is the setting Spark's own tuning guide
        # recommends flipping on clusters.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Long-lived sessions compile one generated class per plan shape;
        # the JVM's default 240m code cache fills after a few hundred
        # shapes and HotSpot silently stops JIT-compiling — measured as
        # 10-20x slowdowns late in a 100+-query session. Reserve more and
        # let the sweeper evict cold code instead.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
        )
        # files.maxPartitionBytes default 128m is right for the 100 TB
        # target; local test files are single-row-group anyway.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Parquet TIMESTAMP(NANOS) is otherwise rejected; read as long and
        # convert to µs in tables.load_table (DuckDB truncates the same way).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # MySQL's JSON_OBJECTAGG / JSON object semantics: duplicate map
        # keys keep the LAST value (default EXCEPTION would error)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    )
    if master.startswith("local"):
        # Single-process serving profile. These three trade cluster-scale
        # robustness for per-query latency, so they apply ONLY in local
        # mode — a cluster deploy (master=yarn/k8s) keeps Spark defaults:
        # - initialPartitionNum: AQE's pre-coalesce shuffle width. In one
        #   JVM, materializing a 32-task shuffle stage costs more in task
        #   scheduling than the work itself; 1/4 of the core count is
        #   enough map-side parallelism at test SFs, and AQE still splits
        #   skewed/oversized partitions upward. On a cluster the deploy's
        #   shuffle_partitions govern (unset ⇒ Spark uses that number).
        # - constraintPropagation: InferFiltersFromConstraints is O(plan²)
        #   driver work per query — worth it when an inferred IsNotNull
        #   prunes terabytes, pure planning latency on a laptop-scale run.
        # - in-memory cache codec: decode time dominates memory pressure
        #   when the whole working set is a few hundred MB.
        builder = (
            builder.config(
                "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                str(max(4, shuffle_partitions // 4)),
            )
            .config("spark.sql.constraintPropagation.enabled", "false")
            .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
