"""SparkSession factory with the scale-oriented defaults this engine assumes.

Local testing runs on ``local[N]``; the same settings are what we would ship
in spark-defaults for a 1000-executor cluster run (AQE on, skew-join on,
Arrow on). Nothing here is sandbox-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def spread(df, min_partitions: int | None = None):
    """Parallelism floor for heavy map-side pipelines (Python kernels,
    regex scans, text generation): repartition only when the plan has
    FEWER partitions than the session's default parallelism.

    Single-file parquet inputs with one row group plan as ONE scan
    partition, so everything up to the first Exchange — Arrow kernels,
    regexp projections, broadcast-join fan-outs — runs on a single task
    while the rest of the cluster idles (guide §2.5 input skew). The
    repartition is a cheap narrow-input shuffle at that size and a no-op
    at scale (a 100 TB input already carries >= parallelism splits, so
    this never inserts an Exchange into a well-partitioned production
    plan). Streaming frames are returned untouched."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df if n >= target else df.repartition(target)


def get_spark(
    app_name: str = "nospa-cube-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Let AQE re-plan at runtime: coalesce post-shuffle partitions,
        # split skewed join partitions, convert to broadcast when small.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Pin the session timezone: TIMESTAMP_NTZ -> timestamp casts must be
        # timezone-invariant (a DST transition between two events would
        # otherwise skew epoch differences by an hour vs the oracle).
        .config("spark.sql.session.timeZone", "UTC")
        # Metadata joins in the validator are tiny; give broadcast headroom.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Bounded-collect probes (closure driver path, validator metadata
        # materialization) use limit(cap+1) where the cap almost always
        # exceeds the data; the default initialNumPartitions=1 makes
        # CollectLimit scan 1, then 4, then 16... partitions in sequential
        # jobs, re-reading earlier partitions each round (~1.6x the scan in
        # 3-4 round trips, measured on the validator's metadata pass). One
        # parallel pass is strictly better here; per-task reads stay
        # bounded by the local limit either way, so this does not change
        # the worst case on huge inputs.
        .config("spark.sql.limit.initialNumPartitions", "10000")
        # Allow subset co-partitioning for joins: the validator's
        # (obs, ds) joins arrive with both sides already HashPartitioning
        # on obs (the subj-bucketed at-rest layout, or the shared hash(obs)
        # exchange of the in-memory path); the default=true setting
        # reshuffles BOTH sides by the full key set anyway, re-introducing
        # the observation-scale Exchange the bucketed layout removes
        # (measured: at-rest ic11 shuffle-read 413 B -> 4.4 MB with the
        # default). Results are partitioning-independent; ds is a
        # low-cardinality suffix key, so clustering by obs alone cannot
        # concentrate load.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
