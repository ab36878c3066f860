"""SparkSession factory with the scale-oriented defaults this engine assumes.

Local testing runs on ``local[N]``; the same settings are what we would ship
in spark-defaults for a 1000-executor cluster run (AQE on, skew-join on,
Arrow on). Nothing here is sandbox-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


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
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
