"""SparkSession helpers tuned for the engine.

Defaults are scale-oriented: AQE on (runtime coalescing + skew-join
splitting), Arrow on (fast pandas interchange for the few Pandas-UDF
operators), UTC session time so date semantics are deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(
    app_name: str = "dbeam-spark",
    master: str | None = None,
    shuffle_partitions: str | int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Runtime row-level pruning: build a bloom filter from the
        # selective side of a join and push it into the other side's
        # scan — at 100 TB this skips whole row groups for star joins
        # whose dim filters are selective (no-op when not).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin session timezone to UTC so timestamp/window semantics are
    deterministic regardless of the host timezone.

    Called at the top of every registered query so results match the
    DuckDB oracle (which is timezone-naive) even when the caller built
    the session without our defaults.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _quiet_bounded_window_warn(spark)
    return spark


def _quiet_bounded_window_warn(spark: SparkSession) -> None:
    """Set the WindowExec logger to ERROR for this JVM.

    Every remaining unpartitioned window in the engine runs over a
    frame whose cardinality is bounded by calendar grain, enum
    domain, or an upstream dimension reduction (each call site
    documents which) — Catalyst folds constant partition keys out of
    the partition spec, so the `Window.partitionBy(lit(0))` idiom
    does NOT silence the per-run WARN on Spark 4.x. Data-scaled
    global windows are the real hazard and are guarded structurally
    by tests/test_plan_regressions.py, so the blanket WARN is pure
    noise here. Best-effort: never fails a query over logging."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass
