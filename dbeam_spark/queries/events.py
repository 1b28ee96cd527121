"""Event-stream analytics (batch side): sessionization, tumbling
windows, semi-structured extraction, as-of join.

These are the batch twins of the Structured Streaming operators in
`dbeam_spark/queries/streaming.py`; both run over the `events` table.
Scale notes: every operator here shuffles exactly once, on `user_id`
(window functions) or on the group key — at 100 TB that is the minimal
co-location the semantics require, and AQE handles skewed users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbeam_spark.queries.registry import register
from dbeam_spark.session import ensure_utc
from dbeam_spark.sources.files import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    return load_table(spark, sf_dir, "events")


@register(
    "events_window_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (batch form of the
    streaming windowed aggregation)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           SUM(new_session) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap): the classic
    lag → flag → running-sum pattern; one shuffle on user_id."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    new_session = F.when(
        lag_ts.isNull()
        | (F.col("ts") > lag_ts + F.expr("INTERVAL 30 MINUTES")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "events_top_users",
    oracle="""
    SELECT user_id,
           SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS total_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY total_k DESC, user_id
    LIMIT 20
    """,
)
def events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull `k` out of the JSON props with
    a JVM-side regexp (no Python in the loop), aggregate, top-20."""
    ev = _events(spark, sf_dir)
    k = F.regexp_extract("props", '"k": ([0-9]+)', 1).cast("bigint")
    return (
        ev.groupBy("user_id")
        .agg(F.sum(k).alias("total_k"), F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("total_k"), "user_id")
        .limit(20)
    )


@register(
    "asof_join_events",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           max_by(v.event_id, v.ts) AS last_view_id
    FROM events p
    LEFT JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    ORDER BY purchase_id
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest view at-or-before it
    by the same user.

    Spark-first formulation: instead of the oracle's O(n²) inequality
    join, sort each user's events once and carry the last-seen view
    forward with a running `max(struct(ts, event_id))` window — one
    shuffle on user_id, linear per partition. This is the plan that
    survives 100 TB; the oracle SQL is only the semantic spec.
    """
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_tag = F.when(
        F.col("event_type") == "view", F.struct("ts", "event_id")
    )
    return (
        ev.withColumn("last_view", F.max(view_tag).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("last_view.event_id").alias("last_view_id"),
        )
        .orderBy("purchase_id")
    )
