"""miru plugin-family operators re-expressed over the `events` table.

Each operator mirrors a reference query plugin (file:line cited per
function) as a Catalyst-plannable DataFrame pipeline with a DuckDB SQL
oracle. `events` schema: event_id, ts, user_id, event_type, value, props.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# -- Distincts (value list): Distincts.gatherDirect,
#    miru-reco-plugins/.../Distincts.java:69-140 ---------------------------

def ev_distincts(spark, sf_dir):
    return _events(spark, sf_dir).select("event_type").distinct()


EV_DISTINCTS_SQL = "SELECT DISTINCT event_type FROM events"


# -- DistinctCount (exact): DistinctCount.java (miru-stream-plugins) -------

def ev_distinct_count(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


EV_DISTINCT_COUNT_SQL = """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events WHERE event_type = 'click'
"""


# -- Uniques (prefix-constrained distinct count): UniquesInjectable.java ---

def ev_uniques_prefix(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type").startswith("c"))
        .agg(F.countDistinct("event_type").cast("long").alias("n_types"))
    )


EV_UNIQUES_PREFIX_SQL = """
SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM events WHERE event_type LIKE 'c%'
"""


# -- AggregateCounts (stream page: latest per entity + version counts):
#    AggregateCounts.java, query AggregateCountsQuery.java:15-23 -----------

def ev_aggregate_counts(spark, sf_dir):
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("latest_event_id"))
    )
    counts = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events")
    )
    return latest.join(counts, "user_id").select(
        "user_id", "latest_event_id", "n_events"
    )


EV_AGGREGATE_COUNTS_SQL = """
WITH ranked AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY user_id
)
SELECT r.user_id, r.event_id AS latest_event_id, c.n_events
FROM ranked r JOIN counts c USING (user_id)
WHERE r.rn = 1
"""


# -- Analytics (time-bucketed waveform per key):
#    Analytics.analyze, miru-analytics-plugins/.../Analytics.java:57-201 ---

def ev_analytics_waveform(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.date_trunc("DAY", "ts").cast("date").alias("day"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )


EV_ANALYTICS_WAVEFORM_SQL = """
SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
"""


# -- Metrics (bucketed sums): Metrics.java + MetricsQuery.java:18-22 -------

def ev_metrics(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("HOUR", "ts").alias("hour"))
        .agg(
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count("*").cast("long").alias("cnt"),
        )
    )


EV_METRICS_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       round(sum(value), 4) AS sum_value,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY date_trunc('hour', ts)
"""


# -- Anomaly / Stumptown (newest-k filtered events): Anomaly.java,
#    Stumptown.java (newest-k via descending docID iterator) ---------------

def ev_anomaly_newest(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select("event_id", "ts", "user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(15)
    )


EV_ANOMALY_NEWEST_SQL = """
SELECT event_id, ts, user_id FROM events
WHERE event_type = 'error'
ORDER BY ts DESC, event_id DESC LIMIT 15
"""


# -- Trending (waveform slope ranking): TrendingInjectable.java:83-170,
#    WaveformRegression.slope LINEAR_REGRESSION strategy -------------------

def ev_trending_slope(spark, sf_dir):
    daily = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("DAY", "ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("day_idx"),
        )
        .agg(F.count("*").cast("double").alias("cnt"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.round(
                F.regr_slope(F.col("cnt"), F.col("day_idx").cast("double")), 4
            ).alias("slope")
        )
    )


EV_TRENDING_SLOPE_SQL = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS day_idx,
         CAST(count(*) AS DOUBLE) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT event_type, round(regr_slope(cnt, CAST(day_idx AS DOUBLE)), 4) AS slope
FROM daily GROUP BY event_type
"""


# -- Collaborative filtering (3-hop self-join):
#    CollaborativeFiltering.collaborativeFiltering,
#    miru-reco-plugins/.../CollaborativeFiltering.java:58-213:
#    my types -> contributors who share them -> their other types,
#    scored by contributor activity -----------------------------------------

def ev_reco_cofilter(spark, sf_dir):
    """3-hop over the `k` item key in props JSON: my items -> contributors
    who touched them -> their other items, scored by contributor touch
    count; top-50 by (score desc, item). Item = json props.k so the item
    space (100 values) is sparse per user, like miru's parent docs."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.get_json_object("props", "$.k").alias("item")
    )
    me = 1
    my_items = ev.filter(F.col("user_id") == me).select("item").distinct()
    contributors = (
        ev.join(F.broadcast(my_items), "item")
        .filter(F.col("user_id") != me)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("weight"))
    )
    reco = (
        ev.join(contributors.select("user_id"), "user_id")
        .join(F.broadcast(my_items), "item", "left_anti")
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("score"))
    )
    return reco.orderBy(F.desc("score"), F.asc("item")).limit(50)


EV_RECO_COFILTER_SQL = """
WITH ev AS (
  SELECT user_id, json_extract_string(props, '$.k') AS item FROM events
), my_items AS (
  SELECT DISTINCT item FROM ev WHERE user_id = 1
), contributors AS (
  SELECT user_id FROM ev
  WHERE item IN (SELECT item FROM my_items) AND user_id <> 1
  GROUP BY user_id
)
SELECT e.item, CAST(count(*) AS BIGINT) AS score
FROM ev e JOIN contributors c USING (user_id)
WHERE e.item NOT IN (SELECT item FROM my_items)
GROUP BY e.item
ORDER BY score DESC, item ASC
LIMIT 50
"""


QUERIES = {
    "ev_distincts": (ev_distincts, EV_DISTINCTS_SQL),
    "ev_distinct_count": (ev_distinct_count, EV_DISTINCT_COUNT_SQL),
    "ev_uniques_prefix": (ev_uniques_prefix, EV_UNIQUES_PREFIX_SQL),
    "ev_aggregate_counts": (ev_aggregate_counts, EV_AGGREGATE_COUNTS_SQL),
    "ev_analytics_waveform": (ev_analytics_waveform, EV_ANALYTICS_WAVEFORM_SQL),
    "ev_metrics": (ev_metrics, EV_METRICS_SQL),
    "ev_anomaly_newest": (ev_anomaly_newest, EV_ANOMALY_NEWEST_SQL),
    "ev_trending_slope": (ev_trending_slope, EV_TRENDING_SLOPE_SQL),
    "ev_reco_cofilter": (ev_reco_cofilter, EV_RECO_COFILTER_SQL),
}
