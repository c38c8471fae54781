"""miru plugin-family operators re-expressed over the `events` table.

Each operator mirrors a reference query plugin (file:line cited per
function) as a Catalyst-plannable DataFrame pipeline with a DuckDB SQL
oracle. `events` schema: event_id, ts, user_id, event_type, value, props.
"""

from __future__ import annotations

import pandas as pd
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


# -- Trending PEAKS / HIGHEST_PEAK / LEADER strategies:
#    TrendingInjectable.java:126-190 (strategy dispatch), PeakDet.java
#    (Billauer's public-domain `peakdet`: a point is a maximum peak if it
#    was followed by a drop of more than DELTA). DELTA per entity =
#    highest_bucket/6 + bucket95/100, where bucket95 is commons-math
#    Percentile().evaluate(highestBuckets, 0.95) -- note the reference
#    passes 0.95 on the 0-100 percentile scale (R-6 estimator), which we
#    reproduce faithfully. LEADER = waveform sum, HIGHEST_PEAK = max. ----


def _r6_percentile(sorted_vals: list, p: float) -> float:
    """commons-math Percentile (R-6 / legacy estimator): pos = p/100*(n+1),
    linear interpolation between order statistics."""
    n = len(sorted_vals)
    if n == 0:
        return 0.0
    if n == 1:
        return float(sorted_vals[0])
    pos = p / 100.0 * (n + 1)
    if pos < 1:
        return float(sorted_vals[0])
    if pos >= n:
        return float(sorted_vals[-1])
    d = int(pos)
    frac = pos - d
    return float(sorted_vals[d - 1]) + frac * (
        float(sorted_vals[d]) - float(sorted_vals[d - 1])
    )


def _peakdet_count(vec, delta: float) -> int:
    """Count maxima via Billauer's peakdet (public domain,
    http://billauer.co.il; the algorithm PeakDet.java transcribes)."""
    mn, mx = float("inf"), float("-inf")
    lookformax = True
    peaks = 0
    for a in vec:
        a = float(a)
        if a > mx:
            mx = a
        if a < mn:
            mn = a
        if lookformax:
            if a < mx - delta:
                peaks += 1
                mn = a
                lookformax = False
        else:
            if a > mn + delta:
                mx = a
                lookformax = True
    return peaks


def ev_trending_peaks(spark, sf_dir, max_candidates: int = 10_000):
    """All three non-slope trending strategies over zero-filled daily
    waveforms per event_type: n_peaks (PEAKS), leader (LEADER), and
    highest_peak (HIGHEST_PEAK). Waveform aggregation is distributed
    (groupBy + collect_list of day buckets -- bucket count is the query's
    segment count, bounded); peak counting runs in an Arrow-batched
    pandas UDF over one tiny row per entity.

    The driver-side R-6 percentile is computed over a candidate set
    BOUNDED at `max_candidates` entities, top-ranked by leader -- the
    reference does the same: TrendingInjectable takes the top-N by an
    initial strategy and percentiles over those candidates
    (miru-reco-plugins TrendingInjectable/PeakDet delta). So the collect
    is O(max_candidates), never vocabulary-sized, and output is likewise
    restricted to the candidates (identical whenever the entity count is
    under the bound, as with the 5 event_types here)."""
    from pyspark.sql.functions import pandas_udf

    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("DAY", "ts").cast("date"),
            F.lit("2024-01-01").cast("date"),
        ).alias("day_idx"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    # scanned three times (maxd, grid, and through wf below) -- persist
    # the per-day counts so the events table is read ONCE
    daily = daily.persist()
    maxd = daily.agg(F.max("day_idx")).collect()[0][0] or 0
    days = spark.range(0, int(maxd) + 1).select(
        F.col("id").cast("int").alias("day_idx")
    )
    grid = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(days))
        .join(daily, ["event_type", "day_idx"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0).cast("long")))
    )
    wf = (
        grid.groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day_idx", "cnt"))),
                lambda x: x["cnt"],
            ).alias("waveform")
        )
        .withColumn("highest_peak", F.array_max("waveform"))
        .withColumn(
            "leader",
            F.aggregate(
                "waveform", F.lit(0).cast("long"), lambda a, v: a + v
            ),
        )
    )
    # the candidate collect AND the returned plan both read wf: persist
    # so the grid/waveform aggregation runs once, not twice
    wf = wf.persist()
    cand_rows = (
        wf.select("event_type", "highest_peak", "leader")
        .orderBy(F.desc("leader"), F.asc("event_type"))
        .limit(int(max_candidates))
        .collect()
    )
    highs = sorted(int(r["highest_peak"]) for r in cand_rows)
    bucket95 = _r6_percentile(highs, 0.95)
    cdf = spark.createDataFrame(
        [(r["event_type"],) for r in cand_rows], "event_type string"
    )
    wf = wf.join(F.broadcast(cdf), "event_type", "semi")

    @pandas_udf("int")
    def peaks_of(wfs: pd.Series, deltas: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _peakdet_count(v, float(d))
                for v, d in zip(wfs, deltas)
            ],
            dtype="int32",
        )

    return wf.select(
        "event_type",
        peaks_of(
            F.col("waveform"),
            F.col("highest_peak") / 6.0 + F.lit(bucket95) / 100.0,
        ).alias("n_peaks"),
        "leader",
        "highest_peak",
    )


EV_TRENDING_PEAKS_SQL = """
WITH RECURSIVE daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) AS day_idx,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), bounds AS (SELECT max(day_idx) AS maxd FROM daily),
grid AS (
  SELECT e.event_type, d.day_idx, COALESCE(daily.cnt, 0) AS cnt
  FROM (SELECT DISTINCT event_type FROM daily) e
  CROSS JOIN (SELECT unnest(range(0, (SELECT maxd + 1 FROM bounds))) AS day_idx) d
  LEFT JOIN daily ON daily.event_type = e.event_type AND daily.day_idx = d.day_idx
), ent AS (
  SELECT event_type, max(cnt) AS highest, CAST(sum(cnt) AS BIGINT) AS leader
  FROM grid GROUP BY event_type
), b95 AS (
  -- commons-math R-6 percentile, p = 0.95 on the 0-100 scale (faithful
  -- to the reference's Percentile().evaluate(highestBuckets, 0.95))
  SELECT CASE
           WHEN n = 1 THEN CAST(l[1] AS DOUBLE)
           WHEN 0.0095 * (n + 1) < 1 THEN CAST(l[1] AS DOUBLE)
           WHEN 0.0095 * (n + 1) >= n THEN CAST(l[n] AS DOUBLE)
           ELSE CAST(l[CAST(floor(0.0095 * (n + 1)) AS INT)] AS DOUBLE)
                + (0.0095 * (n + 1) - floor(0.0095 * (n + 1)))
                  * (l[CAST(floor(0.0095 * (n + 1)) AS INT) + 1]
                     - l[CAST(floor(0.0095 * (n + 1)) AS INT)])
         END AS bucket95
  FROM (SELECT list_sort(list(highest)) AS l, count(*) AS n FROM ent)
), thr AS (
  SELECT ent.event_type, ent.highest / 6.0 + b95.bucket95 / 100.0 AS delta
  FROM ent CROSS JOIN b95
), walk(event_type, i, mx, mn, lookformax, peaks) AS (
  -- Billauer peakdet as a per-entity left-to-right fold
  SELECT event_type, -1, CAST(-1e308 AS DOUBLE), CAST(1e308 AS DOUBLE), 1, 0
  FROM ent
  UNION ALL
  SELECT w.event_type, w.i + 1,
         CASE WHEN w.lookformax = 0
                   AND g.cnt > least(w.mn, CAST(g.cnt AS DOUBLE)) + t.delta
              THEN CAST(g.cnt AS DOUBLE)
              ELSE greatest(w.mx, CAST(g.cnt AS DOUBLE)) END,
         CASE WHEN w.lookformax = 1
                   AND g.cnt < greatest(w.mx, CAST(g.cnt AS DOUBLE)) - t.delta
              THEN CAST(g.cnt AS DOUBLE)
              ELSE least(w.mn, CAST(g.cnt AS DOUBLE)) END,
         CASE WHEN w.lookformax = 1
                   AND g.cnt < greatest(w.mx, CAST(g.cnt AS DOUBLE)) - t.delta
              THEN 0
              WHEN w.lookformax = 0
                   AND g.cnt > least(w.mn, CAST(g.cnt AS DOUBLE)) + t.delta
              THEN 1
              ELSE w.lookformax END,
         w.peaks + CASE WHEN w.lookformax = 1
                             AND g.cnt < greatest(w.mx, CAST(g.cnt AS DOUBLE)) - t.delta
                        THEN 1 ELSE 0 END
  FROM walk w
  JOIN grid g ON g.event_type = w.event_type AND g.day_idx = w.i + 1
  JOIN thr t ON t.event_type = w.event_type
)
SELECT w.event_type, CAST(w.peaks AS INT) AS n_peaks, ent.leader,
       ent.highest AS highest_peak
FROM walk w
JOIN ent ON ent.event_type = w.event_type
WHERE w.i = (SELECT maxd FROM bounds)
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
-- NOT EXISTS, not NOT IN: with a NULL in my_items (an event lacking the
-- sparse props key) NOT IN goes three-valued and drops EVERY row, while
-- Spark's left_anti keeps non-matching rows; NOT EXISTS matches left_anti
WHERE NOT EXISTS (SELECT 1 FROM my_items m WHERE m.item = e.item)
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
    # ev_anomaly_newest retired: driver-gated by ft_engine_stumptown
    # (the engine's one-pass waveform + newest-k); pytest-gated in
    # tests/test_entry_oracle.py.
    "ev_trending_slope": (ev_trending_slope, EV_TRENDING_SLOPE_SQL),
    "ev_trending_peaks": (ev_trending_peaks, EV_TRENDING_PEAKS_SQL),
    # ev_reco_cofilter retired: driver-gated by ft_engine_reco (the
    # engine's 3-hop walk); pytest-gated in tests/test_entry_oracle.py.
}
