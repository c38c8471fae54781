"""Gather / stream / feature / security operator family over `events`.

Completes the SURVEY.md §2 inventory beyond events_ops.py: the gather
group-by machinery (§2.6), gatherFeatures + strut scoring (§2.6-2.7),
inbox/unread and authz joins (§2.7), bloom containment probe (§2.7),
latest/first-occurrence indexes (§2.8), time-range masks and
boundedCardinalities histograms (§2.1), and keyset pagination (§2.8).
Each operator cites its reference site and ships a DuckDB oracle.

`item` below = `json props.k` (the sparse "parent doc" key, like miru's
aggregate-around field); `md5i` is the portable md5-derived int shared
with ops.dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _md5i, _md5i_sql


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _items(spark, sf_dir):
    return _events(spark, sf_dir).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    )


_ITEMS_SQL = """
ev AS (
  SELECT event_id, ts, user_id, event_type, value,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events
)"""


# -- gather: distinct terms of a field over a filtered doc set, with
#    counts + lastId (MiruAggregateUtil.gather:953-985 ->
#    gatherActivityLookup:1009-1096 counts removed docs per term) ----------

def ev_gather_counts(spark, sf_dir):
    ev = _items(spark, sf_dir).filter(F.col("value") > 5.0)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n_docs"),
        F.max("event_id").alias("last_id"),
    )


EV_GATHER_COUNTS_SQL = f"""
WITH {_ITEMS_SQL.strip()}
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_docs,
       max(event_id) AS last_id
FROM ev WHERE value > 5.0
GROUP BY event_type
"""


# -- stream: gather with per-term doc sets
#    (MiruAggregateUtil.stream:750-856) ------------------------------------

def ev_stream_sets(spark, sf_dir):
    ev = _items(spark, sf_dir).filter(F.col("item") < 10)
    # doc set as a ','-joined numerically-sorted string: every output
    # column stays hashable for the driver's row canonicalizer (an
    # array<long> column breaks pandas sort_values), while the content is
    # still the full per-term doc set the reference streams.
    return ev.groupBy("item").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_set("event_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("doc_ids"),
        F.count("*").cast("long").alias("cnt"),
    )


EV_STREAM_SETS_SQL = f"""
WITH {_ITEMS_SQL.strip()},
base AS (SELECT item, event_id FROM ev WHERE item < 10),
sets AS (
  SELECT item,
         string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS doc_ids
  FROM (SELECT DISTINCT item, event_id FROM base)
  GROUP BY item
),
cnts AS (
  SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY item
)
SELECT s.item, s.doc_ids, c.cnt
FROM sets s JOIN cnts c USING (item)
"""


# -- gatherFeatures: co-occurrence tuple counting per answer term, top-N
#    per term (MiruAggregateUtil.gatherFeatures:77-291; top-N heaps per
#    feature :105-108,262-272) ---------------------------------------------

def ev_gather_features(spark, sf_dir):
    ev = _items(spark, sf_dir).select(
        "event_type",
        (F.col("user_id") % 10).alias("f_user_bucket"),
        F.hour("ts").alias("f_hour"),
    )
    counts = ev.groupBy("event_type", "f_user_bucket", "f_hour").agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("f_user_bucket"), F.asc("f_hour")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "f_user_bucket", "f_hour", "cnt", "rn")
    )


EV_GATHER_FEATURES_SQL = """
WITH counts AS (
  SELECT event_type, user_id % 10 AS f_user_bucket,
         CAST(extract(hour FROM ts) AS BIGINT) AS f_hour,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2, 3
), ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY event_type
           ORDER BY cnt DESC, f_user_bucket ASC, f_hour ASC) AS rn
  FROM counts
)
SELECT event_type, f_user_bucket, f_hour, cnt, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 5
"""


# -- strut: learned feature scoring = sum(count x weight) combined per
#    strategy (Strut.java:82-236, scaleScore :399-407, finalizeScore
#    :367-397; Strategy.java:6-10 UNIT_WEIGHTED / REGRESSION_WEIGHTED /
#    MAX). Model weight is a deterministic function of the feature
#    (1/(1+bucket)) standing in for the catwalk model table;
#    REGRESSION_WEIGHTED pre-scales each numerator by a per-feature
#    regression scalar (Strategy.java:8 "S = 0.5*A + 0.4*B + ...") -- here
#    the deterministic scalar 1/(2+bucket) -- then sums the positive
#    scaled scores (finalizeScore:378-385). ---------------------------------

def ev_strut_score(spark, sf_dir):
    ev = _items(spark, sf_dir).select(
        "event_type", (F.col("user_id") % 10).alias("bucket")
    )
    feat = ev.groupBy("event_type", "bucket").agg(
        F.count("*").cast("double").alias("cnt")
    )
    weighted = feat.withColumn(
        "w", F.lit(1.0) / (F.lit(1.0) + F.col("bucket").cast("double"))
    ).withColumn(
        "scalar", F.lit(1.0) / (F.lit(2.0) + F.col("bucket").cast("double"))
    )
    return weighted.groupBy("event_type").agg(
        F.round(
            F.sum(F.col("cnt") * F.col("w")) / F.sum("cnt"), 6
        ).alias("unit_weighted"),
        F.round(
            F.sum(
                F.when(
                    F.col("cnt") * F.col("w") * F.col("scalar") > 0,
                    F.col("cnt") * F.col("w") * F.col("scalar"),
                ).otherwise(0.0)
            ),
            6,
        ).alias("regression_weighted"),
        F.round(F.max(F.col("w")), 6).alias("max_weight"),
    )


EV_STRUT_SCORE_SQL = """
WITH feat AS (
  SELECT event_type, user_id % 10 AS bucket, CAST(count(*) AS DOUBLE) AS cnt
  FROM events GROUP BY 1, 2
), weighted AS (
  SELECT *, 1.0 / (1.0 + CAST(bucket AS DOUBLE)) AS w,
         1.0 / (2.0 + CAST(bucket AS DOUBLE)) AS scalar
  FROM feat
)
SELECT event_type,
       round(sum(cnt * w) / sum(cnt), 6) AS unit_weighted,
       round(sum(CASE WHEN cnt * w * scalar > 0
                      THEN cnt * w * scalar ELSE 0 END), 6)
         AS regression_weighted,
       round(max(w), 6) AS max_weight
FROM weighted GROUP BY event_type
"""


# -- inbox/unread: stream ∩ inbox minus read
#    (AggregateCountsInboxQuestion.java, MiruJustInTimeBackfillerizer.java;
#    WAL READ/UNREAD types MiruPartitionedActivity.java:17-19) -------------

def ev_inbox_unread(spark, sf_dir):
    ev = _items(spark, sf_dir)
    touched = (
        ev.filter(F.col("event_type") != "view")
        .select("user_id", "item")
        .distinct()
    )
    viewed = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", "item")
        .distinct()
    )
    unread = touched.join(viewed, ["user_id", "item"], "left_anti")
    return unread.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_unread")
    )


EV_INBOX_UNREAD_SQL = f"""
WITH {_ITEMS_SQL.strip()},
touched AS (
  SELECT DISTINCT user_id, item FROM ev WHERE event_type <> 'view'
), viewed AS (
  SELECT DISTINCT user_id, item FROM ev WHERE event_type = 'view'
)
SELECT t.user_id, CAST(count(*) AS BIGINT) AS n_unread
FROM touched t
LEFT JOIN viewed v ON v.user_id = t.user_id AND v.item = t.item
WHERE v.item IS NULL
GROUP BY t.user_id
"""


def ev_inbox_distinct_count(spark, sf_dir):
    """DistinctCount scoped to an inbox stream: number of DISTINCT items
    in each user's inbox (their touched-item stream), the inbox variant
    of the count plugin -- DistinctCountInboxQuestion.java builds the
    answer bitmap from the user's inbox index instead of a custom
    filter, then counts distinct aggregate terms
    (miru-stream-plugins/.../count/DistinctCountInboxQuestion.java:51-96,
    DistinctCount.java numberOfDistincts)."""
    ev = _items(spark, sf_dir)
    inbox = ev.filter(F.col("event_type") != "view")
    return inbox.groupBy("user_id").agg(
        F.countDistinct("item").cast("long").alias("n_distinct_items")
    )


EV_INBOX_DISTINCT_COUNT_SQL = f"""
WITH {_ITEMS_SQL.strip()}
SELECT user_id, CAST(count(DISTINCT item) AS BIGINT) AS n_distinct_items
FROM ev WHERE event_type <> 'view'
GROUP BY user_id
"""



def ev_inbox_aggregate_counts(spark, sf_dir):
    """AggregateCounts scoped to inbox streams: the conversation-list
    page -- latest event and total count per (user, item) over each
    user's inbox (AggregateCountsInboxQuestion.java builds the answer
    from the inbox index, then the same gather/aggregate as the custom
    variant; filter/AggregateCounts.java latest-per-aggregate-term)."""
    inbox = _items(spark, sf_dir).filter(F.col("event_type") != "view")
    w = Window.partitionBy("user_id", "item").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest = (
        inbox.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "item", F.col("event_id").alias("latest_event_id"))
    )
    counts = inbox.groupBy("user_id", "item").agg(
        F.count("*").cast("long").alias("n_events")
    )
    return latest.join(counts, ["user_id", "item"]).select(
        "user_id", "item", "latest_event_id", "n_events"
    )


EV_INBOX_AGG_COUNTS_SQL = f"""
WITH {_ITEMS_SQL.strip()},
inbox AS (
  SELECT * FROM ev WHERE event_type <> 'view'
), ranked AS (
  SELECT user_id, item, event_id,
         row_number() OVER (PARTITION BY user_id, item
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM inbox
), counts AS (
  SELECT user_id, item, CAST(count(*) AS BIGINT) AS n_events
  FROM inbox GROUP BY user_id, item
)
SELECT r.user_id, r.item, r.event_id AS latest_event_id, c.n_events
FROM ranked r JOIN counts c USING (user_id, item)
WHERE r.rn = 1
"""



# -- authz: row-level security mask = OR of allowed label bitmaps
#    (MiruAuthzUtils.getCompositeAuthz:24-33) -- semi-join against the
#    allowed label set, here labels = user_id % 8 --------------------------

def ev_authz_filter(spark, sf_dir):
    allowed = spark.createDataFrame([(1,), (3,), (5,)], "label long")
    ev = _events(spark, sf_dir).withColumn(
        "label", F.col("user_id") % 8
    )
    return (
        ev.join(F.broadcast(allowed), "label", "left_semi")
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_visible"))
    )


EV_AUTHZ_FILTER_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_visible
FROM events
WHERE user_id % 8 IN (1, 3, 5)
GROUP BY event_type
"""


# -- pairedLatest aux index: "for each distinct value of this field, what
#    is the latest activity against each distinct value of the related
#    field?" (MiruIndexPairedLatest.compose,
#    miru-service/.../stream/MiruIndexPairedLatest.java:37-85 -- walks ids
#    backwards, keeps the first (= largest id) per (fieldValue,
#    aggregateFieldValue) pair). Spark form: one map-side-combinable
#    max_by per (user_id, item) pair -- the backwards walk IS argmax on
#    the activity id. Field pair here: (user_id, item), capped to a
#    deterministic slice so the oracle row set stays bounded. -------------

def ev_paired_latest(spark, sf_dir):
    ev = _items(spark, sf_dir).filter(
        F.col("item").isNotNull() & (F.col("user_id") < 20)
    )
    return (
        ev.groupBy("user_id", "item")
        .agg(
            F.max_by(
                "event_id", F.struct(F.col("ts"), F.col("event_id"))
            ).alias("latest_event"),
            F.max("ts").alias("latest_ts"),
            F.count("*").cast("long").alias("n_events"),
        )
    )


EV_PAIRED_LATEST_SQL = f"""
WITH {_ITEMS_SQL.strip()}
SELECT user_id, item,
       first(event_id ORDER BY ts DESC, event_id DESC) AS latest_event,
       max(ts) AS latest_ts,
       CAST(count(*) AS BIGINT) AS n_events
FROM ev
WHERE item IS NOT NULL AND user_id < 20
GROUP BY user_id, item
"""


# -- bloom containment probe: approximate semi-join with deterministic
#    false positives (BloomIndex.mightContain, miru-plugin/.../
#    BloomIndex.java:34-105 -- bitmap-backed bloom over hashed term bits).
#    Bucket = md5i(item) % 64; probe set = buckets of user 1's items, so
#    both engines reproduce the same FP set exactly. -----------------------

def ev_bloom_probe(spark, sf_dir):
    ev = _items(spark, sf_dir)
    hashed = ev.withColumn(
        "bucket", _md5i(F.col("item").cast("string")) % 64
    )
    probe = (
        hashed.filter(F.col("user_id") == 1)
        .select("bucket")
        .distinct()
    )
    cand = hashed.join(F.broadcast(probe), "bucket", "left_semi")
    return cand.agg(
        F.count("*").cast("long").alias("might_contain"),
        F.countDistinct("item").cast("long").alias("n_items"),
    )


EV_BLOOM_PROBE_SQL = f"""
WITH {_ITEMS_SQL.strip()},
hashed AS (
  SELECT *, {_md5i_sql("CAST(item AS VARCHAR)")} % 64 AS bucket FROM ev
), probe AS (
  SELECT DISTINCT bucket FROM hashed WHERE user_id = 1
)
SELECT CAST(count(*) AS BIGINT) AS might_contain,
       CAST(count(DISTINCT item) AS BIGINT) AS n_items
FROM hashed WHERE bucket IN (SELECT bucket FROM probe)
"""


# -- latest / first occurrence per term (singleTermIndexLatest /
#    indexedFirst: MiruIndexLatest.java, setIfEmpty
#    LabInvertedIndex.java:437-446) -- max_by / min_by ---------------------

def ev_latest_first(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.max("event_id").alias("latest_id"),
        F.min("event_id").alias("first_id"),
        F.max_by("user_id", "event_id").alias("latest_user"),
        F.min_by("user_id", "event_id").alias("first_user"),
    )


EV_LATEST_FIRST_SQL = """
SELECT event_type,
       max(event_id) AS latest_id,
       min(event_id) AS first_id,
       max_by(user_id, event_id) AS latest_user,
       min_by(user_id, event_id) AS first_user
FROM events GROUP BY event_type
"""


# -- time-range mask: closest-id interval on the time index
#    (MiruBitmaps.buildTimeRangeMask:141, LabTimeIndex.java:191-208) -------

def ev_time_range_mask(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-03 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-05 00:00:00").cast("timestamp"))
        )
        .agg(
            F.count("*").cast("long").alias("n_in_range"),
            F.min("event_id").alias("lo_id"),
            F.max("event_id").alias("hi_id"),
        )
    )


EV_TIME_RANGE_MASK_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_in_range,
       min(event_id) AS lo_id,
       max(event_id) AS hi_id
FROM events
WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
  AND ts <  TIMESTAMP '2024-01-05 00:00:00'
"""


# -- boundedCardinalities: popcount per docID bucket
#    (MiruBitmaps.boundedCardinalities:73,
#    RoaringInspection.cardinalityInBuckets) -------------------------------

def ev_bounded_cardinalities(spark, sf_dir):
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "click")
    return (
        ev.groupBy(F.floor(F.col("event_id") / 1000).alias("bucket"))
        .agg(F.count("*").cast("long").alias("cardinality"))
    )


EV_BOUNDED_CARD_SQL = """
SELECT CAST(floor(event_id / 1000) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS cardinality
FROM events WHERE event_type = 'click'
GROUP BY 1
"""


# -- keyset pagination: page N..M after a cursor
#    (startFromDistinctN, AggregateCountsQueryConstraint.java:16;
#    TF-IDF minScore floor FullText.java:134-135) --------------------------

def ev_pagination_keyset(spark, sf_dir):
    ev = _events(spark, sf_dir)
    agg = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n")
    )
    # cursor = last row of page 1 (n desc, user_id asc), page size 10
    page1 = agg.orderBy(F.desc("n"), F.asc("user_id")).limit(10)
    cursor = page1.orderBy(F.asc("n"), F.desc("user_id")).limit(1)
    crows = cursor.collect()
    if not crows:  # empty table: page 2 of nothing is nothing (the SQL
        return agg.limit(0)  # oracle's join form degrades the same way)
    c = crows[0]
    after = agg.filter(
        (F.col("n") < c["n"])
        | ((F.col("n") == c["n"]) & (F.col("user_id") > c["user_id"]))
    )
    return after.orderBy(F.desc("n"), F.asc("user_id")).limit(10)


EV_PAGINATION_KEYSET_SQL = """
WITH agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
), page1 AS (
  SELECT * FROM agg ORDER BY n DESC, user_id ASC LIMIT 10
), cursor AS (
  SELECT * FROM page1 ORDER BY n ASC, user_id DESC LIMIT 1
)
SELECT a.user_id, a.n
FROM agg a, cursor c
WHERE a.n < c.n OR (a.n = c.n AND a.user_id > c.user_id)
ORDER BY a.n DESC, a.user_id ASC
LIMIT 10
"""


def ev_catwalk_train(spark, sf_dir):
    """Catwalk model TRAINING: per feature value, count co-occurrence
    with each numerator term set and the feature's total cardinality.

    Faithful to the reference's Catwalk.model
    (miru-stream-plugins/.../catwalk/Catwalk.java:120-197): numerators[i]
    = docs having the feature value whose answer term is in
    numeratorTermSets[i] (:126-131), denominator = cardinality of the
    feature value's bitmap (:163), one FeatureScore row per feature value
    (:195, miru-catwalk-shared/.../FeatureScore.java:15-31); partition
    models merge by SUMMING numerators and denominators
    (CatwalkAnswerMerger.java:74-80) -- exactly a distributed groupBy
    sum, so this single map-side-combinable aggregation IS the
    cluster-wide trainer. max_score = max(numerators)/denominator
    (FeatureScore.getMaxScore :44-49).

    Feature = user bucket (user_id % 10); numerator sets over the answer
    term event_type: {click} and {click, view}.
    """
    ev = _items(spark, sf_dir).select(
        (F.col("user_id") % 10).alias("bucket"), "event_type"
    )
    model = ev.groupBy("bucket").agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).cast("long").alias("num_click"),
        F.sum(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0)
        ).cast("long").alias("num_engage"),
        F.count("*").cast("long").alias("denominator"),
    )
    return model.select(
        "bucket",
        "num_click",
        "num_engage",
        "denominator",
        F.round(
            F.greatest("num_click", "num_engage")
            / F.col("denominator").cast("double"),
            6,
        ).alias("max_score"),
    )


EV_CATWALK_TRAIN_SQL = """
WITH model AS (
  SELECT user_id % 10 AS bucket,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
           AS num_click,
         CAST(sum(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END)
           AS BIGINT) AS num_engage,
         CAST(count(*) AS BIGINT) AS denominator
  FROM events GROUP BY 1
)
SELECT bucket, num_click, num_engage, denominator,
       round(greatest(num_click, num_engage) / CAST(denominator AS DOUBLE), 6)
         AS max_score
FROM model
"""


QUERIES = {
    "ev_gather_counts": (ev_gather_counts, EV_GATHER_COUNTS_SQL),
    "ev_stream_sets": (ev_stream_sets, EV_STREAM_SETS_SQL),
    # ev_gather_features / ev_strut_score retired from the driver
    # registry (50-entry cap): driver-gated by ft_engine_features /
    # ft_engine_strut through the REAL engine; pytest-gated in
    # tests/test_entry_oracle.py.
    "ev_catwalk_train": (ev_catwalk_train, EV_CATWALK_TRAIN_SQL),
    "ev_inbox_unread": (ev_inbox_unread, EV_INBOX_UNREAD_SQL),
    "ev_inbox_distinct_count": (ev_inbox_distinct_count, EV_INBOX_DISTINCT_COUNT_SQL),
    # ev_inbox_aggregate_counts retired: driver-gated by
    # ft_engine_inbox (the engine's inbox page); pytest-gated in
    # tests/test_entry_oracle.py.
    "ev_authz_filter": (ev_authz_filter, EV_AUTHZ_FILTER_SQL),
    "ev_bloom_probe": (ev_bloom_probe, EV_BLOOM_PROBE_SQL),
    "ev_latest_first": (ev_latest_first, EV_LATEST_FIRST_SQL),
    "ev_paired_latest": (ev_paired_latest, EV_PAIRED_LATEST_SQL),
    "ev_time_range_mask": (ev_time_range_mask, EV_TIME_RANGE_MASK_SQL),
    "ev_bounded_cardinalities": (
        ev_bounded_cardinalities,
        EV_BOUNDED_CARD_SQL,
    ),
    "ev_pagination_keyset": (ev_pagination_keyset, EV_PAGINATION_KEYSET_SQL),
}
