"""Read/unread state: a MERGE-style op log consumed by the inbox ops.

The reference writes explicit read-state activity types into the WAL --
READ / UNREAD / MARK_ALL_READ (miru-api/.../activity/
MiruPartitionedActivity.java:17-19) -- and the backfillerizer applies them
to a per-user unread bitmap: new inbox activity sets the unread bit, a
READ op clears bits up to its timestamp, UNREAD re-sets them, and
MARK_ALL_READ clears everything at or before its cutoff
(miru-service/.../stream/MiruJustInTimeBackfillerizer.java).

Spark re-expression: the read log is an append-only relation

    (user_id, item, op in {'read','unread','mark_all_read'}, ts, seq)

(`item` NULL for mark_all_read; `seq` a unique id giving a total order
within equal timestamps). Resolution is latest-op-wins:

- effective mark per (user, item) = the later of the user's newest
  mark_all_read and the item's newest explicit read/unread op
  (ties -> mark_all_read, matching WAL apply order where the bulk op
  lands after the per-item bit flips of the same instant)
- item unread iff: no effective mark; or the mark is 'unread'; or the
  mark is a read-type with timestamp T and the item has inbox activity
  STRICTLY after T (new activity re-sets the unread bit).

Everything is built-in DataFrame ops (window + broadcast-sized joins on
(user_id, item)); at 100 TB the log and the inbox co-partition on
user_id, so resolution is one co-located shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

READLOG_SCHEMA = (
    "user_id long, item long, op string, ts timestamp, seq long"
)


def latest_explicit(readlog: DataFrame) -> DataFrame:
    """Newest explicit read/unread op per (user_id, item):
    (user_id, item, op, ts)."""
    w = Window.partitionBy("user_id", "item").orderBy(
        F.desc("ts"), F.desc("seq")
    )
    return (
        readlog.filter(F.col("op").isin("read", "unread"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "item", "op", "ts")
    )


def markall_cutoffs(readlog: DataFrame) -> DataFrame:
    """Newest MARK_ALL_READ cutoff per user: (user_id, m_ts)."""
    return (
        readlog.filter(F.col("op") == "mark_all_read")
        .groupBy("user_id")
        .agg(F.max("ts").alias("m_ts"))
    )


def unread_items(inbox: DataFrame, readlog: DataFrame) -> DataFrame:
    """Unread (user_id, item) pairs. `inbox` carries the user's inbox
    activity rows (user_id, item, ts) -- multiple rows per item fine."""
    last_act = inbox.groupBy("user_id", "item").agg(
        F.max("ts").alias("last_act")
    )
    e = latest_explicit(readlog)
    m = markall_cutoffs(readlog)
    j = last_act.join(e, ["user_id", "item"], "left").join(m, "user_id", "left")
    unread = (
        F.when(F.col("ts").isNull() & F.col("m_ts").isNull(), F.lit(True))
        .when(
            F.col("m_ts").isNotNull()
            & (F.col("ts").isNull() | (F.col("m_ts") >= F.col("ts"))),
            F.col("last_act") > F.col("m_ts"),
        )
        .when(F.col("op") == "unread", F.lit(True))
        .otherwise(F.col("last_act") > F.col("ts"))
    )
    return j.filter(unread).select("user_id", "item")


def unread_counts(inbox: DataFrame, readlog: DataFrame) -> DataFrame:
    return unread_items(inbox, readlog).groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_unread")
    )


# -- oracle entry: unread counts after reads/unreads/mark-all-read ----------
#
# The synthetic `events` table has no separate read-op feed, so the op
# derives one deterministically: 'view' events are READ ops, 'click'
# events on items divisible by 5 double as explicit UNREAD ops, and every
# user_id % 7 == 0 gets a MARK_ALL_READ at their newest view. Inbox
# activity = all non-view events (same as ev_inbox_unread).

def _events_items(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    )


def ev_unread_after_reads(spark, sf_dir) -> DataFrame:
    ev = _events_items(spark, sf_dir)
    inbox = ev.filter(F.col("event_type") != "view").select(
        "user_id", "item", "ts"
    )
    reads = ev.filter(F.col("event_type") == "view").select(
        "user_id", "item", F.lit("read").alias("op"), "ts",
        F.col("event_id").alias("seq"),
    )
    unreads = ev.filter(
        (F.col("event_type") == "click") & (F.col("item") % 5 == 0)
    ).select(
        "user_id", "item", F.lit("unread").alias("op"), "ts",
        F.col("event_id").alias("seq"),
    )
    markall = (
        ev.filter((F.col("event_type") == "view") & (F.col("user_id") % 7 == 0))
        .groupBy("user_id")
        .agg(F.max("ts").alias("ts"))
        .select(
            "user_id",
            F.lit(None).cast("long").alias("item"),
            F.lit("mark_all_read").alias("op"),
            "ts",
            F.lit(-1).cast("long").alias("seq"),
        )
    )
    readlog = reads.unionByName(unreads).unionByName(markall)
    return unread_counts(inbox, readlog)


EV_UNREAD_AFTER_READS_SQL = """
WITH ev AS (
  SELECT event_id, ts, user_id, event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events
), inbox AS (
  SELECT user_id, item, max(ts) AS last_act
  FROM ev WHERE event_type <> 'view' GROUP BY user_id, item
), explicit AS (
  SELECT user_id, item, 'read' AS op, ts, event_id AS seq
  FROM ev WHERE event_type = 'view'
  UNION ALL
  SELECT user_id, item, 'unread' AS op, ts, event_id AS seq
  FROM ev WHERE event_type = 'click' AND item % 5 = 0
), last_exp AS (
  SELECT user_id, item, op, ts FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id, item ORDER BY ts DESC, seq DESC
    ) AS rn FROM explicit
  ) WHERE rn = 1
), markall AS (
  SELECT user_id, max(ts) AS m_ts
  FROM ev WHERE event_type = 'view' AND user_id % 7 = 0
  GROUP BY user_id
), eff AS (
  SELECT i.user_id, i.item, i.last_act, e.op AS e_op, e.ts AS e_ts, m.m_ts
  FROM inbox i
  LEFT JOIN last_exp e ON e.user_id = i.user_id AND e.item = i.item
  LEFT JOIN markall m ON m.user_id = i.user_id
), unread AS (
  SELECT user_id, item FROM eff
  WHERE CASE
    WHEN e_ts IS NULL AND m_ts IS NULL THEN TRUE
    WHEN m_ts IS NOT NULL AND (e_ts IS NULL OR m_ts >= e_ts)
      THEN last_act > m_ts
    WHEN e_op = 'unread' THEN TRUE
    ELSE last_act > e_ts END
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_unread
FROM unread GROUP BY user_id
"""


QUERIES = {
    "ev_unread_after_reads": (ev_unread_after_reads, EV_UNREAD_AFTER_READS_SQL),
}
