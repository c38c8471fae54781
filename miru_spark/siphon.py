"""Feed siphons: adapters that turn external event feeds into the
engine's document shape, ready for `build_index(extra_fields=...)` or
the streaming sip.

Reference analogs (behavior only -- re-expressed as JVM-side DataFrame
transforms, zero per-row Python):

* Edge siphon -- the reference's MiruSiphonPlugin that tails a KV
  change log of JSON-encoded service-call edges and emits activities
  under the fixed edgeSiphon schema (id/tenant/user/name/origin/
  destination/tags/latency; miru-edge-siphon/src/main/java/com/
  jivesoftware/os/miru/query/siphon/EdgeSiphon.java:30-93, Edge.java).
  Here: `parse_edges` (from_json over the value column) +
  `edge_documents` (doc-shape projection). Indexed fields mirror the
  reference schema's term-typed fields (`EDGE_FIELDS`); `id` and
  `latency` stay store-only like its nonIndexed field definitions.

* Log mill -- the stumptown intake that turns MiruLogEvent rows into
  activities under the stumptown schema with firstNonNull("unknown")
  defaults and a lowercase [^a-zA-Z0-9']+ message split
  (miru-stumptown-deployable/.../LogMill.java:33-91,
  StumptownSchemaConstants.java:23-40; event shape
  miru-logappender/.../MiruLogEvent.java). Here: `log_documents`
  projects the doc shape (message + exceptionClass + stack trace as the
  text relation -- the standard "und" analyzer applies the same
  lowercase alnum split, unstemmed) and `LOG_FIELDS` declares the
  schema's keyword dimensions. `level_counts` is the LogMill
  levelCounts table (per-ServiceId level tallies, LogMill.java:27-48)
  as one map-side-combinable groupBy.

Both adapters work identically on batch and streaming DataFrames (all
expressions are deterministic built-ins), so a readStream of edges/log
events composes with streaming/sip.py unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "EDGE_FIELDS",
    "LOG_FIELDS",
    "EDGE_SCHEMA",
    "parse_edges",
    "edge_documents",
    "log_documents",
    "level_counts",
]

# the term-indexed columns of the reference edgeSiphon schema
# (EdgeSiphon.java:30-41: tenant/user/name/origin/destination singleTerm,
# tags multiTerm; id + latency nonIndexed)
EDGE_FIELDS = ["tenant", "user", "name", "origin", "destination", "tags"]

# Edge.java:13-21 -- the JSON value payload of the KV change log
EDGE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("tenant", T.StringType()),
        T.StructField("user", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("origin", T.StringType()),
        T.StructField("destination", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("latency", T.LongType()),
    ]
)

# the term-indexed stumptown schema dimensions
# (StumptownSchemaConstants.java:23-40; message/thrownStackTrace are the
# tokenized text relation here, `timestamp` is the doc time axis)
LOG_FIELDS = [
    "datacenter",
    "cluster",
    "host",
    "service",
    "instance",
    "version",
    "level",
    "thread",
    "logger",
    "methodName",
    "lineNumber",
    "exceptionClass",
]


def parse_edges(
    df: DataFrame, value_col: str = "value", id_col: str | None = None
) -> DataFrame:
    """Decode a KV change-log DataFrame into typed Edge rows.

    `value_col` holds the JSON Edge payload (string or binary), like the
    `byte[] value` the reference siphon receives per row
    (EdgeSiphon.java:56-64). If `id_col` is given it overrides the
    JSON's id -- the reference derives the activity time from the KV
    row key (UIO.bytesLong(key), EdgeSiphon.java:71)."""
    v = F.col(value_col).cast("string")
    out = df.withColumn("_edge", F.from_json(v, EDGE_SCHEMA)).select(
        "*", "_edge.*"
    )
    if id_col is not None:
        out = out.withColumn("id", F.col(id_col).cast("long"))
    return out.drop("_edge", value_col)


def _nonempty(c, default="unknown"):
    # firstNonNull(emptyToNull(x), "unknown") -- LogMill.java:35-64
    col = F.col(c).cast("string")
    return F.when(
        col.isNull() | (F.length(F.trim(col)) == 0), F.lit(default)
    ).otherwise(col)


def edge_documents(edges: DataFrame) -> DataFrame:
    """Project typed Edge rows onto the engine's document shape
    (url, warc_ts, html, text, lang, fields), indexable via
    `build_index(..., extra_fields=EDGE_FIELDS)`.

    Parity choices:
    - url = edge://<tenant>/<id> (unique per edge: the reference keys
      the activity by the KV row id);
    - warc_ts = edge.timestamp (epoch millis), the activity time;
    - every EDGE_FIELDS value is a composed filter term, exactly the
      reference's term-typed fields; `name` ALSO serves as the text
      relation so ranked search works over edge names (the reference
      has no tokenized-text field -- search there is filter+gather);
    - id/latency ride along store-only (nonIndexed parity)."""
    tenant = F.coalesce(F.col("tenant"), F.lit("unknown"))
    fields = F.map_filter(
        F.create_map(
            F.lit("tenant"), F.array(tenant),
            F.lit("user"), F.array(F.col("user")),
            F.lit("name"), F.array(F.col("name")),
            F.lit("origin"), F.array(F.col("origin")),
            F.lit("destination"), F.array(F.col("destination")),
            F.lit("tags"), F.coalesce(
                F.col("tags"), F.array().cast("array<string>")
            ),
        ),
        # drop null/empty values so no "field\x1fnull" terms are minted
        lambda _, v: F.exists(
            v, lambda x: x.isNotNull() & (F.length(x) > 0)
        ),
    )
    return edges.select(
        F.format_string(
            "edge://%s/%d", tenant, F.col("id").cast("long")
        ).alias("url"),
        F.timestamp_millis(F.col("timestamp").cast("long")).alias(
            "warc_ts"
        ),
        F.lit(None).cast("binary").alias("html"),
        F.coalesce(F.col("name"), F.lit("")).alias("text"),
        F.lit("und").alias("lang"),
        fields.alias("fields"),
        F.col("id").alias("edge_id"),
        F.col("latency"),
    )


def log_documents(events: DataFrame) -> DataFrame:
    """LogMill.mill as a projection: MiruLogEvent rows -> the document
    shape, indexable via `build_index(..., extra_fields=LOG_FIELDS)`.

    - text = message + exceptionClass + joined stack trace; the "und"
      standard analyzer applies the same lowercase alnum split the
      reference's tokenize() does (LogMill.java:79-91), unstemmed;
    - each LOG_FIELDS dimension gets the firstNonNull "unknown" default
      (LogMill.java:35-64) and is indexed as one composed filter term;
    - url = log://<host>/<service>/<instance>/<ts>/<md5(text) prefix>
      -- deterministic and unique per distinct event (the reference
      mints an OrderId; a deterministic key keeps replays idempotent);
    - warc_ts: the event's string timestamp, epoch millis if numeric
      else ISO-parsed (MiruLogEvent.timestamp is a raw string)."""
    ts_str = F.col("timestamp").cast("string")
    ts = F.when(
        ts_str.rlike("^[0-9]+$"),
        F.timestamp_millis(ts_str.cast("long")),
    ).otherwise(F.to_timestamp(ts_str))
    text = F.concat_ws(
        " ",
        F.coalesce(F.col("message"), F.lit("")),
        F.coalesce(F.col("exceptionClass"), F.lit("")),
        F.array_join(
            F.coalesce(
                F.col("thrownStackTrace"), F.array().cast("array<string>")
            ),
            " ",
        ),
    )
    # MiruLogEvent property names -> stumptown schema field names
    src = {
        "thread": "threadName",
        "logger": "loggerName",
    }
    pairs = []
    for f in LOG_FIELDS:
        pairs.append(F.lit(f))
        # level's missing-value default is INFO (LogMill.java:42),
        # every other dimension defaults to "unknown"
        default = "INFO" if f == "level" else "unknown"
        pairs.append(F.array(_nonempty(src.get(f, f), default)))
    return events.select(
        F.format_string(
            "log://%s/%s/%s/%s/%s",
            _nonempty("host"),
            _nonempty("service"),
            _nonempty("instance"),
            ts_str,
            F.substring(F.md5(text), 1, 12),
        ).alias("url"),
        ts.alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        text.alias("text"),
        F.lit("und").alias("lang"),
        F.create_map(*pairs).alias("fields"),
    )


def level_counts(events: DataFrame) -> DataFrame:
    """The LogMill levelCounts table (LogMill.java:27-48): events per
    (ServiceId, level), ServiceId = datacenter/cluster/host/service/
    instance/version with "unknown" defaults. One partial-aggregating
    groupBy -- the 100-TB shape (no distinct, no shuffle beyond the
    agg)."""
    sid = [
        _nonempty(c).alias(c)
        for c in (
            "datacenter", "cluster", "host", "service", "instance",
            "version",
        )
    ]
    lvl = _nonempty("level", "INFO").alias("level")
    return (
        events.select(*sid, lvl)
        .groupBy(
            "datacenter", "cluster", "host", "service", "instance",
            "version", "level",
        )
        .agg(F.count("*").alias("n"))
    )
