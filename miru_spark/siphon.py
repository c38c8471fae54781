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

* Syslog intake -- the miru-syslog-deployable listener that parses
  raw "date host app[pid]: message" lines into MiruLogEvent rows and
  pumps them at the stumptown intake (MiruSyslogIntakeService.java,
  SyslogEvent.java:49-133). Here: `parse_syslog` reproduces the
  reference's two accepted date shapes (BSD "MMM d(d) HH:mm:ss" with
  the current year implied, and ISO8601 with micros + zone offset),
  the host token override, the app[pid] split, and the fixed INFO
  level -- all as JVM-side regexp/to_timestamp expressions -- and
  emits the MiruLogEvent column shape `log_documents` consumes.
  Unparsable lines are dropped exactly where the reference returns
  null (SyslogEvent.java:90-93).

* Anomaly metric intake -- the miru-anomaly-deployable's SampleTrawl
  mill (SampleTrawl.java:32-86): AnomalyMetric rows (miru-metric-
  sampler/.../AnomalyMetric.java) become activities whose numeric value
  is BIT-SLICED into a multi-term `bits` field (a sign term "+"/"-"
  plus one term per set bit of |value|), so per-bucket SUMS reconstruct
  from per-bit cardinalities -- the reference's bitmap-only rendering
  of metric aggregation (Anomaly.java metricingSum). Here:
  `parse_metrics` (from_json), `anomaly_documents` (the trawl as pure
  JVM expressions -- 63 static bit tests, no UDF), `trawled_counts`
  (the per-ServiceId ingressed tally), and `anomaly_sum` (the
  metricingSum readback: one waveform_many batch per sign over the
  bits terms, weighted 2^i). The engine's native `metrics()` over
  order-preserving numeric terms answers the same question for schema
  numeric fields; this family exists for reference-shape parity where
  the VALUE arrives pre-sliced.

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
    "parse_syslog",
    "parse_metrics",
    "edge_documents",
    "log_documents",
    "anomaly_documents",
    "level_counts",
    "trawled_counts",
    "anomaly_sum",
    "ANOMALY_FIELDS",
    "METRIC_SCHEMA",
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


# MiruLogEvent property shape (miru-logappender/.../MiruLogEvent.java)
# -- what parse_syslog emits and log_documents consumes.
SYSLOG_EVENT_COLUMNS = [
    "datacenter", "cluster", "host", "service", "instance", "version",
    "level", "threadName", "loggerName", "methodName", "lineNumber",
    "message", "timestamp", "exceptionClass", "thrownStackTrace",
]

# token split at the FIRST space: group 1 = head, group 2 = tail
_SP_RE = r"^([^ ]*) (.*)$"


def parse_syslog(
    df: DataFrame,
    line_col: str = "value",
    addr_col: str | None = None,
    year: int | None = None,
) -> DataFrame:
    """Parse raw syslog lines into MiruLogEvent rows (SyslogEvent.java:
    49-133), entirely JVM-side; compose with `log_documents` to index.

    Accepted shapes (the reference's two date branches, then
    `host app[pid]: message`):

      Nov 17 23:23:49 e1 etcd2[889]: compacted raft log at 95010
      Nov 5 23:23:49 e1 systemd[1]: Time has been changed
      2016-11-17T16:51:26.767584-08:00 host /usr/sbin/gmetad[2263]: msg

    Parity choices:
    - BSD dates carry no year; the reference stamps the CURRENT year
      (SyslogEvent.java:63-66). Pass `year=` for deterministic replays
      of archived feeds; default is the session's current year.
    - lines whose date parses under neither branch are dropped, where
      the reference returns null and the intake skips the event
      (SyslogEvent.java:90-93, MiruSyslogIntakeService);
    - if nothing follows the date, host falls back to the sender
      address (`addr_col`), the reference's remote-socket fallback
      (SyslogEvent.java:98-101);
    - `app[pid]` -> service + instance; a bare `app` (trailing ':'
      stripped) -> service only; a message with no second token leaves
      service/instance null (LogMill later defaults them "unknown");
    - level is fixed INFO and the remainder is the message
      (SyslogEvent.java:128-130); timestamp is epoch-millis-as-string,
      the MiruLogEvent wire shape.

    Deviation (documented): the reference parses the ISO fraction with
    SimpleDateFormat's 'SSSSSS' = literal MILLISECONDS (767584 ms ~=
    +12.8 min skew); this uses true fraction-of-second semantics."""
    line = F.col(line_col).cast("string")

    # branch 1: "MMM dd HH:mm:ss " / "MMM d HH:mm:ss " + implied year
    bsd_re = r"^([A-Za-z]{3} \d{1,2} \d{2}:\d{2}:\d{2}) (.*)$"
    bsd_date = F.regexp_extract(line, bsd_re, 1)
    bsd_rest = F.regexp_extract(line, bsd_re, 2)
    if year is not None:
        yr = F.lit(str(int(year)))
    else:
        yr = F.year(F.current_timestamp()).cast("string")
    bsd_ts = F.when(
        bsd_date != "",
        F.try_to_timestamp(
            F.concat(bsd_date, F.lit(" "), yr),
            F.lit("MMM d HH:mm:ss yyyy"),
        ),
    )

    # branch 2: first token as ISO8601 with micros + zone offset
    iso_date = F.regexp_extract(line, _SP_RE, 1)
    iso_rest = F.regexp_extract(line, _SP_RE, 2)
    iso_ts = F.when(
        iso_date != "",
        F.try_to_timestamp(
            iso_date, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        ),
    )

    ts = F.coalesce(bsd_ts, iso_ts)
    rest = F.when(bsd_ts.isNotNull(), bsd_rest).otherwise(iso_rest)

    # host token (or sender address when the date consumed everything)
    addr = (
        F.col(addr_col).cast("string")
        if addr_col is not None
        else F.lit(None).cast("string")
    )
    has_host = rest.contains(" ")
    host = F.when(
        has_host, F.trim(F.regexp_extract(rest, _SP_RE, 1))
    ).otherwise(addr)
    rest2 = F.when(has_host, F.regexp_extract(rest, _SP_RE, 2)).otherwise(
        rest
    )

    # "app[pid]:" / "app:" / "app" token, only when a message follows
    has_app = rest2.contains(" ")
    app = F.regexp_replace(F.regexp_extract(rest2, _SP_RE, 1), ":$", "")
    svc_pfx = F.regexp_extract(app, r"^([^\[]+)\[[^\]]*\]", 1)
    inst_in = F.regexp_extract(app, r"^[^\[]+\[([^\]]*)\]", 1)
    bracketed = svc_pfx != ""
    service = F.when(
        has_app,
        F.when(bracketed, F.trim(svc_pfx)).otherwise(F.trim(app)),
    )
    instance = F.when(has_app & bracketed, F.trim(inst_in))
    message = F.when(
        has_app, F.trim(F.regexp_extract(rest2, _SP_RE, 2))
    ).otherwise(rest2)

    null_s = F.lit(None).cast("string")
    return df.select(
        null_s.alias("datacenter"),
        null_s.alias("cluster"),
        host.alias("host"),
        service.alias("service"),
        instance.alias("instance"),
        null_s.alias("version"),
        F.lit("INFO").alias("level"),
        null_s.alias("threadName"),
        null_s.alias("loggerName"),
        null_s.alias("methodName"),
        null_s.alias("lineNumber"),
        message.alias("message"),
        F.unix_millis(ts).cast("string").alias("timestamp"),
        null_s.alias("exceptionClass"),
        F.lit(None).cast("array<string>").alias("thrownStackTrace"),
    ).where(F.col("timestamp").isNotNull())


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


# the term-indexed anomaly schema dimensions (SampleTrawl.java:70-83;
# AnomalySchemaConstants binds the same names)
ANOMALY_FIELDS = [
    "datacenter", "cluster", "host", "service", "instance", "version",
    "sampler", "metric", "bits", "tags", "type", "tenant",
]

# AnomalyMetric.java:6-19 -- the sampler's JSON wire shape
METRIC_SCHEMA = T.StructType(
    [
        T.StructField("datacenter", T.StringType()),
        T.StructField("cluster", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("service", T.StringType()),
        T.StructField("instance", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("tenant", T.StringType()),
        T.StructField("sampler", T.StringType()),
        T.StructField("path", T.ArrayType(T.StringType())),
        T.StructField("type", T.StringType()),
        T.StructField("value", T.LongType()),
        T.StructField("timestamp", T.StringType()),
    ]
)

_LONG_MIN = -(1 << 63)
_LONG_MAX = (1 << 63) - 1


def parse_metrics(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Decode a JSON metric feed into typed AnomalyMetric rows (the
    intake's JacksonSerializedDeliveryCallback, MiruAnomalyMain.java
    :169-175)."""
    v = F.col(value_col).cast("string")
    return df.withColumn("_m", F.from_json(v, METRIC_SCHEMA)).select(
        "_m.*"
    )


def anomaly_documents(metrics: DataFrame) -> DataFrame:
    """SampleTrawl.trawl as a projection: AnomalyMetric rows -> the
    document shape, indexable via
    `build_index(..., extra_fields=ANOMALY_FIELDS)`.

    Parity choices (SampleTrawl.java:32-86):
    - bits = sign term ("+" / "-") + one term per set bit of |value|;
      Long.MIN_VALUE magnitude clamps to Long.MAX_VALUE ("lossy, but
      sign flip would remain negative", line 54-57). Bit 63 of the
      magnitude is always clear, so 63 static bit tests cover the
      reference's 0..63 loop;
    - metric = path joined by '>'; tags = the path elements with
      null/empty entries dropped (sanitize:87-95);
    - every dimension gets the firstNonNull "unknown" default;
    - url is deterministic per (service, metric, ts, value) so replays
      stay idempotent (the reference mints an OrderId);
    - the raw value rides along store-only for oracle checks, like the
      nonIndexed fields of the other siphons."""
    v = F.col("value").cast("long")
    neg = v < 0
    mag = (
        F.when(v == F.lit(_LONG_MIN), F.lit(_LONG_MAX))
        .when(neg, -v)
        .otherwise(v)
    )
    sign = F.when(neg, F.lit("-")).otherwise(F.lit("+"))
    bit_terms = [
        F.when(mag.bitwiseAND(F.lit(1 << i)) != 0, F.lit(str(i)))
        for i in range(63)
    ]
    bits = F.concat(
        F.array(sign),
        F.filter(F.array(*bit_terms), lambda x: x.isNotNull()),
    )
    path = F.coalesce(F.col("path"), F.array().cast("array<string>"))
    tags = F.filter(
        path, lambda x: x.isNotNull() & (F.length(x) > 0)
    )
    metric_name = F.array_join(path, ">")
    ts_str = F.col("timestamp").cast("string")
    ts = F.when(
        ts_str.rlike("^[0-9]+$"),
        F.timestamp_millis(ts_str.cast("long")),
    ).otherwise(F.to_timestamp(ts_str))

    pairs = []
    for f in ANOMALY_FIELDS:
        pairs.append(F.lit(f))
        if f == "bits":
            pairs.append(bits)
        elif f == "tags":
            pairs.append(tags)
        elif f == "metric":
            pairs.append(
                F.array(
                    F.when(metric_name == "", F.lit("unknown")).otherwise(
                        metric_name
                    )
                )
            )
        else:
            pairs.append(F.array(_nonempty(f)))
    # timestamp is an indexed term in the reference activity too
    pairs.extend([F.lit("timestamp"), F.array(_nonempty("timestamp"))])

    return metrics.select(
        F.format_string(
            "anomaly://%s/%s/%s/%s",
            _nonempty("service"),
            F.when(metric_name == "", F.lit("unknown")).otherwise(
                metric_name
            ),
            ts_str,
            v.cast("string"),
        ).alias("url"),
        ts.alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.regexp_replace(
            F.coalesce(metric_name, F.lit("")), ">", " "
        ).alias("text"),
        F.lit("und").alias("lang"),
        F.create_map(*pairs).alias("fields"),
        v.alias("metric_value"),
    )


def trawled_counts(metrics: DataFrame) -> DataFrame:
    """SampleTrawl's `trawled` table (per-ServiceId ingressed tally,
    SampleTrawl.java:25,41-46) as one partial-aggregating groupBy."""
    sid = [
        _nonempty(c).alias(c)
        for c in (
            "datacenter", "cluster", "host", "service", "instance",
            "version",
        )
    ]
    return (
        metrics.select(*sid)
        .groupBy(
            "datacenter", "cluster", "host", "service", "instance",
            "version",
        )
        .agg(F.count("*").alias("ingressed"))
    )


def anomaly_sum(
    engine,
    query: str | None = None,
    bucket_seconds: int = 86400,
    time_range_us: tuple[int, int] | None = None,
    constraints=None,
    authz=None,
    segments: int | None = None,
) -> list[tuple]:
    """metricingSum over a bit-sliced `bits` field (Anomaly.java:
    Metrics.metricingSum's per-bit waveform reconstruction): per time
    bucket, sum = SUM over i of 2^i x (|matches AND bits:+ AND bits:i|
    - |matches AND bits:- AND bits:i|). Runs as TWO waveform_many
    batches (one per sign constraint, 63 keyed bit filters each) -- the
    bits postings decode once per batch and share one time-index pass,
    exactly like any other facet family. Returns
    [(bucket_start_us, sum)] ascending, empty buckets absent (dense
    when `segments` is set, matching waveform's dense mode)."""
    from .fields import compose
    from .queryparse import parse_query

    if isinstance(query, tuple):
        # pre-parsed filter tree (the wire adapter's MetricsQuery
        # filters are MiruFilter JSON, not query text): AND the bit
        # term in tree-side
        qs = {
            i: ("and", [("term", compose("bits", str(i))), query])
            for i in range(63)
        }
    else:
        qs = {
            i: (
                f"bits:{i}" if query is None
                else f"bits:{i} AND ({query})"
            )
            for i in range(63)
        }

    def sign_tree(sign):
        t = ("term", compose("bits", sign))
        if constraints is None:
            return t
        ct = (
            constraints
            if isinstance(constraints, tuple)
            else parse_query(constraints)
        )
        return ("and", [t, ct])

    out: dict[int, int] = {}
    for sign, mult in (("+", 1), ("-", -1)):
        wf = engine.waveform_many(
            qs,
            bucket_seconds=bucket_seconds,
            time_range_us=time_range_us,
            constraints=sign_tree(sign),
            authz=authz,
            segments=segments,
        )
        for i, series in wf.items():
            w = mult * (1 << i)
            for bucket, count in series:
                if count or segments:
                    out[bucket] = out.get(bucket, 0) + w * count
    return sorted(out.items())


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
