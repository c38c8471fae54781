"""SQL-oracle-checkable fulltext operators over the `documents` table.

These re-express the reference's fulltext/query-side semantics
(FullText.java, MiruAggregateUtil.java) as Catalyst-plannable DataFrame
pipelines over the driver-provided `documents` table (whitespace-tokenized
text), each paired with an ANSI-SQL oracle DuckDB can run. The real engine
(blocked postings + kernels) is exercised separately over webtext in
tests/; `ft_engine_bm25` below routes the *actual* engine through the same
DuckDB oracle.

Conventions for driver hash parity: every aggregate/computed column is
aliased identically in Spark and SQL; sums are cast to bigint; scores are
rounded to 4 decimals; top-k orders by (rounded score desc, doc_id asc).
BM25 uses k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _toks(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )


# -- ft_term_stats: per-term df + ctf (termstats table analog;
#    global cardinality at docId -1, LabFieldIndex.java:510-536) ----------

def ft_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks(_docs(spark, sf_dir))
    return toks.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df"),
        F.count("*").cast("long").alias("ctf"),
    )


FT_TERM_STATS_SQL = """
SELECT term,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ctf
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
GROUP BY term
"""


# -- BM25 top-k (FullText.collectTfIdf analog, upgraded to BM25) ----------

def _bm25_scores(spark, sf_dir, terms: list[str]) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = _toks(docs)
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    n_docs = docs.count()
    avgdl = dl.agg(F.avg("dl")).collect()[0][0]
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = idf * F.col("tf") * (K1 + 1.0) / (
        F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(float(avgdl)))
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg(
            F.sum("contrib").alias("raw_score"),
            F.count("*").cast("long").alias("nterms"),
        )
    )


def _bm25_sql(terms: list[str], conjunctive: bool, k: int) -> str:
    term_list = ", ".join(f"'{t}'" for t in terms)
    match_pred = f"WHERE nterms = {len(terms)}" if conjunctive else ""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN ({term_list}) GROUP BY doc_id, term
), stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS raw_score,
         CAST(count(*) AS BIGINT) AS nterms
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
), matched AS (SELECT doc_id, raw_score FROM scores {match_pred})
SELECT doc_id, round(raw_score, 4) AS score
FROM matched
ORDER BY round(raw_score, 4) DESC, doc_id ASC
LIMIT {k}
"""


_BM25_AND_TERMS = ["spark", "join"]
_BM25_OR_TERMS = ["window", "stream", "dup"]


def ft_bm25_and_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _bm25_scores(spark, sf_dir, _BM25_AND_TERMS)
    return (
        s.filter(F.col("nterms") == len(_BM25_AND_TERMS))
        .select("doc_id", F.round("raw_score", 4).alias("score"))
        .orderBy(F.desc(F.round(F.col("raw_score"), 4)), F.asc("doc_id"))
        .limit(10)
    )


FT_BM25_AND_SQL = _bm25_sql(_BM25_AND_TERMS, conjunctive=True, k=10)


def ft_bm25_or_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _bm25_scores(spark, sf_dir, _BM25_OR_TERMS)
    return (
        s.select("doc_id", F.round("raw_score", 4).alias("score"))
        .orderBy(F.desc(F.round(F.col("raw_score"), 4)), F.asc("doc_id"))
        .limit(10)
    )


FT_BM25_OR_SQL = _bm25_sql(_BM25_OR_TERMS, conjunctive=False, k=10)


# -- conjunctive / disjunctive match sets (filter compiler analog,
#    MiruAggregateUtil.filterInOut:1122-1202) ------------------------------

def ft_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks(_docs(spark, sf_dir)).distinct()
    a = toks.filter(F.col("term") == "spark").select("doc_id")
    b = toks.filter(F.col("term") == "merge").select("doc_id")
    out = a.join(b, "doc_id", "inner").join(
        _docs(spark, sf_dir).select("doc_id", "lang"), "doc_id"
    )
    return out.select("doc_id", "lang")


FT_CONJUNCTIVE_SQL = """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT d.doc_id, d.lang
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM toks WHERE term = 'spark')
  AND d.doc_id IN (SELECT doc_id FROM toks WHERE term = 'merge')
"""


def ft_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    terms = ["window", "stream", "dup"]
    toks = _toks(_docs(spark, sf_dir)).distinct()
    return (
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_matched"))
    )


FT_DISJUNCTIVE_SQL = """
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched
FROM (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
WHERE term IN ('window', 'stream', 'dup')
GROUP BY doc_id
"""


# -- prefix / wildcard expansion (MiruAggregateUtil.java:1154-1167) --------

def ft_prefix_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks(_docs(spark, sf_dir))
    return (
        toks.filter(F.col("term").startswith("s"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
    )


FT_PREFIX_EXPAND_SQL = """
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
WHERE term LIKE 's%'
GROUP BY term
"""


# -- the REAL engine routed through the SQL oracle -------------------------

_ENGINE_CACHE: dict = {}


def _close_cached_engines() -> None:
    """Release fds/threads held by cached engines (atexit: the cache is
    process-lifetime by design -- one engine per (session, sf_dir))."""
    for eng in _ENGINE_CACHE.values():
        try:
            eng.close()
        except Exception:
            pass
    _ENGINE_CACHE.clear()


import atexit as _atexit  # noqa: E402

_atexit.register(_close_cached_engines)


def _engine_for(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir) a real blocked-postings index over
    `documents` (lang forced to 'und' so the standard analyzer ==
    whitespace split on this corpus) and return a SearchEngine."""
    import tempfile

    from ..index.build import build_index
    from ..query.engine import SearchEngine

    key = (id(spark), sf_dir)
    if key in _ENGINE_CACHE:
        return _ENGINE_CACHE[key]
    docs = _docs(spark, sf_dir)
    wt = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("url"),
        F.timestamp_micros(
            F.lit(1704067200_000_000) + F.col("doc_id").cast("long") * 1_000_000
        ).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("und").alias("lang"),
        # deterministic access labels (MiruActivity.authz analog) so the
        # authz mask is DuckDB-recomputable: g{doc_id%3} + h{doc_id%5}
        F.array(
            F.format_string("g%d", F.col("doc_id") % 3),
            F.format_string("h%d", F.col("doc_id") % 5),
        ).alias("authz"),
        # schema-declared plugin fields (MiruSchema analog), all pure
        # functions of doc_id so DuckDB recomputes the reco/strut/
        # features/inbox answers: `parent` correlates with `user`
        # (each parent maps to <=2 users) so collaborative filtering
        # has real structure instead of an affine map that every user
        # covers
        F.create_map(
            F.lit("user"),
            F.array(F.format_string("u%02d", F.col("doc_id") % 13)),
            F.lit("item"),
            F.array(
                F.format_string("i%02d", (F.col("doc_id") * 3) % 11)
            ),
            F.lit("parent"),
            F.array(
                F.format_string(
                    "p%d",
                    (F.col("doc_id") % 13) * 3 + (F.col("doc_id") % 5),
                )
            ),
            F.lit("stream"),
            F.array((F.col("doc_id") % 4).cast("string")),
            # WIDE facet field: 5 tags per doc over a 1997-value space,
            # so sf0.01 (500 docs) carries >1024 distinct values --
            # the fixture that catches any wildcard-cap leak into facet
            # enumeration (Distincts.gatherDirect streams the whole
            # term range, Distincts.java:69-140)
            F.lit("tag"),
            F.array(
                *[
                    F.format_string(
                        "t%04d",
                        (F.col("doc_id") * 7 + F.lit(j) * 13) % 1997,
                    )
                    for j in range(5)
                ]
            ),
        ).alias("fields"),
    )
    index_dir = tempfile.mkdtemp(prefix="ft_engine_idx_")
    build_index(
        spark,
        wt,
        index_dir,
        partition_seconds=10**9,
        block_span=64,
        shuffle_partitions=max(8, spark.sparkContext.defaultParallelism),
        extra_fields=["user", "item", "parent", "stream", "tag"],
    )
    eng = SearchEngine(spark, index_dir)
    _ENGINE_CACHE[key] = eng
    return eng


def _engine_result(eng_df: DataFrame) -> DataFrame:
    return eng_df.select(
        F.col("doc_id"),
        F.round("score", 4).alias("score"),
    ).orderBy(F.desc(F.round(F.col("score"), 4)), F.asc("doc_id"))


def ft_engine_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BM25 kernel, conjunctive query; DuckDB recomputes BM25
    in plain SQL. Gates the actual engine, not a SQL re-expression."""
    return _engine_result(
        _engine_for(spark, sf_dir).search("spark AND join", k=10)
    )


def ft_engine_bm25_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BM25 kernel, disjunctive query (block-max WAND path)."""
    return _engine_result(
        _engine_for(spark, sf_dir).search(
            "window OR stream OR dup", k=10
        )
    )


FT_ENGINE_BM25_SQL = FT_BM25_AND_SQL
FT_ENGINE_BM25_OR_SQL = FT_BM25_OR_SQL


def ft_engine_waveform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytics waveform through the REAL engine: per-600s-bucket
    counts of docs matching 'spark AND join', computed from the inverted
    index + 't' time rows (Analytics.java:164-183 semantics -- the
    constrained filter AND per-bucket time bitmaps). The engine index
    stamps doc_id seconds onto a fixed epoch (see _engine_for), so DuckDB
    recomputes the buckets straight from doc_id."""
    eng = _engine_for(spark, sf_dir)
    wf = eng.waveform("spark AND join", bucket_seconds=600)
    return spark.createDataFrame(
        [(int(b), int(c)) for b, c in wf], "bucket_us long, cnt long"
    ).orderBy("bucket_us")


FT_ENGINE_WAVEFORM_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), m AS (
  SELECT doc_id FROM toks
  WHERE list_contains(ts, 'spark') AND list_contains(ts, 'join')
)
SELECT ((1704067200000000 + doc_id * 1000000) // 600000000) * 600000000
         AS bucket_us,
       CAST(count(*) AS BIGINT) AS cnt
FROM m GROUP BY bucket_us ORDER BY bucket_us
"""


def ft_numeric_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-range filter through the REAL engine: `doclen:[5 TO 40]`
    expands to an order-preserving encoded term-dictionary range scan
    (MiruTermComposer.java:130-141,202-211 rawRange; numeric `obj` field
    shape of MiruFullTextNGTest.java:52-73), ANDed with a scored text
    term. DuckDB recomputes it as a length filter over BM25."""
    return _engine_result(
        _engine_for(spark, sf_dir).search("doclen:[5 TO 40] AND spark", k=10)
    )


FT_NUMERIC_RANGE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN ('spark') GROUP BY doc_id, term
), stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS raw_score
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT s.doc_id, round(s.raw_score, 4) AS score
FROM scores s JOIN dl USING (doc_id)
WHERE dl.dl BETWEEN 5 AND 40
ORDER BY round(s.raw_score, 4) DESC, s.doc_id ASC
LIMIT 10
"""


def ft_engine_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negation (pButNotQ) through the REAL engine: `spark AND NOT join`
    scores BM25 on the positive term only and masks out every doc
    containing the negated term (MiruFilterOperation.pButNotQ,
    LuceneBackedQueryParser MUST_NOT clauses -> andNot). Exercises the
    kernel's block-max pruning with a negative clause present: block
    upper bounds come from scoring (positive) terms only, and negation
    can only REMOVE docs, so pruning stays admissible. DuckDB recomputes
    it as single-term BM25 with a NOT IN anti-filter."""
    return _engine_result(
        _engine_for(spark, sf_dir).search("spark AND NOT join", k=10)
    )


FT_ENGINE_NOT_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN ('spark') GROUP BY doc_id, term
), stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS raw_score
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(raw_score, 4) AS score
FROM scores
WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM toks WHERE term = 'join')
ORDER BY round(raw_score, 4) DESC, doc_id ASC
LIMIT 10
"""


def ft_engine_authz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authz + constraints through the REAL engine: the parsed query ANDs
    with a constraints filter and the composite authz mask -- OR over the
    granted labels' per-value postings -- exactly the reference's fulltext
    question composition (FullTextCustomQuestion.java:91-107,
    MiruAuthzUtils.getCompositeAuthz:24-33). The engine corpus carries
    labels g{doc_id%3}/h{doc_id%5} (see _engine_for), so DuckDB recomputes
    the mask as modulo predicates over single-term BM25."""
    return _engine_result(
        _engine_for(spark, sf_dir).search(
            "spark", k=10,
            constraints="doclen:[5 TO 60]",
            authz=["g1", "h4"],
        )
    )


FT_ENGINE_AUTHZ_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN ('spark') GROUP BY doc_id, term
), stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS raw_score
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT s.doc_id, round(s.raw_score, 4) AS score
FROM scores s JOIN dl USING (doc_id)
WHERE dl.dl BETWEEN 5 AND 60
  AND (s.doc_id % 3 = 1 OR s.doc_id % 5 = 4)
ORDER BY round(s.raw_score, 4) DESC, s.doc_id ASC
LIMIT 10
"""


# The engine corpus (see _engine_for) stamps warc_ts = 2024-01-01 +
# doc_id seconds, so a [base+100s, base+300s] range is docIDs 100..300.
_TR_BASE_US = 1704067200_000_000
_TR_LO, _TR_HI = 100, 300


def ft_engine_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME strategy through the REAL engine: newest-10 among the docs
    matching a conjunctive filter (FullTextQuery.Strategy.TIME,
    FullText.collectTime:222-251 -- descending docID iterator over the
    answer bitmap). The engine corpus mints docIDs in warc order with a
    single time partition, so newest == highest doc_id; DuckDB recomputes
    it as a membership filter ORDER BY doc_id DESC."""
    eng = _engine_for(spark, sf_dir)
    return eng.newest(k=10, query="spark AND join").select(
        "doc_id", F.lit(0.0).alias("score")
    ).orderBy(F.desc("doc_id"))


FT_ENGINE_NEWEST_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), m AS (
  SELECT doc_id FROM toks WHERE term = 'spark'
  INTERSECT
  SELECT doc_id FROM toks WHERE term = 'join'
)
SELECT doc_id, 0.0 AS score FROM m ORDER BY doc_id DESC LIMIT 10
"""



def ft_engine_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range-bounded BM25 through the REAL engine: `buildTimeRangeMask`
    (MiruTimeIndex getClosestId / smallestExclusiveTimestampIndex,
    miru-service/.../index/lab/LabTimeIndex.java:191-208) resolved
    kernel-side from the per-block time-index rows, one Spark job.
    DuckDB recomputes it as a doc_id BETWEEN filter (docIDs are minted
    in warc_ts order, one per second)."""
    return _engine_result(
        _engine_for(spark, sf_dir).search(
            "spark",
            k=10,
            time_range_us=(
                _TR_BASE_US + _TR_LO * 1_000_000,
                _TR_BASE_US + _TR_HI * 1_000_000,
            ),
        )
    )


FT_ENGINE_TIME_RANGE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE term IN ('spark') GROUP BY doc_id, term
), stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
         (SELECT avg(dl) FROM dl) AS avgdl
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf * {K1 + 1.0}
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / stats.avgdl)) ) AS raw_score
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(raw_score, 4) AS score
FROM scores
WHERE doc_id BETWEEN {_TR_LO} AND {_TR_HI}
ORDER BY round(raw_score, 4) DESC, doc_id ASC
LIMIT 10
"""


# -- the reco plugin family through the REAL engine (featureops.py):
#    gatherFeatures / collaborative filtering / strut / inbox, each
#    DuckDB-recomputable because every plugin field is a pure function
#    of doc_id (see _engine_for). -----------------------------------------


def ft_engine_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gatherFeatures through the engine: (user, item) value-tuple
    doc-co-occurrence counts over the docs matching 'spark'
    (MiruAggregateUtil.gatherFeatures:77-291 counting core)."""
    rows = _engine_for(spark, sf_dir).gather_features(
        ("user", "item"), query="spark"
    )
    return spark.createDataFrame(
        [(u, i, int(c)) for (u, i), c in rows],
        "user_v string, item_v string, cnt long",
    )


FT_ENGINE_FEATURES_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), m AS (
  SELECT doc_id FROM toks WHERE list_contains(ts, 'spark')
)
SELECT printf('u%02d', doc_id % 13) AS user_v,
       printf('i%02d', (doc_id * 3) % 11) AS item_v,
       CAST(count(*) AS BIGINT) AS cnt
FROM m GROUP BY 1, 2
"""


def ft_engine_reco(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collaborative filtering through the engine: the 3-hop walk of
    CollaborativeFiltering.java:75-213 for user u03 over the composed
    parent/user fields; score = sum of contributor weights."""
    rows = _engine_for(spark, sf_dir).reco(
        ("user", "u03"), "parent", "user", "parent", k=10
    )
    return spark.createDataFrame(
        [(v, int(s)) for v, s in rows], "value string, score long"
    )


FT_ENGINE_RECO_SQL = """
WITH docs AS (
  SELECT doc_id, doc_id % 13 AS u,
         (doc_id % 13) * 3 + (doc_id % 5) AS p
  FROM documents
), parents AS (
  SELECT DISTINCT p FROM docs WHERE u = 3
), contributors AS (
  SELECT u, CAST(count(*) AS BIGINT) AS w FROM docs
  WHERE u <> 3 AND p IN (SELECT p FROM parents)
  GROUP BY u ORDER BY w DESC, u ASC LIMIT 10
), cand AS (
  SELECT DISTINCT c.u, d.p, c.w
  FROM docs d JOIN contributors c ON d.u = c.u
  WHERE d.p NOT IN (SELECT p FROM parents)
)
SELECT printf('p%d', p) AS value, CAST(sum(w) AS BIGINT) AS score
FROM cand GROUP BY p
ORDER BY score DESC, value ASC LIMIT 10
"""


def _strut_model(fi: int, vals: tuple) -> float:
    # deterministic stand-in for the catwalk model table: feature 0
    # (user) scores (u%5)/7, feature 1 (item) scores (i%4)/3
    n = int(vals[0][1:])
    return (n % 5) / 7.0 if fi == 0 else (n % 4) / 3.0


def ft_engine_strut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strut through the engine (Strut.java:82-236): candidates =
    parent values, features = user (scalar 1.0) + item (scalar 0.5),
    UNIT_WEIGHTED finalize; model scores recomputed by DuckDB."""
    rows = _engine_for(spark, sf_dir).strut(
        "parent",
        [(1.0, "user"), (0.5, "item")],
        model=_strut_model,
        k=10,
    )
    return spark.createDataFrame(
        [(v, round(float(s), 6)) for v, s in rows],
        "value string, score double",
    )


FT_ENGINE_STRUT_SQL = """
WITH docs AS (
  SELECT doc_id % 13 AS u, (doc_id * 3) % 11 AS i,
         (doc_id % 13) * 3 + (doc_id % 5) AS p
  FROM documents
), f0 AS (
  SELECT p, max((u % 5) / 7.0) AS s0
  FROM (SELECT DISTINCT p, u FROM docs) GROUP BY p
), f1 AS (
  SELECT p, max(0.5 * (i % 4) / 3.0) AS s1
  FROM (SELECT DISTINCT p, i FROM docs) GROUP BY p
), s AS (
  SELECT f0.p, (coalesce(s0, 0) + coalesce(s1, 0)) / 2 AS sc
  FROM f0 LEFT JOIN f1 ON f0.p = f1.p
)
SELECT printf('p%d', p) AS value, round(sc, 6) AS score
FROM s WHERE sc > 0
ORDER BY round(sc, 6) DESC, value ASC LIMIT 10
"""


def ft_engine_inbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inbox stream page through the engine
    (AggregateCountsInboxQuestion + backfillerizer unread rules):
    stream '2', newest-first item page with counts + unread flags;
    even items were read at the mid-corpus cutoff, so items whose
    newest activity predates it show read."""
    eng = _engine_for(spark, sf_dir)
    n_docs = eng.n_docs
    cutoff = 1704067200_000_000 + (n_docs // 2) * 1_000_000
    reads = [
        {"item": f"i{i:02d}", "op": "read", "ts": cutoff, "seq": i}
        for i in range(0, 11, 2)
    ]
    page = eng.inbox("2", count=10, read_state=reads)["page"]
    return spark.createDataFrame(
        [
            (r["value"], int(r["count"]), int(r["warc_us"]),
             int(r["unread"]))
            for r in page
        ],
        "value string, cnt long, warc_us long, unread int",
    )


FT_ENGINE_INBOX_SQL = """
WITH n AS (
  SELECT CAST(count(*) AS BIGINT) AS nd FROM documents
), s AS (
  SELECT printf('i%02d', (doc_id * 3) % 11) AS item,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(max(1704067200000000 + doc_id * 1000000) AS BIGINT)
           AS last_act
  FROM documents WHERE doc_id % 4 = 2 GROUP BY 1
), marks AS (
  SELECT item,
         1704067200000000 + (SELECT nd FROM n) // 2 * 1000000 AS read_ts
  FROM s WHERE CAST(substr(item, 2) AS INT) % 2 = 0
)
SELECT s.item AS value, cnt, last_act AS warc_us,
       CAST(CASE WHEN m.item IS NULL THEN 1
                 WHEN last_act > m.read_ts THEN 1 ELSE 0 END AS INT)
         AS unread
FROM s LEFT JOIN marks m ON s.item = m.item
ORDER BY warc_us DESC, value ASC LIMIT 10
"""


def ft_engine_stumptown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stumptown (log-aggregation plugin) through the REAL engine: the
    per-600s-bucket waveform AND the newest-5 matching docs from ONE
    pass over the match set (Stumptown.stumptowning, Stumptown.java:
    37-73). Emitted as tagged rows so one DataFrame carries both
    answers: ('wf', bucket_start_us, count) + ('doc', warc_us, doc_id).
    DuckDB recomputes both from doc_id (the index stamps doc_id seconds
    onto a fixed epoch, see _engine_for)."""
    eng = _engine_for(spark, sf_dir)
    st = eng.stumptown("spark AND join", bucket_seconds=600, k=5)
    rows = [
        ("wf", int(b), int(c)) for b, c in st["waveform"]
    ] + [
        ("doc", int(w), int(d)) for _u, w, _p, d in st["results"]
    ]
    return spark.createDataFrame(
        rows, "kind string, key_us long, val long"
    ).orderBy("kind", "key_us")


FT_ENGINE_STUMPTOWN_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
), m AS (
  SELECT doc_id FROM toks
  WHERE list_contains(ts, 'spark') AND list_contains(ts, 'join')
)
SELECT kind, key_us, val FROM (
  SELECT 'wf' AS kind,
         ((1704067200000000 + doc_id * 1000000) // 600000000)
           * 600000000 AS key_us,
         CAST(count(*) AS BIGINT) AS val
  FROM m GROUP BY key_us
  UNION ALL
  SELECT * FROM (
    SELECT 'doc' AS kind,
           1704067200000000 + doc_id * 1000000 AS key_us,
           CAST(doc_id AS BIGINT) AS val
    FROM m ORDER BY doc_id DESC LIMIT 5
  )
) ORDER BY kind, key_us
"""


def ft_engine_distincts_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet distincts over a field with >1024 distinct values through
    the REAL engine's DISTRIBUTED route (the streamed facet_prefixes
    kernel mode -- no driver-side value list, no wildcard cap). The
    engine corpus's `tag` field carries 5 values per doc over a
    1997-value space (see _engine_for), so sf0.01 exceeds the old
    MAX_WILDCARD_EXPANSION=1024 by ~400 values: a capped enumeration
    CANNOT match this oracle. Reference semantics: Distincts
    gatherDirect streams the field's whole term range
    (miru-reco-plugins/.../distincts/Distincts.java:69-140). DuckDB
    recomputes the per-tag match counts from the same doc_id formula."""
    eng = _engine_for(spark, sf_dir)
    rows = eng.distincts("tag", "spark", local=False)
    return spark.createDataFrame(
        [(v, int(c)) for v, c in rows], "value string, cnt long"
    ).orderBy(F.desc("cnt"), F.asc("value"))


FT_ENGINE_DISTINCTS_WIDE_SQL = """
WITH m AS (
  SELECT doc_id FROM documents
  WHERE list_contains(string_split(text, ' '), 'spark')
), tags AS (
  SELECT m.doc_id,
         printf('t%04d', (m.doc_id * 7 + j.j * 13) % 1997) AS value
  FROM m CROSS JOIN (SELECT unnest(range(5)) AS j) j
)
SELECT value, CAST(count(DISTINCT doc_id) AS BIGINT) AS cnt
FROM tags GROUP BY value
ORDER BY cnt DESC, value ASC
"""


QUERIES = {
    "ft_term_stats": (ft_term_stats, FT_TERM_STATS_SQL),
    # ft_bm25_and_topk retired r5 (50-entry cap): its conjunctive BM25
    # semantics are driver-gated by ft_engine_bm25 (the REAL engine's
    # AND path); the SQL re-expression stays pytest-gated in
    # tests/test_entry_oracle.py. Its slot now gates the wide-facet
    # streamed distincts path (the r4 verdict's flagged flaw).
    "ft_engine_distincts_wide": (
        ft_engine_distincts_wide, FT_ENGINE_DISTINCTS_WIDE_SQL),
    "ft_bm25_or_topk": (ft_bm25_or_topk, FT_BM25_OR_SQL),
    "ft_conjunctive": (ft_conjunctive, FT_CONJUNCTIVE_SQL),
    # ft_disjunctive retired from the driver registry (50-entry cap):
    # its semantics are driver-gated by ft_engine_bm25_or (the REAL
    # engine's OR path); the SQL re-expression stays pytest-gated in
    # tests/test_entry_oracle.py. Its slot now gates the engine's
    # analytics waveform.
    "ft_engine_waveform": (ft_engine_waveform, FT_ENGINE_WAVEFORM_SQL),
    "ft_prefix_expand": (ft_prefix_expand, FT_PREFIX_EXPAND_SQL),
    "ft_engine_bm25": (ft_engine_bm25, FT_ENGINE_BM25_SQL),
    "ft_engine_bm25_or": (ft_engine_bm25_or, FT_ENGINE_BM25_OR_SQL),
    "ft_numeric_range": (ft_numeric_range, FT_NUMERIC_RANGE_SQL),
    "ft_engine_not": (ft_engine_not, FT_ENGINE_NOT_SQL),
    "ft_engine_newest": (ft_engine_newest, FT_ENGINE_NEWEST_SQL),
    "ft_engine_time_range": (ft_engine_time_range, FT_ENGINE_TIME_RANGE_SQL),
    "ft_engine_authz": (ft_engine_authz, FT_ENGINE_AUTHZ_SQL),
    # r4: the reco plugin family through the REAL engine. Their slots
    # come from the retired event-table re-expressions
    # (ev_gather_features / ev_strut_score / ev_reco_cofilter /
    # ev_inbox_aggregate_counts), which stay pytest-gated in
    # tests/test_entry_oracle.py.
    "ft_engine_features": (ft_engine_features, FT_ENGINE_FEATURES_SQL),
    "ft_engine_reco": (ft_engine_reco, FT_ENGINE_RECO_SQL),
    "ft_engine_strut": (ft_engine_strut, FT_ENGINE_STRUT_SQL),
    "ft_engine_inbox": (ft_engine_inbox, FT_ENGINE_INBOX_SQL),
    # r4 (late): stumptown through the REAL engine -- its slot comes
    # from the retired event-table ev_anomaly_newest (pytest-gated in
    # tests/test_entry_oracle.py).
    "ft_engine_stumptown": (ft_engine_stumptown, FT_ENGINE_STUMPTOWN_SQL),
}
