"""Deduplication operators over the `documents` table.

Large-scale training-data pipeline dedup family: exact (hash-groupBy),
MinHash signatures + LSH candidate pairs, SimHash, n-gram Jaccard. Every
hash is built from *portable integer arithmetic over dense token codes*
(dense rank of the token in the sorted term dictionary), so the DuckDB
oracle reproduces the exact same signatures -- no engine-specific hash
functions.

Scale notes: token-code assignment is a broadcast dictionary join; MinHash
is one explode + groupBy(doc, hash_id) min; LSH bucketing groups by
(hash_id, minhash) -- at web scale bucket skew is capped by banding and by
salting hot buckets, and candidate verification stays within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_HASHES = 8
_P = 1009
# deterministic hash params (hid, a, b)
HASH_PARAMS = [(i, 13 + 8 * i, 7 + 3 * i) for i in range(N_HASHES)]
SIM_BITS = 16
_SIM_MULT = 2654435761  # Knuth multiplicative constant
_SIM_MOD = 65536


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _toks(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))


def _codes(toks: DataFrame) -> DataFrame:
    """Dense token codes: rank in the sorted distinct-term dictionary."""
    w = Window.orderBy("term")
    return toks.select("term").distinct().withColumn(
        "code", F.row_number().over(w).cast("long")
    )


_CODES_SQL = """
codes AS (
  SELECT term, CAST(row_number() OVER (ORDER BY term) AS BIGINT) AS code
  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS term FROM documents)
)"""

_TOKS_SQL = """
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)"""


# -- exact dedup: hash-groupBy, canonical = min doc_id ---------------------

def dd_exact(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.groupBy(F.md5(F.col("text")).alias("text_md5")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count("*").cast("long").alias("n_docs"),
    )


DD_EXACT_SQL = """
SELECT md5(text) AS text_md5,
       min(doc_id) AS canonical_doc_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY md5(text)
"""


# -- MinHash signatures: min over contained token codes of (a*c+b) mod p --

def dd_minhash_sig(spark, sf_dir):
    toks = _toks(_docs(spark, sf_dir)).distinct()
    codes = _codes(toks)
    params = spark.createDataFrame(HASH_PARAMS, "hid int, a long, b long")
    return (
        toks.join(F.broadcast(codes), "term")
        .crossJoin(F.broadcast(params))
        .groupBy("doc_id", "hid")
        .agg(
            F.min((F.col("a") * F.col("code") + F.col("b")) % _P)
            .cast("long")
            .alias("minhash")
        )
    )


_PARAMS_SQL = "params(hid, a, b) AS (VALUES " + ", ".join(
    f"({h}, {a}, {b})" for h, a, b in HASH_PARAMS
) + ")"

DD_MINHASH_SIG_SQL = f"""
WITH {_TOKS_SQL.strip()}, {_CODES_SQL.strip()}, {_PARAMS_SQL}
SELECT t.doc_id, p.hid,
       CAST(min((p.a * c.code + p.b) % {_P}) AS BIGINT) AS minhash
FROM (SELECT DISTINCT doc_id, term FROM toks) t
JOIN codes c USING (term) CROSS JOIN params p
GROUP BY t.doc_id, p.hid
"""


# -- MinHash LSH candidate pairs: bucket-join on (hid, minhash), estimate
#    Jaccard as fraction of agreeing hashes --------------------------------

def dd_minhash_pairs(spark, sf_dir):
    sig = dd_minhash_sig(spark, sf_dir)
    a = sig.alias("a")
    b = sig.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.hid") == F.col("b.hid"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg((F.count("*") / F.lit(float(N_HASHES))).alias("est_raw"))
    )
    return (
        pairs.filter(F.col("est_raw") >= 0.5)
        .select("doc_a", "doc_b", F.round("est_raw", 4).alias("est_jaccard"))
    )


DD_MINHASH_PAIRS_SQL = f"""
WITH {_TOKS_SQL.strip()}, {_CODES_SQL.strip()}, {_PARAMS_SQL},
sig AS (
  SELECT t.doc_id, p.hid,
         CAST(min((p.a * c.code + p.b) % {_P}) AS BIGINT) AS minhash
  FROM (SELECT DISTINCT doc_id, term FROM toks) t
  JOIN codes c USING (term) CROSS JOIN params p
  GROUP BY t.doc_id, p.hid
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(count(*) / {float(N_HASHES)}, 4) AS est_jaccard
FROM sig a JOIN sig b
  ON a.hid = b.hid AND a.minhash = b.minhash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) / {float(N_HASHES)} >= 0.5
"""


# -- SimHash: sign of tf-weighted bit votes over hashed token codes --------

def dd_simhash(spark, sf_dir):
    toks = _toks(_docs(spark, sf_dir))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    codes = _codes(toks)
    bits = spark.createDataFrame([(j,) for j in range(SIM_BITS)], "j int")
    joined = (
        tf.join(F.broadcast(codes), "term")
        .withColumn("h", ((F.col("code") * _SIM_MULT) % _SIM_MOD).cast("long"))
        .crossJoin(F.broadcast(bits))
        .withColumn(
            # (h >> j) & 1 via exact power-of-two division (shiftright
            # needs a literal shift amount in the DataFrame API)
            "bit",
            (F.col("h") / F.pow(F.lit(2.0), F.col("j").cast("double")))
            .cast("long")
            % 2,
        )
        .withColumn("vote", F.col("tf") * (F.col("bit") * 2 - 1))
    )
    votes = joined.groupBy("doc_id", "j").agg(F.sum("vote").alias("v"))
    return (
        votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("v") > 0, F.pow(F.lit(2.0), F.col("j"))).otherwise(
                    0.0
                )
            )
            .cast("long")
            .alias("simhash")
        )
    )


DD_SIMHASH_SQL = f"""
WITH {_TOKS_SQL.strip()}, {_CODES_SQL.strip()},
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, term
),
bits(j) AS (SELECT * FROM range(0, {SIM_BITS})),
votes AS (
  SELECT tf.doc_id, bits.j,
         sum(tf.tf * ((((c.code * {_SIM_MULT}) % {_SIM_MOD}) >> bits.j & 1) * 2 - 1)) AS v
  FROM tf JOIN codes c USING (term) CROSS JOIN bits
  GROUP BY tf.doc_id, bits.j
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN power(2.0, j) ELSE 0.0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""


# -- n-gram (3-token shingle) Jaccard over candidate pairs -----------------

def dd_ngram_jaccard(spark, sf_dir):
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    shingles = (
        toks.withColumn("t2", F.lead("term", 1).over(w))
        .withColumn("t3", F.lead("term", 2).over(w))
        .filter(F.col("t3").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", "term", "t2", "t3").alias("shingle"),
        )
        .distinct()
    )
    sizes = shingles.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("sz")
    )
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("inter"))
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b")
    jac = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jac_raw",
            F.col("inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
    )
    return (
        jac.filter(F.col("jac_raw") >= 0.2)
        .select("doc_a", "doc_b", F.round("jac_raw", 4).alias("jaccard"))
    )


DD_NGRAM_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS shingle
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), shingles AS (
  SELECT doc_id, shingle FROM sh WHERE shingle IS NOT NULL
), sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM shingles GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS inter
  FROM shingles a JOIN shingles b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b,
       round(i.inter / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.inter / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) >= 0.2
"""


QUERIES = {
    "dd_exact": (dd_exact, DD_EXACT_SQL),
    "dd_minhash_sig": (dd_minhash_sig, DD_MINHASH_SIG_SQL),
    "dd_minhash_pairs": (dd_minhash_pairs, DD_MINHASH_PAIRS_SQL),
    "dd_simhash": (dd_simhash, DD_SIMHASH_SQL),
    "dd_ngram_jaccard": (dd_ngram_jaccard, DD_NGRAM_JACCARD_SQL),
}
