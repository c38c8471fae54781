"""Deduplication operators over the `documents` table.

Large-scale training-data pipeline dedup family: exact (hash-groupBy),
MinHash over 3-token shingles + banded-LSH candidate pairs, SimHash,
n-gram Jaccard. Every hash is *portable integer arithmetic over
md5-derived values* -- `H(s) = int(md5(s)[:14 hex], 16)` computes
identically in Spark (`conv(substring(md5(s),1,14),16,10)`) and DuckDB
(`CAST('0x'||substr(md5(s),1,14) AS BIGINT)`), so the oracle reproduces
the exact signatures with no engine-specific hash functions and no
global term-dictionary rank (a global dense rank would serialize into one
window task at web scale; md5 is embarrassingly parallel).

Scale notes: shingling runs as array higher-order functions on each row
(zero shuffles); MinHash computes all 8 minima in one map-side-combinable
aggregation (no xN_HASHES row explosion through the shuffle); LSH banding
(4 bands x 2 rows) buckets by the band key so candidate generation touches
only same-bucket pairs, and signature verification runs per candidate
pair -- never all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_HASHES = 8
BAND_ROWS = 2  # 4 bands x 2 rows
_P = 1_000_000_007
# deterministic hash params (hid, a, b); a*H < 70e9 stays in int64
HASH_PARAMS = [(i, 13 + 8 * i, 7 + 3 * i) for i in range(N_HASHES)]
SIM_BITS = 16
_SIM_MOD = 65536


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _toks(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))


def _md5i(col):
    """Portable md5-derived int in [0, 2^56): same value in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


def _md5i_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 14)) AS BIGINT)"


def _shingles(docs: DataFrame) -> DataFrame:
    """Distinct 3-token shingles per doc, built with array higher-order
    functions on the row itself -- zero shuffles (no explode+window, no
    global distinct), which is what survives a 100TB corpus."""
    # zip_with evaluates each argument array ONCE per row and pairs
    # elements positionally; a transform whose lambda does F.get(arr, i+k)
    # would instead re-evaluate the outer split() per element -- O(tokens^2)
    # per document.  F.concat (not concat_ws) so a null from zip_with's
    # tail padding nulls the whole shingle, which the filter then drops.
    arr = F.split(F.col("text"), " ")
    n = F.size(arr)
    pair = F.zip_with(
        arr, F.slice(arr, 2, n), lambda x, y: F.concat(x, F.lit(" "), y)
    )
    sh = F.filter(
        F.zip_with(
            pair, F.slice(arr, 3, n), lambda xy, z: F.concat(xy, F.lit(" "), z)
        ),
        lambda s: s.isNotNull(),
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("shingle")
    )


_TOKS_SQL = """
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)"""

_SHINGLES_SQL = """
postoks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id,
         term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w AS shingle
  FROM postoks
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), shingles AS (
  SELECT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL
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


# -- MinHash signatures: min over shingle hashes of (a*H+b) mod p ----------

def dd_minhash_sig(spark, sf_dir):
    sh = _shingles(_docs(spark, sf_dir)).withColumn(
        "hv", _md5i(F.col("shingle")) % _P
    )
    # all 8 minima in ONE map-side-combinable aggregation (no x8 row
    # explosion through the shuffle), then unpivot to (doc_id, hid, minhash)
    wide = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("hv") + F.lit(b)) % _P)
            .cast("long")
            .alias(f"mh{h}")
            for h, a, b in HASH_PARAMS
        ]
    )
    stack_expr = f"stack({N_HASHES}, " + ", ".join(
        f"{h}, mh{h}" for h, _a, _b in HASH_PARAMS
    ) + ") as (hid, minhash)"
    return wide.select("doc_id", F.expr(stack_expr))


_PARAMS_SQL = "params(hid, a, b) AS (VALUES " + ", ".join(
    f"({h}, {a}, {b})" for h, a, b in HASH_PARAMS
) + ")"

_SIG_SQL_BODY = f"""
sig AS (
  SELECT s.doc_id, p.hid,
         CAST(min((p.a * ({_md5i_sql('s.shingle')} % {_P}) + p.b) % {_P}) AS BIGINT)
           AS minhash
  FROM shingles s CROSS JOIN params p
  GROUP BY s.doc_id, p.hid
)"""

DD_MINHASH_SIG_SQL = f"""
WITH {_SHINGLES_SQL.strip()}, {_PARAMS_SQL}, {_SIG_SQL_BODY.strip()}
SELECT doc_id, hid, minhash FROM sig
"""


# -- MinHash banded LSH: candidates share a full band (BAND_ROWS consecutive
#    minhashes), then signature agreement estimates Jaccard per candidate --

def _lsh_candidates(sig: DataFrame) -> DataFrame:
    """Banded-LSH candidate pairs from a (doc_id, hid, minhash) signature
    frame: bucket by (band, band-key), pair only within buckets -- the
    candidate set is bounded by bucket sizes, never all-pairs."""
    bands = (
        sig.withColumn("band", (F.col("hid") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("hid", "minhash"))),
                    lambda x: x["minhash"].cast("string"),
                ),
                ",",
            ).alias("bkey")
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


_CAND_SQL = f"""
bands AS (
  SELECT doc_id, hid // {BAND_ROWS} AS band,
         string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY hid) AS bkey
  FROM sig GROUP BY doc_id, hid // {BAND_ROWS}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)"""


def dd_minhash_pairs(spark, sf_dir):
    sig = dd_minhash_sig(spark, sf_dir).persist()
    cand = _lsh_candidates(sig)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), "hid", F.col("minhash").alias("mh_a")
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), "hid", F.col("minhash").alias("mh_b")
    )
    est = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "hid"])
        .groupBy("doc_a", "doc_b")
        .agg(
            (
                F.sum((F.col("mh_a") == F.col("mh_b")).cast("long"))
                / F.lit(float(N_HASHES))
            ).alias("est_raw")
        )
    )
    return est.filter(F.col("est_raw") >= 0.25).select(
        "doc_a", "doc_b", F.round("est_raw", 4).alias("est_jaccard")
    )


DD_MINHASH_PAIRS_SQL = f"""
WITH {_SHINGLES_SQL.strip()}, {_PARAMS_SQL}, {_SIG_SQL_BODY.strip()},
{_CAND_SQL.strip()}, est AS (
  SELECT c.doc_a, c.doc_b,
         sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
           / {float(N_HASHES)} AS est_raw
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.hid = sa.hid
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, round(est_raw, 4) AS est_jaccard
FROM est WHERE est_raw >= 0.25
"""


# -- SimHash: sign of tf-weighted bit votes over hashed token codes --------

def dd_simhash(spark, sf_dir):
    """All SIM_BITS bit votes in ONE pass: per (doc, term, tf) row, each
    bit j contributes tf * (bit(h, j) * 2 - 1), summed as SIM_BITS
    parallel aggregate columns in a single map-side-combinable groupBy.
    No row multiplication anywhere (the r2 version crossJoined a 16-row
    bit table, shuffling 16x the (doc, term) relation -- at 10^12 rows
    that is 16x avoidable shuffle volume)."""
    toks = _toks(_docs(spark, sf_dir))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    tfh = tf.withColumn("h", _md5i(F.col("term")) % _SIM_MOD)
    votes = tfh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.col("tf")
                * (
                    F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2
                    - 1
                )
            ).alias(f"v{j}")
            for j in range(SIM_BITS)
        ]
    )
    sim = None
    for j in range(SIM_BITS):
        term_j = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term_j if sim is None else sim + term_j
    return votes.select(
        "doc_id", sim.cast("long").alias("simhash")
    )


DD_SIMHASH_SQL = f"""
WITH {_TOKS_SQL.strip()},
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, term
),
bits(j) AS (SELECT * FROM range(0, {SIM_BITS})),
votes AS (
  SELECT tf.doc_id, bits.j,
         sum(tf.tf * ((({_md5i_sql('tf.term')} % {_SIM_MOD}) >> bits.j & 1) * 2 - 1)) AS v
  FROM tf CROSS JOIN bits
  GROUP BY tf.doc_id, bits.j
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN power(2.0, j) ELSE 0.0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""


# -- n-gram (3-token shingle) Jaccard: EXACT verify over LSH candidates ----

def dd_ngram_jaccard(spark, sf_dir):
    """Exact shingle-Jaccard verification over the banded-LSH candidate
    pairs. Candidate generation is the same bucketed band join as
    dd_minhash_pairs -- NEVER an unbanded shingle self-equi-join, whose
    head-shingle m-doc bucket would explode to m^2 join rows at a 100 TB
    corpus. The verify join is bounded by |candidates| x shingles-per-doc."""
    sig = dd_minhash_sig(spark, sf_dir).persist()
    cand = _lsh_candidates(sig)
    shingles = _shingles(_docs(spark, sf_dir))
    sizes = shingles.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("sz")
    )
    sh_a = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
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


DD_NGRAM_JACCARD_SQL = f"""
WITH {_SHINGLES_SQL.strip()}, {_PARAMS_SQL}, {_SIG_SQL_BODY.strip()},
{_CAND_SQL.strip()}, sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM shingles GROUP BY doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS inter
  FROM cand c
  JOIN shingles a ON a.doc_id = c.doc_a
  JOIN shingles b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(i.inter / CAST(sa.sz + sb.sz - i.inter AS DOUBLE), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.inter / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) >= 0.2
"""


# -- Duplicate clustering: connected components over the LSH pair graph ----

def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): O(log n) rounds, each round ONE min-groupBy plus ONE join.
    No neighborhood collect_list anywhere, so a celebrity node (a head
    duplicate cluster with millions of members) can never blow a single
    task -- its neighbors re-point via a join, row by row. That is the
    property that makes this the 10^12-document shape; label-propagation
    converges in O(diameter) rounds and star-contraction with gathered
    neighbor lists hot-spots, both published dead ends at this scale.

    Returns (node, component) for every node that appears in `edges`,
    where component = the component's minimum node id. Iterates to a
    fixpoint (set-stable edge list) and raises if `max_rounds` rounds
    don't converge -- a wrong answer must never return silently. Each
    round localCheckpoints to truncate the plan lineage; at cluster
    scale swap for `spark.sparkContext.setCheckpointDir` + checkpoint()
    (reliable storage), which is the only change this loop needs.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for _round in range(max_rounds):
        # large-star: every neighbor v > u re-points to m(u) =
        # min(neighborhood(u) + {u})
        bi = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            bi.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        large = (
            bi.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: orient u > v; every small neighbor (and u itself)
        # re-points to the smallest neighbor m < u
        e2 = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins2 = e2.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            e2.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .union(mins2.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        if small.exceptAll(e).isEmpty() and e.exceptAll(small).isEmpty():
            e = small
            break
        e = small
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # fixpoint edges form stars child -> component-min root: each node's
    # component is its smallest final neighbor (the root maps to itself)
    bi = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return (
        bi.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(
            F.col("u").alias("node"),
            F.least("u", "mn").alias("component"),
        )
    )


def dd_cluster(spark, sf_dir):
    """Duplicate clusters = transitive closure of the verified banded-LSH
    candidate pairs (`dd_minhash_pairs`): one row per document that is in
    any cluster of size >= 2, carrying the cluster id (= min doc_id of
    its component) and whether this doc is the canonical representative.
    The keep-set of a dedup pass is `is_canonical` rows plus every
    unpaired document."""
    pairs = dd_minhash_pairs(spark, sf_dir)
    cc = connected_components(pairs)
    return cc.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


# the oracle re-derives the pair graph, then takes its transitive
# closure with a recursive CTE: a node's reachable-label set is its
# whole component, so min(label) is exactly the cluster id
DD_CLUSTER_SQL = f"""
WITH RECURSIVE {_SHINGLES_SQL.strip()}, {_PARAMS_SQL}, {_SIG_SQL_BODY.strip()},
{_CAND_SQL.strip()}, est AS (
  SELECT c.doc_a, c.doc_b,
         sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
           / {float(N_HASHES)} AS est_raw
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.hid = sa.hid
  GROUP BY c.doc_a, c.doc_b
), pairs AS (
  SELECT doc_a, doc_b FROM est WHERE est_raw >= 0.25
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
), cc(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, cc.label FROM cc JOIN edges e ON e.u = cc.node
)
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(min(label) AS BIGINT) AS cluster_id,
       (node = min(label)) AS is_canonical
FROM cc GROUP BY node
"""


SIM_BLOCKS = 4  # fingerprint split for the Manku bucket trick
SIM_HAMMING_K = SIM_BLOCKS - 1  # pigeonhole: <=K diff bits -> one block equal


def dd_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs via the bit-block trick of Manku, Jain &
    Das Sarma (WWW'07 "Detecting Near-Duplicates for Web Crawling"):
    split each fingerprint into SIM_BLOCKS equal blocks; any pair within
    hamming distance K = SIM_BLOCKS-1 must agree on at least one whole
    block (pigeonhole), so candidates are generated ONLY inside
    (block_index, block_value) buckets -- B small copies of the one-row-
    per-doc signature table, never an all-pairs join -- then verified
    with an exact popcount. Recall is exact by construction (pinned
    against brute force in tests/test_dedup_cluster.py). The sandbox's
    SIM_BITS=16 makes block values dense; at production width (64-bit
    fingerprints, 16-bit blocks) buckets are sparse and this is the
    10^12-document shape."""
    sim = dd_simhash(spark, sf_dir)
    span = SIM_BITS // SIM_BLOCKS
    mask = (1 << span) - 1
    blocks = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftright(F.col("simhash"), b * span)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(SIM_BLOCKS)
                ]
            )
        ).alias("blk"),
    ).select("doc_id", "simhash", "blk.b", "blk.key")
    a = blocks.select(
        F.col("b"), F.col("key"),
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"),
    )
    b = blocks.select(
        F.col("b"), F.col("key"),
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"),
    )
    return (
        a.join(b, ["b", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(
                F.col("sa").bitwiseXOR(F.col("sb"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= SIM_HAMMING_K)
        .distinct()
    )


def dd_keep_set(spark, sf_dir):
    """The dedup pass's OUTPUT relation: doc_ids to KEEP = every unpaired
    document plus one canonical representative per near-dup cluster
    (`dd_cluster`). The drop-list is only the clustered non-canonical
    docs -- at corpus scale a sliver of the corpus -- so the anti-join
    broadcasts and the pass costs one scan of `documents`. Derived data;
    invariants pinned in tests/test_dedup_cluster.py."""
    docs = _docs(spark, sf_dir).select("doc_id")
    drop = (
        dd_cluster(spark, sf_dir)
        .filter(~F.col("is_canonical"))
        .select("doc_id")
    )
    return docs.join(F.broadcast(drop), "doc_id", "anti")


QUERIES = {
    "dd_exact": (dd_exact, DD_EXACT_SQL),
    # dd_minhash_sig stays public API + SQL-oracled in this module, but
    # its registry slot goes to dd_cluster (the 50-entry driver gate):
    # the signatures are verified transitively -- dd_minhash_pairs is
    # computed FROM them and any signature drift breaks the pair oracle
    "dd_minhash_pairs": (dd_minhash_pairs, DD_MINHASH_PAIRS_SQL),
    "dd_cluster": (dd_cluster, DD_CLUSTER_SQL),
    "dd_simhash": (dd_simhash, DD_SIMHASH_SQL),
    "dd_ngram_jaccard": (dd_ngram_jaccard, DD_NGRAM_JACCARD_SQL),
}
