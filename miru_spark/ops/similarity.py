"""Similarity search over the `embeddings` table (vec_id, embedding:
array<float>, label).

Brute-force cosine top-k is the exact baseline; the LSH/bucketed variant
(label-blocked pair scan here; random-hyperplane buckets at scale) is the
scale path: at 10^9 vectors the cross join is replaced by a bucket
equi-join so each task scores only its bucket. Dot products run JVM-side
via zip_with/aggregate (whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOP_K = 5
N_QUERIES = 3  # vec_id 0..2 are the query vectors
# near-dup cosine threshold: 0.35 keeps the op's oracle gate non-trivial
# on the synthetic embeddings (whose max same-label cosine is ~0.47 at
# sf0.01); a production near-dup sweep would run the same plan at ~0.9
_DUP_THRESHOLD = 0.35


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def _cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


# -- brute-force cosine top-k ANN ------------------------------------------

def ann_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    cand = emb.select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("cv")
    )
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("vid") != F.col("qid"))
        .withColumn("cos_r", F.round(_cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "qid", "vid", F.col("cos_r").alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


ANN_COSINE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.qid, e.vec_id AS vid,
         round(list_cosine_similarity(q.qv, e.embedding), 4) AS cos_r
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.qid
), ranked AS (
  SELECT qid, vid, cos_r,
         row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, vid ASC) AS rank
  FROM scored
)
SELECT qid, vid, cos_r AS cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""


# -- near-duplicate pairs, bucketed by (label, lsh_bucket) ------------------
# Candidate generation joins on the COMPOSITE key so the pair count is
# quadratic only in the (label, bucket) cell size (expected cell ~=
# label_size / 2^N_PLANES), never in the whole label -- the same banding
# idea as dd_minhash_pairs applied inside each label. A high-cosine
# near-duplicate almost always lands in the same hyperplane bucket; at
# higher recall requirements, union over several independent plane sets
# (more bands) exactly like MinHash banding.

def emb_dup_pairs(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    eb = emb.join(_lsh_buckets(emb, spark), "vec_id")
    a = eb.select(
        F.col("label").alias("lbl"),
        F.col("bucket").alias("bkt"),
        F.col("vec_id").alias("vid_a"),
        F.col("embedding").alias("va"),
    )
    b = eb.select(
        F.col("label").alias("lbl"),
        F.col("bucket").alias("bkt"),
        F.col("vec_id").alias("vid_b"),
        F.col("embedding").alias("vb"),
    )
    pairs = a.join(b, ["lbl", "bkt"]).filter(F.col("vid_a") < F.col("vid_b"))
    scored = pairs.withColumn(
        "cos_r", F.round(_cosine(F.col("va"), F.col("vb")), 4)
    )
    return (
        scored.filter(F.col("cos_r") >= _DUP_THRESHOLD)
        .select(
            F.col("lbl").alias("label"),
            "vid_a",
            "vid_b",
            F.col("cos_r").alias("cosine"),
        )
    )


def emb_cluster(spark, sf_dir):
    """Embedding near-duplicate CLUSTERS: the transitive closure of
    `emb_dup_pairs` via the same large-star/small-star connected
    components the text-dedup family uses (dedup.connected_components)
    -- cluster id = min vec_id of the component, one canonical
    representative per cluster. Not registry-gated (50-entry cap);
    pinned by tests/test_dedup_cluster.py against a union-find oracle
    through the shared component kernel."""
    from .dedup import connected_components

    pairs = emb_dup_pairs(spark, sf_dir)
    cc = connected_components(pairs, src="vid_a", dst="vid_b")
    return cc.select(
        F.col("node").cast("long").alias("vec_id"),
        F.col("component").cast("long").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


# -- label centroid similarity (aggregate over vectors, JVM-side) -----------

def emb_label_norms(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return (
        emb.select("label", _norm(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.count("*").cast("long").alias("n_vecs"),
        )
    )


EMB_LABEL_NORMS_SQL = """
SELECT label,
       round(avg(sqrt(list_dot_product(embedding, embedding))), 4) AS avg_norm,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM embeddings GROUP BY label
"""


# -- LSH-bucketed ANN (random-hyperplane signs; the 10^9-vector scale
#    path). Hyperplane weights are small integers w(i,j) = ((i*j+7)%5)-2
#    and embeddings are quantized to round(v*1000) before the dot product,
#    so bucket assignment is EXACT integer arithmetic -- identical in Spark
#    and DuckDB with no float-summation-order hazard. Query scores exact
#    cosine only within its bucket (candidates /= 2^N_PLANES on average). --

N_PLANES = 4


def _lsh_buckets(emb: DataFrame, spark: SparkSession) -> DataFrame:
    """(vec_id, bucket) via integer random-hyperplane signs."""
    planes = spark.createDataFrame(
        [(j,) for j in range(N_PLANES)], "j int"
    )
    comp = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "v")
    ).withColumn("qv", F.round(F.col("v") * 1000).cast("long"))
    dots = (
        comp.crossJoin(F.broadcast(planes))
        .withColumn(
            "w", ((F.col("i") * F.col("j") + 7) % 5 - 2).cast("long")
        )
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("qv") * F.col("w")).alias("dot"))
    )
    return dots.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("dot") > 0, F.expr("shiftleft(1, j)")).otherwise(0)
        )
        .cast("long")
        .alias("bucket")
    )


_LSH_BUCKETS_SQL = f"""
comp AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS i,
         CAST(round(unnest(embedding) * 1000) AS BIGINT) AS qv
  FROM embeddings
), dots AS (
  SELECT c.vec_id, p.j, sum(c.qv * (((c.i * p.j + 7) % 5) - 2)) AS dot
  FROM comp c CROSS JOIN (SELECT unnest(range({N_PLANES})) AS j) p
  GROUP BY c.vec_id, p.j
), buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN dot > 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id
)"""


def ann_lsh_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    buckets = _lsh_buckets(emb, spark)
    eb = emb.join(buckets, "vec_id")
    q = eb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        "bucket",
    )
    cand = eb.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").alias("cv"),
        "bucket",
    )
    scored = (
        cand.join(F.broadcast(q), "bucket")
        .filter(F.col("vid") != F.col("qid"))
        .withColumn("cos_r", F.round(_cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "qid", "vid", F.col("cos_r").alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


ANN_LSH_TOPK_SQL = f"""
WITH {_LSH_BUCKETS_SQL.strip()},
eb AS (
  SELECT e.vec_id, e.embedding, b.bucket
  FROM embeddings e JOIN buckets b USING (vec_id)
), q AS (
  SELECT vec_id AS qid, embedding AS qv, bucket FROM eb WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.qid, c.vec_id AS vid,
         round(list_cosine_similarity(q.qv, c.embedding), 4) AS cos_r
  FROM eb c JOIN q USING (bucket)
  WHERE c.vec_id <> q.qid
), ranked AS (
  SELECT qid, vid, cos_r,
         row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, vid ASC) AS rank
  FROM scored
)
SELECT qid, vid, cos_r AS cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""


EMB_DUP_PAIRS_SQL = f"""
WITH {_LSH_BUCKETS_SQL.strip()},
eb AS (
  SELECT e.vec_id, e.embedding, e.label, b.bucket
  FROM embeddings e JOIN buckets b USING (vec_id)
)
SELECT a.label AS label, a.vec_id AS vid_a, b.vec_id AS vid_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cosine
FROM eb a JOIN eb b
  ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding, b.embedding), 4) >= {_DUP_THRESHOLD}
"""


# -- IVF (inverted-file) ANN: the other classic scale path ------------------

N_CELLS = 16
N_PROBE = 4


def _ivf_comp(emb):
    """Integer-quantized components (vec_id, i, qv): the coarse stage
    runs ENTIRELY in exact integer arithmetic (round(v*1000), like the
    LSH op) so cell assignment is bit-reproducible across engines --
    float summation order can flip an argmin for borderline vectors."""
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "v")
    ).withColumn("qv", F.round(F.col("v") * 1000).cast("long"))


def _ivf_assign(comp, cents):
    """Nearest cell per vector by exact integer squared-L2 (FAISS
    IndexIVFFlat's metric); ties break to the lowest cell id."""
    d2 = (
        comp.join(F.broadcast(cents), "i")
        .groupBy("vec_id", "cell")
        .agg(
            F.sum(
                (F.col("qv") - F.col("c")) * (F.col("qv") - F.col("c"))
            ).alias("d2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cell"))
    return (
        d2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )


def _ivf_cells(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(vec_id -> cell) assignment + refined integer centroids.

    Seeds are the first N_CELLS vectors; one Lloyd refinement (assign ->
    integer-mean centroid -> reassign) -- deterministic k-means, the
    coarse quantizer of an IVF index. At 10^9 vectors this is the same
    plan: a broadcast of N_CELLS centroids, one map-side-combinable agg
    per pass, no shuffle wider than (cell, i)."""
    comp = _ivf_comp(emb)
    seeds = comp.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"), "i", F.col("qv").alias("c")
    )
    a1 = _ivf_assign(comp, seeds)
    cents = (
        comp.join(a1, "vec_id")
        .groupBy("cell", "i")
        .agg(F.floor(F.avg("qv")).cast("long").alias("c"))
    )
    return _ivf_assign(comp, cents), cents


def ann_ivf_topk(spark, sf_dir):
    """IVF top-k: probe the N_PROBE nearest cells per query, exact
    cosine re-rank inside the probed cells only. Complements
    `ann_lsh_topk` -- the task brief's other bucketed scale path."""
    emb = _emb(spark, sf_dir)
    assign, cents = _ivf_cells(emb)
    # query -> top-nprobe cells by the same exact integer metric
    qd2 = (
        _ivf_comp(emb.filter(F.col("vec_id") < N_QUERIES))
        .join(F.broadcast(cents), "i")
        .groupBy("vec_id", "cell")
        .agg(
            F.sum(
                (F.col("qv") - F.col("c")) * (F.col("qv") - F.col("c"))
            ).alias("d2")
        )
    )
    wq = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cell"))
    probes = (
        qd2.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= N_PROBE)
        .select(F.col("vec_id").alias("qid"), "cell")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    cand = emb.select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("cv")
    ).join(assign.withColumnRenamed("vec_id", "vid"), "vid")
    scored = (
        cand.join(F.broadcast(probes), "cell")
        .join(F.broadcast(q), "qid")
        .filter(F.col("vid") != F.col("qid"))
        .withColumn("cos_r", F.round(_cosine(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_r"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "qid", "vid", F.col("cos_r").alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


_IVF_SQL_PRELUDE = f"""
comp AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS i,
         CAST(round(unnest(embedding) * 1000) AS BIGINT) AS qv
  FROM embeddings
), seeds AS (
  SELECT vec_id AS cell, i, qv AS c FROM comp WHERE vec_id < {N_CELLS}
), d1 AS (
  SELECT comp.vec_id, seeds.cell, sum((comp.qv - seeds.c) * (comp.qv - seeds.c)) AS d2
  FROM comp JOIN seeds USING (i) GROUP BY comp.vec_id, seeds.cell
), a1 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM d1) WHERE rn = 1
), cents AS (
  SELECT a1.cell, comp.i, CAST(floor(avg(comp.qv)) AS BIGINT) AS c
  FROM comp JOIN a1 USING (vec_id) GROUP BY a1.cell, comp.i
), d2s AS (
  SELECT comp.vec_id, cents.cell, sum((comp.qv - cents.c) * (comp.qv - cents.c)) AS d2
  FROM comp JOIN cents USING (i) GROUP BY comp.vec_id, cents.cell
), assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM d2s) WHERE rn = 1
), probes AS (
  SELECT vec_id AS qid, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM d2s WHERE vec_id < {N_QUERIES}) WHERE rn <= {N_PROBE}
)"""


ANN_IVF_TOPK_SQL = f"""
WITH {_IVF_SQL_PRELUDE.strip()},
q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.qid, c.vec_id AS vid,
         round(list_cosine_similarity(q.qv, c.embedding), 4) AS cos_r
  FROM embeddings c
  JOIN assign a ON a.vec_id = c.vec_id
  JOIN probes p ON p.cell = a.cell
  JOIN q ON q.qid = p.qid
  WHERE c.vec_id <> q.qid
), ranked AS (
  SELECT qid, vid, cos_r,
         row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, vid ASC) AS rank
  FROM scored
)
SELECT qid, vid, cos_r AS cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {TOP_K}
"""


QUERIES = {
    "ann_cosine_topk": (ann_cosine_topk, ANN_COSINE_TOPK_SQL),
    "ann_lsh_topk": (ann_lsh_topk, ANN_LSH_TOPK_SQL),
    "emb_dup_pairs": (emb_dup_pairs, EMB_DUP_PAIRS_SQL),
    "emb_label_norms": (emb_label_norms, EMB_LABEL_NORMS_SQL),
}
