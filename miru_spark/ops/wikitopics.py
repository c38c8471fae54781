"""Wiki-miru pipeline: per-document topic extraction, gram (typeahead)
aggregation, and the wiki graph-schema projection.

Re-expresses the reference's wiki demo stack Spark-first:

- topic extraction -- wiki-miru-deployable/.../topics/KeywordsExtractor.java
  :74-160 (`getKeywordsList`): tokenize twice (stemming + non-stemming
  English analyzer, streams aligned 1:1), group keyword frequencies by
  stem, then score every n-gram window up to `max_phrase_len` as
  (1 + sum of member-stem frequencies) / (1 + window_length-1), dedup
  windows by their DISTINCT-STEM SET (first window to produce a stem set
  wins -- Java's `uniq.add(join(hashset))`), keep a bounded top-N
  (MinMaxPriorityQueue analog) and emit topics sorted score-descending.
  URLs are stripped first (KeywordsExtractor.java:136-140).
- grams -- .../storage/WikiMiruGramsAmza.java: per-gram counts backing the
  typeahead suggester; here a plain groupBy over the extracted topics.
- wiki graph schema -- WikiSchemaConstants.java:19-30 (locale, auth,
  userGuid, folderGuid, guid, verb, type, title, body): projected onto the
  engine's document shape with the graph fields as schema-declared extra
  fields (`build_index(extra_fields=...)`, the MiruSchema analog).
- indexing flow -- WikiMiruIndexService.java:180-420: dump page ->
  plaintext -> topics + grams + activity; here documents.parquet ->
  `wiki_documents` -> `topics_frame`/`wiki_grams` + `build_index`.

Scale shape: extraction is embarrassingly parallel (mapInPandas, Arrow
batches, per-doc cost bounded by len(tokens) x max_phrase_len); grams are
one map-side-combinable groupBy; typeahead is a prefix range scan of the
gram table. No all-pairs anything, no driver-side loops.
"""

from __future__ import annotations

import heapq
import re
from collections import Counter

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..analyzer import ENGLISH_STOPWORDS, porter2_stem, standard_tokenize

# KeywordsExtractor.java:136-140 -- strip URLs before tokenizing
_URL_RE = re.compile(r"https?://\S+\s?")

# reference defaults (KeywordsExtractor.main + WikiMiruIndexService call
# sites use 20/20; the Spark op defaults lower for interactive use)
DEFAULT_MAX_PHRASE = 20
DEFAULT_TOP_N = 20


def extract_topics(
    text: str,
    max_phrase_len: int = DEFAULT_MAX_PHRASE,
    top_n: int = DEFAULT_TOP_N,
) -> list[tuple[tuple[str, ...], float]]:
    """KeywordsExtractor.getKeywordsList parity for one document.

    Returns [(topic_terms, score), ...] sorted score-descending.
    Deterministic where the Java is arbitrary: boundary ties in the
    bounded queue keep the EARLIER-encountered window (Java's
    MinMaxPriorityQueue evicts an arbitrary equal element), and the
    final sort tie-breaks by encounter order (Arrays.sort is stable on
    the already-arbitrary queue order).

    The two Java analyzers (EnglishAnalyzer / NonStemingEnglishAnalyzer,
    same stop set) emit aligned streams because stemming never drops a
    token -- so one tokenize + stop-filter pass plus a stem map is the
    same computation.
    """
    if not text:
        return []
    text = _URL_RE.sub("", text)
    terms = [t for t in standard_tokenize(text) if t not in ENGLISH_STOPWORDS]
    if not terms:
        return []
    stems = [porter2_stem(t) for t in terms]
    freq = Counter(stems)

    # bounded top-N min-heap of (score, -encounter_idx, topic_terms):
    # lowest score (ties: latest encounter) evicts first
    heap: list[tuple[float, int, tuple[str, ...]]] = []
    uniq: set[frozenset] = set()
    n = len(terms)
    m = max_phrase_len
    enc = 0
    for t in range(n):
        score = 1
        seen: set[str] = set()
        ts: list[str] = []
        for length in range(min(m, n - t)):
            s = stems[t + length]
            score += freq[s]
            if s not in seen:
                seen.add(s)
                ts.append(terms[t + length])
            key = frozenset(seen)
            if key in uniq:
                continue
            uniq.add(key)
            item = (score / (1.0 + length), -enc, tuple(ts))
            enc += 1
            if len(heap) < top_n:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(topic, sc) for sc, _neg, topic in out]


# -- distributed extraction --------------------------------------------------

_TOPIC_SCHEMA = (
    "doc_id long, topic string, n_terms int, score double, rank int"
)


def topics_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_phrase_len: int = 5,
    top_n: int = 10,
) -> DataFrame:
    """Per-document topics as rows (doc_id, topic, n_terms, score, rank).

    mapInPandas (Arrow batches): the extraction is pure per-document
    Python -- the one genuinely non-relational step of the wiki pipeline
    (WikiMiruIndexService.java:352-376 runs it per page inside the
    indexer threads) -- so it rides the same partition parallelism as
    the index build. rank is 1-based in score order.
    """

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids, topics, nts, scores, ranks = [], [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                for r, (tt, sc) in enumerate(
                    extract_topics(t, max_phrase_len, top_n), 1
                ):
                    ids.append(i)
                    topics.append(" ".join(tt))
                    nts.append(len(tt))
                    scores.append(sc)
                    ranks.append(r)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "topic": pd.Series(topics, dtype="object"),
                    "n_terms": pd.Series(nts, dtype="int32"),
                    "score": pd.Series(scores, dtype="float64"),
                    "rank": pd.Series(ranks, dtype="int32"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(gen, _TOPIC_SCHEMA)


# -- grams + typeahead (WikiMiruGramsAmza analog) ----------------------------

def wiki_grams(topics: DataFrame) -> DataFrame:
    """Aggregate extracted topics into the gram table backing typeahead
    (WikiMiruGramsAmza stores per-gram counts keyed by tenant; the
    groupBy is map-side combinable, so gram skew never concentrates raw
    rows)."""
    return topics.groupBy("topic").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("score").alias("score_sum"),
        F.max("n_terms").alias("n_terms"),
    )


def typeahead(grams: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """Typeahead suggestion: grams under `prefix`, most-common first
    (WikiMiruService's gram-backed suggest box). A prefix range scan --
    the same access pattern the engine's `expand_prefix` uses against
    the term dictionary, so on a sorted/bucketed gram table this prunes
    to the prefix's row groups."""
    return (
        grams.filter(F.col("topic").startswith(prefix))
        .orderBy(F.desc("n_docs"), F.asc("topic"))
        .limit(k)
    )


# -- wiki graph schema projection (WikiSchemaConstants) ----------------------

def wiki_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project documents.parquet onto the wiki graph schema
    (WikiSchemaConstants.java:19-30): anything is a node with a guid,
    type, title, body and graph properties. Deterministic synthetic
    userGuid/folderGuid/verb assignments (pure column expressions) stand
    in for the dump's page metadata; title is the body's first tokens
    like the indexer's subject line. Returns the engine's webtext shape
    with the graph fields in the `fields` map column, ready for
    build_index(extra_fields=WIKI_EXTRA_FIELDS).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.format_string("wiki%08d", F.col("doc_id")).alias("url"),
        F.timestamp_micros(
            F.lit(1704067200_000_000)
            + F.col("doc_id").cast("long") * 1_000_000
        ).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.coalesce(F.col("lang"), F.lit("en")).alias("lang"),
        F.create_map(
            F.lit("guid"),
            F.array(F.format_string("g%08d", F.col("doc_id"))),
            F.lit("type"),
            F.array(F.coalesce(F.col("source"), F.lit("content"))),
            F.lit("userGuid"),
            F.array(F.format_string("u%03d", F.col("doc_id") % 101)),
            F.lit("folderGuid"),
            F.array(
                F.format_string(
                    "f%03d", (F.col("doc_id") / 7).cast("long") % 31
                )
            ),
            F.lit("verb"),
            F.array(
                F.when(F.col("doc_id") % 5 == 0, "edited")
                .otherwise("created")
            ),
            F.lit("title"),
            F.array(
                F.array_join(
                    F.slice(F.split(F.col("text"), " "), 1, 6), " "
                )
            ),
        ).alias("fields"),
        # WikiSchemaConstants' auth dimension ("*:*:*:*" =
        # public:folderPublic:userPublic:...) through the engine's
        # first-class authz label index: every 3rd page is public, the
        # rest readable via a folder grant or the owning user's grant
        F.when(
            F.col("doc_id") % 3 == 0, F.array(F.lit("public"))
        )
        .otherwise(
            F.array(
                F.format_string(
                    "folder-f%03d", (F.col("doc_id") / 7).cast("long") % 31
                ),
                F.format_string("user-u%03d", F.col("doc_id") % 101),
            )
        )
        .alias("authz"),
    )


WIKI_EXTRA_FIELDS = ["guid", "type", "userGuid", "folderGuid", "verb"]

WIKI_TOPIC_FIELDS = WIKI_EXTRA_FIELDS + ["topic"]


def wiki_documents_with_topics(
    spark: SparkSession,
    sf_dir: str,
    max_phrase_len: int = 4,
    top_n: int = 3,
) -> DataFrame:
    """`wiki_documents` + each page's extracted topics as a `topic`
    extra field, so the ENGINE serves the wiki suggest/trend surface
    directly: typeahead = `engine.expand_prefix("topic<US>...")` (a term
    -dictionary prefix scan, no separate gram table), topic counts =
    `engine.distincts("topic")`, trending topics =
    `engine.trending("topic", ...)` -- the WikiMiruGramsAmza store
    re-expressed as composed index terms, the same consolidation the
    reference's wiki service gets from querying miru itself.

    One extra broadcast-sized join against the per-doc topic rows; the
    extraction cost is the same `topics_frame` pass either way.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tps = (
        topics_frame(docs, max_phrase_len=max_phrase_len, top_n=top_n)
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rank", "topic"))
                ),
                lambda s: s["topic"],
            ).alias("topics")
        )
        .select(
            F.format_string("wiki%08d", F.col("doc_id")).alias("url"),
            "topics",
        )
    )
    base = wiki_documents(spark, sf_dir)
    return base.join(tps, "url", "left").select(
        "url",
        "warc_ts",
        "html",
        "text",
        "lang",
        F.map_concat(
            "fields",
            F.create_map(
                F.lit("topic"),
                F.coalesce(
                    F.col("topics"), F.array().cast("array<string>")
                ),
            ),
        ).alias("fields"),
        "authz",
    )
