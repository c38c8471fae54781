"""BM25 top-k query engine over the blocked postings index (the "read side").

Spark-first re-expression of the reference's full-text query path
(FullTextCustomQuestion.askLocal, miru-stream-plugins/.../
FullTextCustomQuestion.java:53-118 -> FullText.getActivityScores,
FullText.java:54-97):

- query string -> filter tree (LuceneBackedQueryParser analog, see
  miru_spark.queryparse)
- postings fetch: `postings.filter(term IN query_terms)` -- Parquet
  predicate pushdown on `term` (postings files are written sorted by term,
  so row-group stats prune aggressively); time-range constraints prune at
  the pid partition level plus an exact per-pid docID interval mask, the
  analog of miru's buildTimeRangeMask closest-id bounds
  (MiruBitmaps.java:141, LabTimeIndex.java:191-208)
- per-partition kernel: `repartition(pid)` + `mapInPandas` (one pandas
  call per task, looping the pids it owns -- per-group invocation
  overhead stays O(tasks), not O(pids)) -- decode posting blocks to
  NumPy, evaluate the boolean tree over sorted docID arrays
  (and/or/andNot = intersect/union/setdiff -- MiruBitmaps.java:87-123),
  score BM25 (k1=1.2, b=0.75) vectorized, emit a bounded per-partition
  top-k (the reference's MinMaxPriorityQueue, FullText.java:129-157)
- global merge: orderBy(score desc, pid asc, doc_id asc).limit(k) --
  Spark's TakeOrderedAndProject is the FullTextAnswerMerger k-way merge
  (FullTextAnswerMerger.java:30-69)
- winners join back to docmap for display fields (forward-index gather,
  FullText.gatherValues FullText.java:253-280).

**Block-max pruning (exact).** Posting blocks are doc-range aligned across
terms (blk = doc_id // block_span with one span for the whole index), so
for a blk range the metadata-only bound
    ub_total(blk) = sum over scoring terms t of
                    idf_t * BM25_tf(max_tf_t(blk), min_dl_t(blk))
dominates every doc's score in that range, and scoring any *subset of blks*
with the exhaustive kernel is exact for the docs it contains (every posting
of those docs for every fetched term lives in those blks). Two phases:
(1) score the highest-ub blks until k docs are found -> threshold theta;
(2) score all blks with ub_total >= theta and merge. Docs in skipped blks
are bounded below theta, so the final top-k is rank-identical to the
exhaustive scorer -- miru's atomized-container skipping
(LabFieldIndex.multiTxIndex:339-419) upgraded to block-max WAND semantics.

Scores are float64 and term contributions accumulate in sorted term order,
matching the pure-Python oracle bit-for-bit.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..codec import decode_postings, decode_varint
from ..index.build import IndexPaths
from ..oracle import B, K1, MAX_WILDCARD_EXPANSION, bm25_idf
from ..queryparse import all_referenced_terms, collect_terms, parse_query

_RESULT_SCHEMA = "pid long, doc_id long, score double"


def _bm25_tf_part(tf, dl, avgdl: float):
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def _eval_tree(node, term_ids: dict, expansions: dict, universe: np.ndarray):
    """Evaluate filter tree -> sorted unique docID array."""
    tag = node[0]
    empty = np.empty(0, dtype=np.int64)
    if tag == "term":
        return term_ids.get(node[1], empty)
    if tag == "prefix":
        parts = [term_ids[t] for t in expansions.get(node[1], ()) if t in term_ids]
        if not parts:
            return empty
        return np.unique(np.concatenate(parts))
    if tag == "and":
        sets = sorted(
            (_eval_tree(c, term_ids, expansions, universe) for c in node[1]),
            key=len,
        )
        out = sets[0]
        for s in sets[1:]:
            if out.size == 0:
                break  # AND short-circuit (MiruAggregateUtil.java:1175-1177)
            out = np.intersect1d(out, s, assume_unique=True)
        return out
    if tag == "or":
        parts = [_eval_tree(c, term_ids, expansions, universe) for c in node[1]]
        parts = [p for p in parts if p.size]
        if not parts:
            return empty
        return np.unique(np.concatenate(parts))
    if tag == "not":
        p = _eval_tree(node[1], term_ids, expansions, universe)
        q = _eval_tree(node[2], term_ids, expansions, universe)
        return np.setdiff1d(p, q, assume_unique=True)
    if tag == "all":
        return universe
    if tag == "none":
        return empty
    raise ValueError(f"bad node {node!r}")


def _tree_tags(node) -> set:
    tags = {node[0]}
    if node[0] in ("and", "or"):
        for c in node[1]:
            tags |= _tree_tags(c)
    elif node[0] == "not":
        tags |= _tree_tags(node[1])
        tags |= _tree_tags(node[2])
    return tags


def _per_pid_dispatch(kernel):
    """mapInPandas wrapper: consume a task's (pid-co-located) block rows,
    run the per-pid kernel on each pid group. The rows reaching a task are
    only the query's fetched posting blocks for its pids -- bounded by the
    query's term postings, not by corpus size."""
    import pandas as pd

    def run(batches):
        dfs = [b for b in batches if len(b)]
        if not dfs:
            return
        pdf = pd.concat(dfs, ignore_index=True)
        for _pid, grp in pdf.groupby("pid", sort=False):
            out = kernel(grp)
            if len(out):
                yield out

    return run


def _make_kernel(
    tree,
    scoring_terms: list[str],
    n_docs: int,
    avgdl: float,
    k: int,
    pid_counts: dict,
    expansions: dict,
    time_bounds: dict | None,
    use_blockmax: bool,
):
    """Build the per-partition applyInPandas kernel (closure ships to
    executors with the task -- all members are small).

    Per-term global df arrives as a `df` column broadcast-joined onto the
    posting blocks, so idf is computed executor-side and the driver never
    runs a separate idf-lookup job per query."""
    import pandas as pd

    has_all = "all" in _tree_tags(tree)

    def decode_terms(rows: "pd.DataFrame"):
        term_ids, term_tfs, term_dls = {}, {}, {}
        for term, grp in rows.groupby("term", sort=True):
            ids = np.concatenate(
                [decode_postings(b) for b in grp["ids_bin"]]
            ) if len(grp) else np.empty(0, dtype=np.int64)
            term_ids[term] = ids
            term_tfs[term] = np.concatenate(
                [decode_varint(b) for b in grp["tfs_bin"]]
            ) if len(grp) else ids
            term_dls[term] = np.concatenate(
                [decode_varint(b) for b in grp["dls_bin"]]
            ) if len(grp) else ids
        return term_ids, term_tfs, term_dls

    def score_subset(pid: int, rows: "pd.DataFrame", idf: dict):
        """Exact match+score over a doc-range-aligned blk subset.
        Returns (doc_ids, scores) sorted by doc_id."""
        term_ids, term_tfs, term_dls = decode_terms(rows)
        n_docs_pid = int(pid_counts.get(pid, 0))
        if has_all:
            universe = np.arange(n_docs_pid, dtype=np.int64)
            if time_bounds is not None:
                lo, hi = time_bounds.get(pid, (0, n_docs_pid))
                universe = universe[(universe >= lo) & (universe < hi)]
        else:
            universe = np.empty(0, dtype=np.int64)
        matches = _eval_tree(tree, term_ids, expansions, universe)
        if time_bounds is not None and matches.size:
            lo, hi = time_bounds.get(pid, (0, n_docs_pid))
            matches = matches[(matches >= lo) & (matches < hi)]
        if matches.size == 0:
            z = np.empty(0, dtype=np.int64)
            return z, np.empty(0, dtype=np.float64)
        scores = np.zeros(matches.size, dtype=np.float64)
        for t in scoring_terms:  # sorted order fixes float summation order
            ids = term_ids.get(t)
            if ids is None or ids.size == 0:
                continue
            pos = np.searchsorted(ids, matches)
            pos_c = np.minimum(pos, ids.size - 1)
            present = ids[pos_c] == matches
            if not present.any():
                continue
            tf = term_tfs[t][pos_c[present]].astype(np.float64)
            dl = term_dls[t][pos_c[present]].astype(np.float64)
            scores[present] += idf[t] * _bm25_tf_part(tf, dl, avgdl)
        return matches, scores

    def topk_of(ids: np.ndarray, scores: np.ndarray):
        order = np.lexsort((ids, -scores))
        if k > 0:
            order = order[:k]
        return ids[order], scores[order]

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if pdf.empty:
            return pd.DataFrame(columns=["pid", "doc_id", "score"])
        pid = int(pdf["pid"].iloc[0])
        pdf = pdf.sort_values(["term", "blk"], kind="stable")
        idf = {
            t: bm25_idf(n_docs, int(d))
            for t, d in zip(pdf["term"], pdf["df"])
        }

        if not use_blockmax or has_all or k <= 0:
            ids, scores = score_subset(pid, pdf, idf)
            out_ids, out_scores = topk_of(ids, scores)
        else:
            # ---- exact block-max pruning over aligned blk ranges ----
            ub_row = np.where(
                pdf["term"].isin(scoring_terms).to_numpy(),
                pdf["term"].map(idf).fillna(0.0).to_numpy()
                * _bm25_tf_part(
                    pdf["max_tf"].to_numpy().astype(np.float64),
                    pdf["min_dl"].to_numpy().astype(np.float64),
                    avgdl,
                ),
                0.0,
            )
            blk_ub = (
                pd.Series(ub_row, index=pdf.index)
                .groupby(pdf["blk"].to_numpy())
                .sum()
                .sort_values(ascending=False)
            )
            blks_desc = blk_ub.index.to_numpy()
            # phase 1: grow the scored prefix until >= k docs matched
            scored_ids = np.empty(0, dtype=np.int64)
            scored_scores = np.empty(0, dtype=np.float64)
            m = min(4, len(blks_desc))
            scored_blks: set = set()
            while True:
                subset = set(blks_desc[:m].tolist())
                new = subset - scored_blks
                if new:
                    sub_rows = pdf[pdf["blk"].isin(subset)]
                    scored_ids, scored_scores = score_subset(pid, sub_rows, idf)
                    scored_blks = subset
                if scored_ids.size >= k or m >= len(blks_desc):
                    break
                m = min(m * 4, len(blks_desc))
            if scored_ids.size >= k:
                kth = np.partition(-scored_scores, k - 1)
                theta = -kth[k - 1]
                # phase 2: every blk whose bound can reach theta
                cand = set(blk_ub.index[blk_ub.to_numpy() >= theta].tolist())
                cand |= scored_blks
                if cand != scored_blks:
                    sub_rows = pdf[pdf["blk"].isin(cand)]
                    scored_ids, scored_scores = score_subset(pid, sub_rows, idf)
            out_ids, out_scores = topk_of(scored_ids, scored_scores)

        return pd.DataFrame(
            {"pid": pid, "doc_id": out_ids, "score": out_scores}
        )

    return kernel


class SearchEngine:
    """Distributed BM25 search over a built index directory."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        # AQE re-plans every exchange as its own job; for small interactive
        # top-k queries that is ~6 jobs and +30-40% latency with no upside
        # (the kernel shuffle is tiny). build_index() re-enables it.
        try:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        except Exception:
            pass
        self.paths = IndexPaths(index_dir)
        meta_path = os.path.join(index_dir, "meta.json")
        self.meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.meta = json.load(f)
        from ..index.build import read_docmap, read_postings

        srow = spark.read.parquet(self.paths.stats).collect()[0]
        self.n_docs = int(srow["n_docs"])
        self.avgdl = float(srow["avgdl"])
        self.termstats = spark.read.parquet(self.paths.termstats)
        self.postings = read_postings(spark, self.paths)
        self.docmap = read_docmap(spark, self.paths)
        lineage = spark.read.parquet(self.paths.lineage)
        self.pid_counts = {
            int(r["pid"]): int(r["doc_count"])
            for r in lineage.filter(F.col("status") == "complete")
            .groupBy("pid")
            .agg(F.max("doc_count").alias("doc_count"))
            .collect()
        }

    # -- helpers -----------------------------------------------------------
    def expand_prefix(self, prefix: str) -> list[str]:
        """Wildcard expansion: term-dictionary range scan, lexicographic,
        capped (MiruAggregateUtil.java:1154-1167 maxWildcardExpansion)."""
        rows = (
            self.termstats.filter(F.col("term").startswith(prefix))
            .select("term")
            .orderBy("term")
            .limit(MAX_WILDCARD_EXPANSION)
            .collect()
        )
        return [r["term"] for r in rows]

    def cache(self) -> "SearchEngine":
        """Pin the index tables in executor memory for repeated queries --
        the batch-engine analog of miru's memory-mapped hot partitions
        (LabInvertedIndex reads). Returns self."""
        self.postings = self.postings.cache()
        self.termstats = self.termstats.cache()
        self.docmap = self.docmap.cache()
        return self

    def _time_bounds(self, pids: list[int], t0_us: int, t1_us: int) -> dict:
        """Per-pid contiguous docID interval [lo, hi) for the time range --
        docIDs are time-ordered so the mask is an interval (miru
        getClosestId, LabTimeIndex.java:191-208)."""
        rows = (
            self.docmap.filter(F.col("pid").isin([int(p) for p in pids]))
            .groupBy("pid")
            .agg(
                F.sum((F.col("warc_us") < t0_us).cast("long")).alias("lo"),
                F.sum((F.col("warc_us") <= t1_us).cast("long")).alias("hi"),
            )
            .collect()
        )
        return {int(r["pid"]): (int(r["lo"]), int(r["hi"])) for r in rows}

    # -- search ------------------------------------------------------------
    def search(
        self,
        query: str,
        k: int = 10,
        locale: str | None = None,
        time_range_us: tuple[int, int] | None = None,
        use_blockmax: bool = True,
    ) -> DataFrame:
        """Run a query; returns DataFrame(url, warc_ts, pid, doc_id, score)
        ordered by (score desc, pid, doc_id), limit k."""
        tree = parse_query(query, locale)
        terms, prefixes = all_referenced_terms(tree)
        expansions = {p: self.expand_prefix(p) for p in prefixes}
        pos_terms, pos_prefixes, _ = collect_terms(tree)
        scoring_terms = set(pos_terms)
        for p in pos_prefixes:
            scoring_terms.update(expansions[p])
        scoring_terms = sorted(scoring_terms)

        fetch_terms = set(terms)
        for exp in expansions.values():
            fetch_terms.update(exp)
        fetch_terms = sorted(fetch_terms)

        blocks = self.postings
        time_bounds = None
        if time_range_us is not None:
            psec = int(self.meta.get("partition_seconds", 86400))
            t0_us, t1_us = time_range_us
            psec_us = psec * 1_000_000
            pid_lo, pid_hi = t0_us // psec_us, t1_us // psec_us
            pids = [p for p in self.pid_counts if pid_lo <= p <= pid_hi]
            blocks = blocks.filter(
                (F.col("pid") >= pid_lo) & (F.col("pid") <= pid_hi)
            )
            time_bounds = self._time_bounds(pids, t0_us, t1_us)

        has_all_node = "all" in _tree_tags(tree)
        if fetch_terms:
            blocks = blocks.filter(F.col("term").isin(fetch_terms))
        elif not has_all_node:
            blocks = blocks.filter(F.lit(False))

        # global df rides along via a broadcast join so idf is computed in
        # the kernel -- no separate driver-side idf lookup job per query
        tstats = self.termstats.select("term", "df")
        if fetch_terms:
            tstats = tstats.filter(F.col("term").isin(fetch_terms))
        blocks = blocks.join(F.broadcast(tstats), "term", "left")

        kernel = _make_kernel(
            tree,
            scoring_terms,
            self.n_docs,
            self.avgdl,
            k,
            self.pid_counts,
            expansions,
            time_bounds,
            use_blockmax,
        )
        # hash-co-locate each pid's fetched blocks on one task, then ONE
        # pandas call per task loops the pids it owns -- same semantics as
        # groupBy(pid).applyInPandas but without a per-group Arrow+pandas
        # round trip (a query touches O(pids) groups; at fine-grained time
        # partitioning that per-group overhead dominated latency)
        per_part = blocks.repartition("pid").mapInPandas(
            _per_pid_dispatch(kernel), _RESULT_SCHEMA
        )

        if has_all_node:
            # pids with zero fetched blocks never reach the kernel but
            # still match (score 0): add their k smallest docIDs.
            present = {r["pid"] for r in blocks.select("pid").distinct().collect()}
            missing = [p for p in self.pid_counts if p not in present]
            if time_bounds is not None:
                missing = [p for p in missing if p in time_bounds]
            if missing:
                zeros = (
                    self.docmap.filter(F.col("pid").isin(missing))
                    .select("pid", "doc_id")
                )
                if time_bounds is not None:
                    bdf = self.spark.createDataFrame(
                        [(int(p),) + tuple(map(int, time_bounds[p])) for p in missing],
                        "pid long, lo long, hi long",
                    )
                    zeros = (
                        zeros.join(F.broadcast(bdf), "pid")
                        .filter(
                            (F.col("doc_id") >= F.col("lo"))
                            & (F.col("doc_id") < F.col("hi"))
                        )
                        .select("pid", "doc_id")
                    )
                zeros = (
                    zeros.orderBy("pid", "doc_id")
                    .limit(k)
                    .withColumn("score", F.lit(0.0))
                )
                per_part = per_part.unionByName(zeros)

        topk = per_part.orderBy(
            F.desc("score"), F.asc("pid"), F.asc("doc_id")
        ).limit(k)
        # k rows vs the full docmap: broadcast the winners into the docmap
        # scan instead of shuffling the forward index (inner is safe -- every
        # scored docID was minted from the docmap)
        winners = self.docmap.select("pid", "doc_id", "url", "warc_us").join(
            F.broadcast(topk), ["pid", "doc_id"], "inner"
        )
        return winners.select(
            "url",
            F.timestamp_micros("warc_us").alias("warc_ts"),
            "pid",
            "doc_id",
            "score",
        ).orderBy(F.desc("score"), F.asc("pid"), F.asc("doc_id"))

    def search_collect(self, query: str, k: int = 10, **kw):
        """Collect top-k as [(pid, doc_id, score, url)] for tests."""
        rows = self.search(query, k=k, **kw).collect()
        return [(r["pid"], r["doc_id"], r["score"], r["url"]) for r in rows]

    def search_many(
        self,
        queries: list[str],
        k: int = 10,
        locale: str | None = None,
        use_blockmax: bool = True,
    ) -> dict[str, list]:
        """Batch N queries into ONE Spark job (the qps path -- the
        reference's stress harness fires queries concurrently,
        WikiMiruStressService.java:58-120). Each (query, pid) group runs
        the same kernel as `search`; per-query results are identical to
        sequential `search_collect` calls.

        Returns {query: [(pid, doc_id, score, url), ...]}.
        """
        import pandas as pd

        specs = []       # per-qid (tree, scoring_terms, expansions)
        fallback = {}    # queries with match-all nodes -> individual path
        qterm_rows = []  # (qid, term)
        fetch_all: set = set()
        for qid, q in enumerate(queries):
            tree = parse_query(q, locale)
            if "all" in _tree_tags(tree):
                fallback[q] = None
                specs.append(None)
                continue
            terms, prefixes = all_referenced_terms(tree)
            expansions = {p: self.expand_prefix(p) for p in prefixes}
            pos_terms, pos_prefixes, _ = collect_terms(tree)
            scoring = set(pos_terms)
            for p in pos_prefixes:
                scoring.update(expansions[p])
            fetch = set(terms)
            for exp in expansions.values():
                fetch.update(exp)
            specs.append((tree, sorted(scoring), expansions))
            fetch_all.update(fetch)
            qterm_rows.extend((qid, t) for t in sorted(fetch))

        out: dict[str, list] = {}
        for q in fallback:
            out[q] = self.search_collect(q, k=k, locale=locale,
                                         use_blockmax=use_blockmax)
        if not qterm_rows:
            for q in queries:
                out.setdefault(q, [])
            return out

        blocks = self.postings.filter(
            F.col("term").isin(sorted(fetch_all))
        ).join(
            F.broadcast(
                self.termstats.select("term", "df").filter(
                    F.col("term").isin(sorted(fetch_all))
                )
            ),
            "term",
            "left",
        )
        qmap = self.spark.createDataFrame(qterm_rows, "qid int, term string")
        tagged = blocks.join(F.broadcast(qmap), "term")

        n_docs, avgdl, pid_counts = self.n_docs, self.avgdl, self.pid_counts
        kernels = {}
        for qid, spec in enumerate(specs):
            if spec is None:
                continue
            tree, scoring, expansions = spec
            kernels[qid] = _make_kernel(
                tree, scoring, n_docs, avgdl, k, pid_counts,
                expansions, None, use_blockmax,
            )

        def dispatch(batches):
            dfs = [b for b in batches if len(b)]
            if not dfs:
                return
            pdf = pd.concat(dfs, ignore_index=True)
            for (qid, _pid), grp in pdf.groupby(["qid", "pid"], sort=False):
                res = kernels[int(qid)](grp.drop(columns=["qid"]))
                if len(res):
                    res.insert(0, "qid", int(qid))
                    yield res

        per = tagged.repartition("qid", "pid").mapInPandas(
            dispatch, "qid int, pid long, doc_id long, score double"
        )
        w = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("pid"), F.asc("doc_id")
        )
        topk = per.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= k
        )
        winners = (
            self.docmap.select("pid", "doc_id", "url")
            .join(F.broadcast(topk), ["pid", "doc_id"], "inner")
            .collect()
        )
        by_qid: dict[int, list] = {}
        for r in winners:
            by_qid.setdefault(int(r["qid"]), []).append(
                (r["rn"], r["pid"], r["doc_id"], r["score"], r["url"])
            )
        for qid, q in enumerate(queries):
            if specs[qid] is None:
                continue
            rows = sorted(by_qid.get(qid, []))
            out[q] = [(p, d, s, u) for _rn, p, d, s, u in rows]
        return out

    def newest(self, k: int = 10) -> DataFrame:
        """TIME strategy: newest-k, score 0 (FullText.collectTime
        :222-251 -- descending docID iterator)."""
        return (
            self.docmap.select(
                "url",
                F.timestamp_micros("warc_us").alias("warc_ts"),
                "pid",
                "doc_id",
            )
            .orderBy(F.desc("warc_us"), F.desc("pid"), F.desc("doc_id"))
            .limit(k)
        )
