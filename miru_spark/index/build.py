"""Inverted-index build pipeline (the "write side").

Spark-first re-expression of the reference's indexer
(miru-service/.../stream/MiruIndexer.java:47-126 and
MiruIndexPrimaryFields.compose, MiruIndexPrimaryFields.java:37-96 -- per
(field, term): sorted docID list + tf counts):

1. **docID minting** -- docs get dense per-partition ids in time order
   (MiruTimeIndex.nextId, miru-plugin/.../MiruTimeIndex.java:55): partition
   key `pid = floor(unix_micros(warc_ts) / partition_seconds*1e6)`, then
   `row_number() over (partition by pid order by warc_ts, url) - 1`.
2. **doc-granular salted shuffle** -- whole docs hash-repartition by
   (pid, blk) with `blk = doc_id // block_span`: every doc-range block
   group lands intact on one task, and because head/stopword terms span
   many blks their postings are split across reducers instead of
   hot-spotting one (the explicit skew-salting the north rule mandates).
   The JVM never materializes per-posting rows -- only doc rows shuffle.
3. **tokenize + invert + encode, in-worker** -- Arrow-batched
   `mapInArrow` runs the analyzer (miru tokenizes in ingest clients,
   WikiMiruIndexService.java:401-425), then a second Arrow stage flattens
   each (pid, blk) group's per-doc term lists (zero-copy ListArray
   flatten), sorts (term, doc_id) in Arrow C++, and emits the block-level
   posting layout (delta-gap varint docIDs + varint tfs + varint doc
   lengths, with per-block first/last doc, max_tf, min_dl for block-max
   pruning) -- the analog of miru's "atomized" Roaring containers keyed
   by 64K container (LabInvertedIndex.java:268-292,
   LabFieldIndex.java:163-171).
4. **lineage / resume** -- per-pid lineage rows (doc_count, postings_bytes,
   wall_time_ms, status) let a restarted build skip completed partitions,
   mirroring the reference's sip-cursor checkpoint pattern
   (FullTextGatherer.java:176-252, custom key "fullText").
5. **finalize** -- global stats (N, avgdl) and per-term (df, ctf): the
   reference keeps collection term frequency at docId -1
   (LabFieldIndex.java:510-536); ours is a tiny aggregate table.

Storage is partitioned Parquet (zstd). On a cluster this layout maps 1:1
onto Iceberg tables (partition transform on pid, snapshot-per-batch commit);
the sandbox has no Iceberg runtime jars, so the parquet layout + lineage
table stands in for snapshots -- append per batch, orphan cleanup before
rebuild makes batches idempotent.

Scale notes (100 TB / 1000 executors):
- The only wide shuffle moves each doc ONCE, keyed (pid, blk); group size
  is bounded by block_span docs, so no reducer sees an unbounded
  head-term list and per-task memory is O(block_span * avg doc len).
- Postings files are written sorted by (pid, term, blk) so Parquet row-group
  min/max stats on `term` give tight predicate pushdown at query time.
- docID minting windows one pid at a time; partition_seconds must be chosen
  so one pid's docmap fits a task (e.g. hourly at crawl scale). No global
  sort or global sequence anywhere.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..analyzer import analyze
from ..codec import encode_postings_grouped, encode_varint_grouped

DEFAULT_PARTITION_SECONDS = 86400
DEFAULT_BLOCK_SPAN = 4096

_TOKENIZED_SCHEMA = (
    "pid long, blk long, doc_id long, url string, warc_us long, "
    "doc_len int, terms array<string>, tfs array<int>"
)
_BLOCK_SCHEMA = (
    "pid long, term string, blk long, n int, first_doc long, last_doc long, "
    "max_tf int, min_dl int, ctf long, ids_bin binary, tfs_bin binary, "
    "dls_bin binary"
)

_BLOCK_PA_SCHEMA = pa.schema(
    [
        ("pid", pa.int64()),
        ("term", pa.string()),
        ("blk", pa.int64()),
        ("n", pa.int32()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("max_tf", pa.int32()),
        ("min_dl", pa.int32()),
        ("ctf", pa.int64()),
        ("ids_bin", pa.binary()),
        ("tfs_bin", pa.binary()),
        ("dls_bin", pa.binary()),
    ]
)


@dataclass
class IndexPaths:
    root: str

    @property
    def docmap(self) -> str:
        return os.path.join(self.root, "docmap")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats")

    @property
    def termstats(self) -> str:
        return os.path.join(self.root, "termstats")

    @property
    def lineage(self) -> str:
        return os.path.join(self.root, "lineage")


@dataclass
class BuildReport:
    n_docs: int = 0
    pids_built: list = field(default_factory=list)
    pids_skipped: list = field(default_factory=list)
    wall_time_s: float = 0.0


def _tokenize_map(batches):
    """mapInArrow: (pid, blk, doc_id, url, warc_us, lang, text) ->
    tokenized (1:1, order-preserving)."""
    out_schema = pa.schema(
        [
            ("pid", pa.int64()),
            ("blk", pa.int64()),
            ("doc_id", pa.int64()),
            ("url", pa.string()),
            ("warc_us", pa.int64()),
            ("doc_len", pa.int32()),
            ("terms", pa.list_(pa.string())),
            ("tfs", pa.list_(pa.int32())),
        ]
    )
    from collections import Counter

    for batch in batches:
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        terms_col, tfs_col, dl_col = [], [], []
        for text, lang in zip(texts, langs):
            toks = analyze(text, lang)
            dl_col.append(len(toks))
            if toks:
                # sorted Counter items == np.unique order, ~3x cheaper
                items = sorted(Counter(toks).items())
                terms_col.append([t for t, _ in items])
                tfs_col.append([c for _, c in items])
            else:
                terms_col.append([])
                tfs_col.append([])
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("pid"),
                batch.column("blk"),
                batch.column("doc_id"),
                batch.column("url"),
                batch.column("warc_us"),
                pa.array(dl_col, type=pa.int32()),
                pa.array(terms_col, type=pa.list_(pa.string())),
                pa.array(tfs_col, type=pa.list_(pa.int32())),
            ],
            schema=out_schema,
        )


def _invert_encode_groups(batches):
    """mapInArrow over tokenized doc-rows sorted by (pid, blk, doc_id),
    where each (pid, blk) doc-range group lives wholly in this partition
    (hash repartition on (pid, blk)): flatten each group's per-doc term
    lists, sort (term, doc_id) with Arrow C++, emit encoded posting blocks.

    This replaces explode -> 87x-row shuffle -> Tungsten sort -> Arrow
    transfer of every posting with a doc-granular shuffle plus in-worker
    Arrow kernels: the JVM never materializes per-posting rows, which was
    the dominant (and memory-bandwidth-bound) cost of the build.
    """
    import pyarrow.compute as pc

    def one_chunk(col) -> pa.Array:
        arr = col.combine_chunks()
        return arr.chunk(0) if isinstance(arr, pa.ChunkedArray) else arr

    def emit_group(tbl: pa.Table):
        """tbl: rows of ONE (pid, blk) group, doc_id ascending."""
        n_docs = tbl.num_rows
        if n_docs == 0:
            return None
        pid = tbl.column("pid")[0].as_py()
        blk = tbl.column("blk")[0].as_py()
        terms_col = one_chunk(tbl.column("terms"))
        lens = pc.list_value_length(terms_col).to_numpy().astype(np.int64)
        flat_terms = terms_col.flatten()
        flat_tfs = one_chunk(tbl.column("tfs")).flatten()
        doc_ids = np.repeat(tbl.column("doc_id").to_numpy(), lens)
        dls = np.repeat(
            tbl.column("doc_len").to_numpy().astype(np.int64), lens
        )
        if len(flat_terms) == 0:
            return None
        flat = pa.table(
            {
                "term": flat_terms,
                "doc_id": pa.array(doc_ids),
                "tf": flat_tfs,
                "dl": pa.array(dls),
            }
        )
        order = pc.sort_indices(
            flat,
            sort_keys=[("term", "ascending"), ("doc_id", "ascending")],
        )
        flat = flat.take(order).combine_chunks()
        n = flat.num_rows
        term = one_chunk(flat.column("term"))
        ids64 = flat.column("doc_id").to_numpy()
        tfs64 = flat.column("tf").to_numpy().astype(np.int64)
        dls64 = flat.column("dl").to_numpy().astype(np.int64)
        change = np.empty(n, dtype=bool)
        change[0] = True
        if n > 1:
            change[1:] = pc.not_equal(
                term.slice(1), term.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(change)
        ends = np.empty_like(starts)
        ends[:-1] = starts[1:]
        ends[-1] = n
        starts_arr = pa.array(starts)
        k = len(starts)
        return pa.RecordBatch.from_arrays(
            [
                pa.array(np.full(k, pid, dtype=np.int64)),
                pc.take(term, starts_arr),
                pa.array(np.full(k, blk, dtype=np.int64)),
                pa.array((ends - starts).astype(np.int32)),
                pa.array(ids64[starts]),
                pa.array(ids64[ends - 1]),
                pa.array(np.maximum.reduceat(tfs64, starts).astype(np.int32)),
                pa.array(np.minimum.reduceat(dls64, starts).astype(np.int32)),
                pa.array(np.add.reduceat(tfs64, starts)),
                pa.array(
                    encode_postings_grouped(ids64, starts, ends),
                    type=pa.binary(),
                ),
                pa.array(
                    encode_varint_grouped(tfs64, starts, ends),
                    type=pa.binary(),
                ),
                pa.array(
                    encode_varint_grouped(dls64, starts, ends),
                    type=pa.binary(),
                ),
            ],
            schema=_BLOCK_PA_SCHEMA,
        )

    carry: pa.Table | None = None

    def group_cut(tbl: pa.Table) -> int:
        """Offset where the LAST (pid, blk) group starts."""
        pid = tbl.column("pid").to_numpy()
        blk = tbl.column("blk").to_numpy()
        n = len(pid)
        change = (pid[1:] != pid[:-1]) | (blk[1:] != blk[:-1])
        idx = np.flatnonzero(change)
        return int(idx[-1] + 1) if idx.size else 0

    def split_emit(tbl: pa.Table, upto: int):
        """Emit every complete group within tbl[:upto]."""
        pid = tbl.column("pid").to_numpy()[:upto]
        blk = tbl.column("blk").to_numpy()[:upto]
        change = np.empty(upto, dtype=bool)
        change[0] = True
        change[1:] = (pid[1:] != pid[:-1]) | (blk[1:] != blk[:-1])
        starts = np.flatnonzero(change)
        ends = np.empty_like(starts)
        ends[:-1] = starts[1:]
        ends[-1] = upto
        for s, e in zip(starts, ends):
            out = emit_group(tbl.slice(int(s), int(e - s)))
            if out is not None:
                yield out

    for batch in batches:
        tbl = pa.Table.from_batches([batch])
        if carry is not None:
            tbl = pa.concat_tables([carry, tbl])
        tbl = tbl.combine_chunks()
        if tbl.num_rows == 0:
            carry = None
            continue
        cut = group_cut(tbl)
        if cut > 0:
            yield from split_emit(tbl, cut)
        carry = tbl.slice(cut)
    if carry is not None and carry.num_rows:
        carry = carry.combine_chunks()
        yield from split_emit(carry, carry.num_rows)


def _with_pid(webtext: DataFrame, partition_seconds: int) -> DataFrame:
    psec_us = int(partition_seconds) * 1_000_000
    return webtext.withColumn("warc_us", F.unix_micros("warc_ts")).withColumn(
        "pid", F.floor(F.col("warc_us") / F.lit(psec_us))
    )


def _mint_ids(with_pid: DataFrame) -> DataFrame:
    """Dense time-ordered docIDs within each pid (MiruTimeIndex.nextId
    analog). The window serializes each pid into one task, so
    partition_seconds must keep a single pid's docmap task-sized (hourly
    at crawl scale); tokenization is re-parallelized downstream."""
    w = Window.partitionBy("pid").orderBy("warc_us", "url")
    return with_pid.withColumn("doc_id", F.row_number().over(w) - F.lit(1))


def _with_ids(webtext: DataFrame, partition_seconds: int) -> DataFrame:
    return _mint_ids(_with_pid(webtext, partition_seconds))


def _read_done_pids(spark: SparkSession, paths: IndexPaths) -> set[int]:
    if not os.path.exists(paths.lineage):
        return set()
    rows = (
        spark.read.parquet(paths.lineage)
        .filter(F.col("status") == "complete")
        .select("pid")
        .distinct()
        .collect()
    )
    return {r["pid"] for r in rows}


def _read_parquet_dir(spark: SparkSession, base: str) -> DataFrame:
    """Read a batch-subdir table (docmap/postings). Subdirs are commit
    units (`b_<tag>/`), committed by atomic rename -- the local-fs stand-in
    for an Iceberg snapshot commit."""
    return spark.read.option("recursiveFileLookup", "true").parquet(base)


def _valid_tags(spark: SparkSession, paths: IndexPaths) -> set[str]:
    if not os.path.exists(paths.lineage):
        return set()
    return {
        r["batch_tag"]
        for r in spark.read.parquet(paths.lineage)
        .filter(F.col("status") == "complete")
        .select("batch_tag")
        .distinct()
        .collect()
    }


def _cleanup_orphans(spark: SparkSession, paths: IndexPaths) -> None:
    """Remove batch dirs not committed to lineage (crash between rename
    and lineage write) and stray _tmp_ write dirs. Idempotent restart --
    the Iceberg-snapshot rollback analog."""
    valid = _valid_tags(spark, paths)
    for base in (paths.docmap, paths.postings):
        if not os.path.isdir(base):
            continue
        for d in os.listdir(base):
            full = os.path.join(base, d)
            if d.startswith("_tmp_"):
                shutil.rmtree(full, ignore_errors=True)
            elif d.startswith("b_") and d[2:] not in valid:
                shutil.rmtree(full, ignore_errors=True)


def _commit_write(df: DataFrame, base: str, tag: str, sort_cols: list[str]) -> None:
    """Write df sorted by sort_cols to base/_tmp_<tag>, then atomically
    rename to base/b_<tag>. One parquet writer per task (no dynamic
    partitioning fan-out), rows sorted so row-group min/max stats prune
    pid/term predicates at read time."""
    tmp = os.path.join(base, f"_tmp_{tag}")
    final = os.path.join(base, f"b_{tag}")
    if os.path.exists(final):
        shutil.rmtree(final)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    df.write.mode("overwrite").parquet(tmp)
    os.rename(tmp, final)


def build_index(
    spark: SparkSession,
    webtext: DataFrame,
    index_dir: str,
    partition_seconds: int = DEFAULT_PARTITION_SECONDS,
    block_span: int = DEFAULT_BLOCK_SPAN,
    batch_partitions: int | None = None,
    resume: bool = True,
    finalize: bool = True,
    shuffle_partitions: int | None = None,
    _fail_after_batches: int | None = None,
) -> BuildReport:
    """Build (or resume) the inverted index for a webtext DataFrame.

    `_fail_after_batches` is a test hook simulating a mid-build crash.
    """
    import json

    t0 = time.time()
    # the build's wide shuffle benefits from AQE (skew/coalesce); a prior
    # SearchEngine in this session may have turned it off for query latency
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    paths = IndexPaths(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    report = BuildReport()

    if not resume and os.path.exists(paths.lineage):
        shutil.rmtree(paths.lineage)

    meta_path = os.path.join(index_dir, "meta.json")
    meta = {
        "partition_seconds": int(partition_seconds),
        "block_span": int(block_span),
        "field": "text",
    }
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f)
        if resume and old != meta:
            raise ValueError(
                f"index meta mismatch: existing {old} vs requested {meta}"
            )
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    pid_df = _with_pid(webtext, partition_seconds)
    ids_df = _mint_ids(pid_df)

    # distinct pids off the pre-window frame: one narrow scan, no sort
    all_pids = sorted(
        r["pid"] for r in pid_df.select("pid").distinct().collect()
    )
    done = _read_done_pids(spark, paths) if resume else set()
    todo = [p for p in all_pids if p not in done]
    report.pids_skipped = [p for p in all_pids if p in done]
    if not todo:
        if finalize:
            finalize_index(spark, index_dir)
        report.wall_time_s = time.time() - t0
        return report

    _cleanup_orphans(spark, paths)

    nbatch = batch_partitions or len(todo)
    batches = [todo[i : i + nbatch] for i in range(0, len(todo), nbatch)]
    n_shuffle = shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )

    for bi, batch_pids in enumerate(batches):
        if _fail_after_batches is not None and bi >= _fail_after_batches:
            raise RuntimeError(
                f"simulated crash before batch {bi} (test hook)"
            )
        bt0 = time.time()
        tag = f"{bi:04d}_{int(batch_pids[0])}"
        sub = ids_df.filter(F.col("pid").isin([int(p) for p in batch_pids]))
        # ONE doc-granular shuffle: hash whole docs by (pid, blk) so every
        # doc-range block group lands intact on one task, sorted by doc_id.
        # Tokenize AND posting inversion then run inside Arrow workers with
        # no per-posting JVM rows at all -- the former explode shuffle put
        # ~87x the row count through Tungsten sort + Arrow transfer and was
        # memory-bandwidth-bound. blk doubles as the skew salt: stopword
        # postings split across doc-range blocks, so no reducer ever owns a
        # whole head term.
        parted = (
            sub.select("pid", "doc_id", "url", "warc_us", "lang", "text")
            .withColumn(
                "blk", (F.col("doc_id") / F.lit(int(block_span))).cast("long")
            )
            .repartition(n_shuffle, "pid", "blk")
            .sortWithinPartitions("pid", "blk", "doc_id")
            .select("pid", "blk", "doc_id", "url", "warc_us", "lang", "text")
        )
        tokenized = parted.mapInArrow(
            _tokenize_map, _TOKENIZED_SCHEMA
        ).persist()

        # docmap (forward-index keys + doc_len; the source table itself is
        # the forward index for stored fields -- MiruActivityIndex analog).
        # Plain files per batch dir: partitionBy(pid) would open one parquet
        # writer per (task, pid) -- ~40x the writers, and the resulting
        # buffer churn made GC dominate the stage at high core counts.
        _commit_write(
            tokenized.select("pid", "doc_id", "url", "warc_us", "doc_len"),
            paths.docmap,
            tag,
            ["pid", "doc_id"],
        )

        # invert + encode per (pid, blk) group in-worker: zero additional
        # shuffles (tokenized is already (pid, blk)-partitioned and sorted)
        blocks = (
            tokenized.select(
                "pid", "blk", "doc_id", "doc_len", "terms", "tfs"
            )
            .mapInArrow(_invert_encode_groups, _BLOCK_SCHEMA)
            .persist()
        )
        # blocks come out grouped by (pid, blk), terms sorted within each
        _commit_write(blocks, paths.postings, tag, ["pid", "term", "blk"])

        # lineage metrics from the cached blocks (no parquet re-read)
        sizes = {
            r["pid"]: (r["pbytes"], r["nterms"])
            for r in blocks.groupBy("pid")
            .agg(
                (
                    F.sum(F.length("ids_bin"))
                    + F.sum(F.length("tfs_bin"))
                    + F.sum(F.length("dls_bin"))
                ).alias("pbytes"),
                F.countDistinct("term").alias("nterms"),
            )
            .collect()
        }
        doc_counts = {
            r["pid"]: r["cnt"]
            for r in tokenized.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
        }
        wall_ms = int((time.time() - bt0) * 1000)
        lineage_rows = [
            (
                int(p),
                int(doc_counts.get(p, 0)),
                int(sizes.get(p, (0, 0))[0] or 0),
                int(sizes.get(p, (0, 0))[1] or 0),
                wall_ms,
                "complete",
                tag,
            )
            for p in batch_pids
        ]
        spark.createDataFrame(
            lineage_rows,
            "pid long, doc_count long, postings_bytes long, n_terms long, "
            "wall_time_ms long, status string, batch_tag string",
        ).write.mode("append").parquet(paths.lineage)

        blocks.unpersist()
        tokenized.unpersist()
        report.pids_built.extend(batch_pids)
        report.n_docs += sum(doc_counts.values())

    if finalize:
        finalize_index(spark, index_dir)
    report.wall_time_s = time.time() - t0
    return report


def finalize_index(spark: SparkSession, index_dir: str) -> None:
    """(Re)compute global stats + per-term stats. Idempotent overwrite.

    BM25 global stats: N, avgdl (exact), per-term df and collection term
    frequency -- the reference's global cardinality row at docId -1
    (LabFieldIndex.java:510-536).
    """
    paths = IndexPaths(index_dir)
    docmap = _read_parquet_dir(spark, paths.docmap)
    stats = docmap.agg(
        F.count("*").alias("n_docs"),
        (F.sum("doc_len") / F.count("*")).alias("avgdl"),
        F.sum("doc_len").alias("total_len"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(paths.stats)

    postings = _read_parquet_dir(spark, paths.postings)
    termstats = postings.groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("ctf").alias("ctf")
    )
    termstats.write.mode("overwrite").parquet(paths.termstats)
