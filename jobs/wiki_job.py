#!/usr/bin/env python
"""spark-submit entry point: the wiki-miru pipeline (WikiMiruIndexService
analog -- wiki-miru-deployable WikiMiruIndexService.java:180-420: pages ->
topics + grams + indexed activities).

Usage:
    spark-submit --py-files miru_spark.zip jobs/wiki_job.py \
        --docs /path/to/documents_parquet --out /path/to/wiki_out \
        [--index] [--max-phrase-len 4] [--top-n 5] [--typeahead PREFIX]

Writes `<out>/topics` (per-doc topic rows) and `<out>/grams` (the
typeahead gram table) as parquet; `--index` additionally builds the wiki
graph-schema inverted index (topics included as a `topic` field) under
`<out>/index`. `--typeahead PREFIX` prints the top suggestions for a
prefix from the freshly written gram table. Prints ONE JSON report line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True,
                    help="parquet path with (doc_id, text, ...) rows")
    ap.add_argument("--out", required=True)
    ap.add_argument("--index", action="store_true")
    ap.add_argument("--max-phrase-len", type=int, default=4)
    ap.add_argument("--top-n", type=int, default=5)
    ap.add_argument("--typeahead", default=None)
    ap.add_argument("--partition-seconds", type=int, default=10**9)
    args = ap.parse_args()

    from miru_spark.session import get_spark
    from miru_spark.ops.wikitopics import (
        WIKI_TOPIC_FIELDS,
        topics_frame,
        typeahead,
        wiki_documents_with_topics,
        wiki_grams,
    )

    spark = get_spark(app_name="miru_wiki_job")
    t0 = time.time()
    docs = spark.read.parquet(args.docs)
    tps = topics_frame(
        docs, max_phrase_len=args.max_phrase_len, top_n=args.top_n
    )
    topics_path = os.path.join(args.out, "topics")
    tps.write.mode("overwrite").parquet(topics_path)
    tps = spark.read.parquet(topics_path)  # reuse, don't re-extract
    grams_path = os.path.join(args.out, "grams")
    wiki_grams(tps).write.mode("overwrite").parquet(grams_path)

    report = {
        "docs": docs.count(),
        "topic_rows": tps.count(),
        "grams": spark.read.parquet(grams_path).count(),
        "topics_path": topics_path,
        "grams_path": grams_path,
    }

    if args.index:
        from miru_spark.index.build import build_index

        sf_dir = os.path.dirname(args.docs.rstrip("/"))
        wt = wiki_documents_with_topics(
            spark, sf_dir,
            max_phrase_len=args.max_phrase_len, top_n=args.top_n,
        )
        idx_dir = os.path.join(args.out, "index")
        rep = build_index(
            spark, wt, idx_dir,
            partition_seconds=args.partition_seconds,
            block_span=512,
            extra_fields=WIKI_TOPIC_FIELDS,
        )
        report["index_dir"] = idx_dir
        report["pids_built"] = len(rep.pids_built)

    if args.typeahead is not None:
        sugg = typeahead(
            spark.read.parquet(grams_path), args.typeahead, k=10
        ).collect()
        report["typeahead"] = [
            {"topic": r["topic"], "n_docs": r["n_docs"]} for r in sugg
        ]

    report["wall_sec"] = round(time.time() - t0, 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
