#!/usr/bin/env python
"""Measure the r5 term-skipping levers on a wide-value 1M-doc corpus.

Two levers (VERDICT r4 #4; reference analog LabFieldIndex.multiTxIndex
considerIfLastIdGreaterThanN, LabFieldIndex.java:339-419):

1. `min_value_df` -- the EXPLICIT df floor on plugin facet walks
   (gather_features / reco / strut). Default 0 is exact; the floor
   skips long-tail values before their postings are fetched.
2. the always-on kernel block recency prune -- a time-ranged question
   drops posting blocks whose docID span misses the resolved bounds
   BEFORE varint decode (results identical by construction, pinned by
   tests/test_review_fixes_r5.py).

Corpus: deterministic webtext + a skewed wide `tag` dimension (80% of
values from a 97-value head, 20% from a 50k-value tail -- the shape of
a real `site`/`user` facet) and reco dims (`user`, `parent`).

    PROFILE_DOCS=1000000 PROFILE_CPUS=32 python scripts/profile_termskip.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("PROFILE_DOCS", "1000000"))
CPUS = int(os.environ.get("PROFILE_CPUS", "32"))
INDEX = os.environ.get(
    "PROFILE_TERMSKIP_INDEX", f"/tmp/miru_termskip_{N}"
)


def main() -> None:
    from pyspark.sql import functions as F

    from miru_spark.index.build import build_index
    from miru_spark.query.engine import SearchEngine
    from miru_spark.session import get_spark
    from miru_spark.webtext import webtext_df

    spark = get_spark(
        app_name="termskip",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        extra_conf={"spark.driver.memory": "24g"},
    )
    if not os.path.exists(os.path.join(INDEX, "meta.json")):
        i = F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long")
        # skewed wide tag: head value for 80% of draws, 50k tail else
        def tag(j):
            d = i * 3 + j
            return F.when(
                d % 5 < 4, F.format_string("h%02d", d % 97)
            ).otherwise(F.format_string("t%05d", d % 50000))

        wt = webtext_df(spark, N).withColumn(
            "fields",
            F.create_map(
                F.lit("tag"), F.array(tag(0), tag(1), tag(2)),
                F.lit("stream"), F.array((i % 7).cast("string")),
                F.lit("user"),
                F.array(F.format_string("u%04d", i % 5000)),
                F.lit("parent"),
                F.array(
                    F.when(
                        i % 5 < 4,
                        F.format_string("p%02d", (i * 7) % 89),
                    ).otherwise(
                        F.format_string("q%05d", (i * 7) % 40000)
                    )
                ),
            ),
        )
        t0 = time.time()
        build_index(
            spark, wt, INDEX,
            partition_seconds=3600, block_span=512,
            shuffle_partitions=CPUS,
            extra_fields=["tag", "stream", "user", "parent"],
        )
        print(f"build {N} docs: {time.time() - t0:.1f}s", flush=True)
    eng = SearchEngine(spark, INDEX).cache()
    eng.search_collect("w000001", k=10, local=False)  # warm

    def timed(label, fn, reps=3):
        best = []
        for _ in range(reps):
            t = time.time()
            r = fn()
            best.append(time.time() - t)
        best.sort()
        med = best[len(best) // 2]
        size = len(r) if hasattr(r, "__len__") else r
        print(f"{label:44s} {med:8.2f}s  (n={size})", flush=True)
        return med

    out = {}
    nvals = len(eng.field_terms("tag"))
    nfloor = len(eng.field_terms("tag", min_df=50))
    print(f"tag values: {nvals} total, {nfloor} at df>=50", flush=True)
    out["features_exact"] = timed(
        "gather_features(tag,stream) exact",
        lambda: eng.gather_features(("tag", "stream"), local=False),
    )
    out["features_floor"] = timed(
        "gather_features(tag,stream) min_value_df=50",
        lambda: eng.gather_features(
            ("tag", "stream"), local=False, min_value_df=50
        ),
    )
    out["reco_exact"] = timed(
        "reco(user u0042 -> parent) exact",
        lambda: eng.reco(("user", "u0042"), "parent", "user", "parent",
                         k=10, local=False),
    )
    out["reco_floor"] = timed(
        "reco(user u0042 -> parent) min_value_df=20",
        lambda: eng.reco(("user", "u0042"), "parent", "user", "parent",
                         k=10, local=False, min_value_df=20),
    )
    out["strut_exact"] = timed(
        "strut(parent; tag-feature) exact",
        lambda: eng.strut(
            "parent", [(1.0, ("tag",))], k=10, local=False
        ),
    )
    out["strut_floor"] = timed(
        "strut(parent; tag-feature) min_value_df=50",
        lambda: eng.strut(
            "parent", [(1.0, ("tag",))], k=10, local=False,
            min_value_df=50,
        ),
    )
    # block recency prune: identical op, 10% trailing time range
    t_lo = eng.docmap.agg(F.min("warc_us")).collect()[0][0]
    t_hi = eng.docmap.agg(F.max("warc_us")).collect()[0][0]
    cut = t_hi - (t_hi - t_lo) // 10
    out["features_timerange"] = timed(
        "gather_features 10% trailing time range",
        lambda: eng.gather_features(
            ("tag", "stream"), local=False, time_range_us=(cut, t_hi)
        ),
    )
    out["distincts_exact"] = timed(
        "distincts(tag) streamed, match-all",
        lambda: eng.distincts("tag", None, local=False),
    )
    out["distincts_timerange"] = timed(
        "distincts(tag) 10% trailing time range",
        lambda: eng.distincts(
            "tag", None, local=False, time_range_us=(cut, t_hi)
        ),
    )
    print(json.dumps({"n_docs": N, "cpus": CPUS, **out}))


if __name__ == "__main__":
    main()
