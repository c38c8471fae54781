#!/usr/bin/env python
"""Profile cold vs warm serving-node queries against an existing 6M index.

    PROFILE_INDEX=/tmp/miru_6m_idx python scripts/profile_query_6m.py
"""
from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INDEX = os.environ.get("PROFILE_INDEX", "/tmp/miru_6m_idx")
CPUS = int(os.environ.get("PROFILE_CPUS", "32"))

QUERIES = [
    "w000001 AND w000004",
    "w000001 OR w000009 OR w000011",
    "w000013 AND w000017 AND NOT w000002",
]


def main() -> None:
    from miru_spark.query.engine import SearchEngine
    from miru_spark.session import get_spark

    spark = get_spark(
        app_name="profq6m",
        master=f"local[{CPUS}]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "32g"},
    )
    t0 = time.time()
    eng = SearchEngine(spark, INDEX)
    print(f"engine init: {time.time() - t0:.2f}s", flush=True)

    for q in QUERIES:
        # fresh cache per cold measurement
        with eng._post_cache_lock:
            eng._post_cache.clear()
            eng._post_cache_entries = 0
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        rows = eng.search_collect(q, k=10)
        pr.disable()
        cold = time.time() - t0
        t0 = time.time()
        rows2 = eng.search_collect(q, k=10)
        warm = time.time() - t0
        print(f"\n=== {q!r}: cold {cold*1000:.0f} ms, warm {warm*1000:.0f} ms, "
              f"{len(rows)} rows", flush=True)
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(18)
        print("\n".join(s.getvalue().splitlines()[4:30]), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
