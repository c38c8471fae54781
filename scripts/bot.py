"""mirubot CLI: run the write/read consistency bot against a scratch
index (miru-bot-deployable's distincts/uniques workers as one loop).

    python scripts/bot.py --workdir /tmp/mirubot --waves 5 --docs 50

Exit code 0 iff every stated value read back (health 1.0). One JSON
report line per run."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--waves", type=int, default=3)
    ap.add_argument("--docs", type=int, default=30)
    ap.add_argument("--fields", type=int, default=4)
    ap.add_argument("--value-size", type=int, default=8)
    ap.add_argument("--birth-rate", type=int, default=4)
    ap.add_argument("--seed-count", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpus", type=int, default=4)
    args = ap.parse_args()

    from miru_spark.bot import run_bot
    from miru_spark.session import get_spark

    spark = get_spark(
        app_name="mirubot",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(2, args.cpus),
    )
    try:
        report = run_bot(
            spark,
            args.workdir,
            waves=args.waves,
            docs_per_wave=args.docs,
            n_fields=args.fields,
            value_size_factor=args.value_size,
            birth_rate_factor=args.birth_rate,
            seed_count=args.seed_count,
            seed=args.seed,
        )
    finally:
        spark.stop()
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
