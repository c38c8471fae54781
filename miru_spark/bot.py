"""mirubot: the self-verifying write/read consistency bot.

Reference analog (behavior only): miru-bot-deployable --
`MiruBotBucket.java` generates a tenant schema of N singleTerm fields
and a bucket of random stated values; `StatedMiruValueWriter.java`
writes waves of activities drawn from the bucket (existing values plus
birth-rate newborns); `MiruBotDistinctsWorker.java:108-190` then reads
distincts per field over a recent time range and marks every tracked
value READ_SUCCESS / READ_FAIL depending on whether the index returned
it; `MiruBotUniquesWorker.java` does the same through the uniques
plugin, and `MiruBotHealthPercent.java` turns the state tally into the
deployable's health gauge.

Here the ingress is the real incremental pipeline (parquet feed dir ->
`sip_build` -> commit units) and the reads are the real engine
(`SearchEngine.distincts/uniques`), so one bot run exercises the full
write -> index -> read consistency loop the reference bot exists to
police: values written in wave k must be readable after wave k's sip,
and values never written must not appear.

Determinism: the bucket takes an explicit RNG seed and the wave clock
is a fixed epoch + wave offset, so a bot run is replayable bit-for-bit
(the reference uses wall clock + Random(); a replayable bot is the
test-friendly rendering of the same loop).
"""

from __future__ import annotations

import random
import string
from typing import Any

WRITTEN = "WRITTEN"
READ_SUCCESS = "READ_SUCCESS"
READ_FAIL = "READ_FAIL"

T0_US = 1704067200_000_000  # 2024-01-01T00:00:00Z in micros

_DOC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string,"
    "lang string, fields map<string,array<string>>"
)


class MiruBotBucket:
    """The stated-value bucket: per-field sets of generated values with
    a read state (MiruBotBucket.java:26-47, StatedMiruValue.java)."""

    def __init__(
        self,
        n_fields: int = 4,
        value_size_factor: int = 8,
        birth_rate_factor: int = 4,
        seed: int = 0,
    ):
        self.fields = [f"field{i}" for i in range(n_fields)]
        self.value_size_factor = max(1, int(value_size_factor))
        self.birth_rate_factor = max(1, int(birth_rate_factor))
        self.rand = random.Random(seed)
        # field -> {value: state}
        self.values: dict[str, dict[str, str]] = {
            f: {} for f in self.fields
        }

    def birth(self, field: str) -> str:
        """Mint a new value for a field (birthNewFieldValue)."""
        n = 1 + self.rand.randrange(self.value_size_factor)
        while True:
            v = "".join(
                self.rand.choice(string.ascii_lowercase) for _ in range(n)
            )
            if v not in self.values[field]:
                self.values[field][v] = WRITTEN
                return v

    def seed_docs(self, count: int) -> list[dict[str, Any]]:
        """Seed `count` values per field AND the activities that write
        them (MiruBotBucket.seed returns the seeded activities, which
        the worker writes before the wave loop starts)."""
        seeded = [
            {f: self.birth(f) for f in self.fields} for _ in range(count)
        ]
        return [
            {
                "url": f"bot://seed/doc{j}",
                "ts_us": T0_US + j * 1_000,
                "fields": fv,
            }
            for j, fv in enumerate(seeded)
        ]

    def pick(self, field: str) -> str:
        """An existing value, or a newborn at the birth rate."""
        pool = list(self.values[field])
        if not pool or self.rand.randrange(self.birth_rate_factor) == 0:
            return self.birth(field)
        return self.rand.choice(pool)

    def next_wave(
        self, wave: int, n_docs: int, wave_seconds: int = 3600
    ) -> list[dict[str, Any]]:
        """Generate one write wave: each activity takes one value per
        field (StatedMiruValueWriter.writeAll)."""
        t0 = T0_US + wave * wave_seconds * 1_000_000
        docs = []
        for j in range(n_docs):
            fv = {f: self.pick(f) for f in self.fields}
            docs.append(
                {
                    "url": f"bot://wave{wave}/doc{j}",
                    "ts_us": t0 + j * 1_000_000,
                    "fields": fv,
                }
            )
        return docs

    def health(self) -> float:
        """Fraction of stated values READ_SUCCESS
        (MiruBotHealthPercent)."""
        states = [s for d in self.values.values() for s in d.values()]
        if not states:
            return 1.0
        return sum(1 for s in states if s == READ_SUCCESS) / len(states)


def _write_wave(spark, feed_dir: str, docs: list[dict]) -> None:
    from datetime import datetime, timezone

    rows = [
        (
            d["url"],
            datetime.fromtimestamp(d["ts_us"] / 1e6, tz=timezone.utc),
            None,
            " ".join(d["fields"].values()),
            "und",
            {k: [v] for k, v in d["fields"].items()},
        )
        for d in docs
    ]
    spark.createDataFrame(rows, _DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(feed_dir)


def run_bot(
    spark,
    workdir: str,
    waves: int = 3,
    docs_per_wave: int = 30,
    n_fields: int = 4,
    value_size_factor: int = 8,
    birth_rate_factor: int = 4,
    seed_count: int = 5,
    seed: int = 0,
    wave_seconds: int = 3600,
) -> dict[str, Any]:
    """Run the bot loop: write a wave through sip_build, re-open the
    engine, verify per-field distincts + uniques, tally health.

    The read checks per wave (MiruBotDistinctsWorker.java:130-190):
    - full-range distincts of each field must return EXACTLY the
      bucket's stated values (missing -> READ_FAIL; an extra value the
      bot never wrote is tracked READ_FAIL like the reference's
      addFieldValue(..., READ_FAIL) for unmatched miru values);
    - uniques(field) must equal the distincts cardinality;
    - wave-scoped: distincts restricted to THIS wave's time range must
      equal the values this wave's activities carried (the reference's
      readTimeRange check, bounded to the freshest writes).
    """
    import os

    from .query.engine import SearchEngine
    from .streaming.sip import sip_build

    feed = os.path.join(workdir, "feed")
    idx = os.path.join(workdir, "idx")
    ckpt = os.path.join(workdir, "ckpt")

    bucket = MiruBotBucket(
        n_fields, value_size_factor, birth_rate_factor, seed
    )
    seeds = bucket.seed_docs(seed_count) if seed_count else []

    report: dict[str, Any] = {"waves": [], "failures": []}
    for w in range(waves):
        docs = bucket.next_wave(w, docs_per_wave, wave_seconds)
        if w == 0 and seeds:
            # seed activities ride the first wave's write (the worker
            # writes them once before the loop; same pid here -- the
            # seed timestamps sit at the head of wave 0's hour)
            docs = seeds + docs
        _write_wave(spark, feed, docs)
        reps = sip_build(
            spark, feed, idx, ckpt,
            partition_seconds=wave_seconds, block_span=64,
            schema=_DOC_SCHEMA, transform=lambda df: df,
            extra_fields=bucket.fields,
        )
        n_indexed = sum(r["n_docs"] for r in reps)

        eng = SearchEngine(spark, idx)
        try:
            wave_fail = 0
            for f in bucket.fields:
                got = {v for v, _ in eng.distincts(f)}
                stated = bucket.values[f]
                # stated values the index failed to return
                for v in stated:
                    if v in got:
                        stated[v] = READ_SUCCESS
                    else:
                        stated[v] = READ_FAIL
                        wave_fail += 1
                        report["failures"].append(
                            {"wave": w, "field": f, "value": v,
                             "kind": "missing"}
                        )
                # values the index returned that were never stated
                for v in got - set(stated):
                    stated[v] = READ_FAIL
                    wave_fail += 1
                    report["failures"].append(
                        {"wave": w, "field": f, "value": v,
                         "kind": "unexpected"}
                    )
                # uniques plugin agrees with the distincts cardinality
                nu = eng.uniques(f)
                if nu != len(got):
                    wave_fail += 1
                    report["failures"].append(
                        {"wave": w, "field": f, "kind": "uniques",
                         "uniques": nu, "distincts": len(got)}
                    )
                # freshest-writes check: this wave's time slice
                lo = T0_US + w * wave_seconds * 1_000_000
                hi = lo + wave_seconds * 1_000_000 - 1
                got_w = {
                    v for v, _ in eng.distincts(f, time_range_us=(lo, hi))
                }
                want_w = {d["fields"][f] for d in docs}
                if got_w != want_w:
                    wave_fail += 1
                    report["failures"].append(
                        {"wave": w, "field": f, "kind": "time_range",
                         "missing": sorted(want_w - got_w),
                         "unexpected": sorted(got_w - want_w)}
                    )
            report["waves"].append(
                {
                    "wave": w,
                    "n_docs": n_indexed,
                    "n_stated": sum(
                        len(d) for d in bucket.values.values()
                    ),
                    "failures": wave_fail,
                    "health": bucket.health(),
                }
            )
        finally:
            eng.close()

    report["health"] = bucket.health()
    report["ok"] = not report["failures"]
    return report
