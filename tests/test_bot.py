"""mirubot (miru_spark/bot.py): the write/read consistency bot over the
real sip -> index -> engine loop (miru-bot-deployable's distincts and
uniques workers)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miru_spark.bot import READ_SUCCESS, MiruBotBucket, run_bot


def test_bucket_is_deterministic_and_tracks_state():
    a = MiruBotBucket(n_fields=3, seed=7)
    b = MiruBotBucket(n_fields=3, seed=7)
    sa, sb = a.seed_docs(4), b.seed_docs(4)
    assert sa == sb
    wa, wb = a.next_wave(0, 10), b.next_wave(0, 10)
    assert wa == wb
    assert a.values == b.values
    # every value a wave doc carries is stated in the bucket
    for d in sa + wa:
        for f, v in d["fields"].items():
            assert v in a.values[f]
    # health counts READ_SUCCESS fraction
    assert a.health() == 0.0
    for f in a.fields:
        for v in a.values[f]:
            a.values[f][v] = READ_SUCCESS
    assert a.health() == 1.0


def test_bot_run_is_healthy(spark, tmp_path):
    """Three write waves through sip_build; every stated value must
    read back via distincts and uniques, full-range and wave-scoped."""
    report = run_bot(
        spark, str(tmp_path), waves=3, docs_per_wave=25,
        n_fields=3, seed_count=4, seed=42,
    )
    assert report["ok"], report["failures"]
    assert report["health"] == 1.0
    assert len(report["waves"]) == 3
    # wave 0 indexed the seeds too
    assert report["waves"][0]["n_docs"] == 25 + 4
    assert report["waves"][1]["n_docs"] == 25
    # the bucket grew across waves (birth rate mints new values)
    assert (
        report["waves"][2]["n_stated"] > report["waves"][0]["n_stated"]
    )


def test_bot_detects_missing_value(spark, tmp_path):
    """A value stated but never written must surface as a READ_FAIL --
    the condition the bot exists to detect (a lost write)."""
    from miru_spark.query.engine import SearchEngine
    from miru_spark.streaming.sip import sip_build

    import miru_spark.bot as bot_mod

    # run one wave normally, then tamper: state a value the index
    # never saw, re-run the verification by invoking run_bot with a
    # monkeypatched bucket factory
    class TamperedBucket(MiruBotBucket):
        def next_wave(self, wave, n_docs, wave_seconds=3600):
            docs = super().next_wave(wave, n_docs, wave_seconds)
            if wave == 0:
                # stated, never carried by any activity
                self.values[self.fields[0]]["neverwritten"] = "WRITTEN"
            return docs

    orig = bot_mod.MiruBotBucket
    bot_mod.MiruBotBucket = TamperedBucket
    try:
        report = run_bot(
            spark, str(tmp_path), waves=1, docs_per_wave=10,
            n_fields=2, seed_count=2, seed=1,
        )
    finally:
        bot_mod.MiruBotBucket = orig
    assert not report["ok"]
    kinds = {f["kind"] for f in report["failures"]}
    assert "missing" in kinds
    missing = [f for f in report["failures"] if f["kind"] == "missing"]
    assert missing[0]["value"] == "neverwritten"
    assert report["health"] < 1.0
