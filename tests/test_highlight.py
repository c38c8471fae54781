"""Highlighting tests (LuceneBackedQueryParser.highlight analog,
miru-plugin/.../query/LuceneBackedQueryParser.java:56-74)."""

from miru_spark.query import highlight


CONTENT = (
    "The quick brown foxes were running through the garden. "
    + ("Nothing here matches at all in this span of text. " * 6)
    + "Foxes again appear running late in the document tail here."
)


def test_highlight_wraps_stemmed_matches():
    out = highlight("fox AND running", CONTENT, "en")
    assert "<b>foxes</b>" in out and "<b>running</b>" in out
    # never wraps non-matching tokens
    assert "<b>garden</b>" not in out and "<b>Nothing</b>" not in out


def test_highlight_selects_best_fragments_in_order():
    out = highlight("fox", CONTENT, "en", max_fragments=2)
    # both matching regions survive, in document order, joined by ellipsis
    assert out.index("<b>foxes</b>") < out.index("<b>Foxes</b>")
    assert " ... " in out
    # the all-filler middle fragments are dropped
    assert out.count("Nothing here matches") < 6


def test_highlight_custom_tags_and_preview():
    out = highlight("fox", CONTENT, "en", pre="[", post="]")
    assert "[foxes]" in out
    # preview cap: matches past the cap are never analyzed
    assert highlight("tail", CONTENT, "en", preview=50) is None


def test_highlight_no_match_returns_none():
    assert highlight("zebra", CONTENT, "en") is None
    assert highlight("the", CONTENT, "en") is None  # stopword-only query
    assert highlight("fox", "", "en") is None
    assert highlight("", CONTENT, "en") is None


def test_highlight_prefix_and_locale():
    assert "<b>foxes</b>" in highlight("fox*", CONTENT, "en")
    assert highlight("chevaux", "les chevaux du roi", "fr") == (
        "les <b>chevaux</b> du roi"
    )
    # negative-only terms never highlight
    out = highlight("fox AND NOT running", CONTENT, "en")
    assert "<b>running</b>" not in out and "<b>foxes</b>" in out


def test_search_returns_summaries(spark, tmp_path):
    """search(highlight_from=...) appends the per-result summary column
    (the reference returns a highlighted summary per result doc,
    LuceneBackedQueryParser.highlight:56-74 via FullTextCustomQuestion).
    Both query paths produce <b>-wrapped matched stems on real results."""
    from miru_spark.index.build import build_index
    from miru_spark.query.engine import SearchEngine
    from miru_spark.webtext import webtext_df

    index_dir = str(tmp_path / "hl_idx")
    wt = webtext_df(spark, 150, parallelism=4)
    build_index(spark, wt, index_dir, partition_seconds=3600, block_span=64)
    eng = SearchEngine(spark, index_dir)
    for local in (None, False):
        rows = eng.search(
            "w000001 AND w000004", k=5, local=local, highlight_from=wt
        ).collect()
        assert rows and "summary" in rows[0].asDict()
        for r in rows:
            assert "<b>w000001</b>" in r["summary"]
            assert "<b>w000004</b>" in r["summary"]
    # rank + scores identical with and without highlighting
    plain = eng.search("w000001 AND w000004", k=5).collect()
    lit = eng.search(
        "w000001 AND w000004", k=5, highlight_from=wt
    ).collect()
    assert [(r["pid"], r["doc_id"], r["score"]) for r in plain] == [
        (r["pid"], r["doc_id"], r["score"]) for r in lit
    ]
    # no matches -> empty frame still carries the summary column
    empty = eng.search("zzznope", k=5, highlight_from=wt)
    assert "summary" in empty.columns and empty.count() == 0
    eng.close()
