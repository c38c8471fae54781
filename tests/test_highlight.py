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
