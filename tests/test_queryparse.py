"""Parser: Lucene-classic subset -> filter tree
(LuceneBackedQueryParser.java:48-144 semantics, default operator AND)."""

import pytest

from miru_spark.queryparse import (
    QueryParseError,
    all_referenced_terms,
    collect_terms,
    parse_query,
)


def test_single_term():
    assert parse_query("foo") == ("term", "foo")


def test_default_and():
    assert parse_query("foo bar") == ("and", [("term", "foo"), ("term", "bar")])


def test_explicit_and_or():
    assert parse_query("a AND b") == ("and", [("term", "a"), ("term", "b")])
    assert parse_query("a OR b") == ("or", [("term", "a"), ("term", "b")])


def test_precedence_or_binds_looser():
    assert parse_query("a AND b OR c") == (
        "or",
        [("and", [("term", "a"), ("term", "b")]), ("term", "c")],
    )


def test_parens():
    assert parse_query("a AND (b OR c)") == (
        "and",
        [("term", "a"), ("or", [("term", "b"), ("term", "c")])],
    )


def test_not_and_minus():
    want = ("not", ("term", "a"), ("term", "b"))
    assert parse_query("a AND NOT b") == want
    assert parse_query("a -b") == want


def test_multiple_nots_or_together():
    assert parse_query("a -b -c") == (
        "not",
        ("term", "a"),
        ("or", [("term", "b"), ("term", "c")]),
    )


def test_pure_not_matches_all_minus():
    assert parse_query("NOT b") == ("not", ("all",), ("term", "b"))


def test_prefix():
    assert parse_query("w0042*") == ("prefix", "w0042")


def test_lowercasing_via_analyzer():
    assert parse_query("FOO") == ("term", "foo")


def test_en_stopword_clause_omitted_like_lucene():
    # under the en analyzer "the" is a stopword; Lucene's QueryParser
    # omits the clause from the BooleanQuery under AND, OR and NOT alike
    assert parse_query("the AND fox", locale="en") == ("term", "fox")
    assert parse_query("fox OR the", locale="en") == ("term", "fox")
    assert parse_query("fox AND NOT the", locale="en") == ("term", "fox")
    assert parse_query("fox -the", locale="en") == ("term", "fox")
    assert parse_query("fox OR (the AND a)", locale="en") == ("term", "fox")


def test_all_clauses_dropped_raises_nothing_to_filter():
    # reference wrap() throws "Nothing to filter"
    # (LuceneBackedQueryParser.java:142) when every clause drops
    with pytest.raises(QueryParseError, match="Nothing to filter"):
        parse_query("the", locale="en")
    with pytest.raises(QueryParseError, match="Nothing to filter"):
        parse_query("the OR a", locale="en")
    with pytest.raises(QueryParseError, match="Nothing to filter"):
        parse_query('-"the"', locale="en")


def test_collect_terms():
    tree = parse_query("a AND (b OR c) -d")
    pos, prefixes, neg = collect_terms(tree)
    assert pos == {"a", "b", "c"}
    assert neg == {"d"}
    terms, pfx, franges = all_referenced_terms(tree)
    assert terms == {"a", "b", "c", "d"} and pfx == set() and franges == set()


# -- field terms + numeric ranges (MiruTermComposer analog) ---------------

def test_field_keyword_term():
    from miru_spark.fields import compose

    assert parse_query("lang:EN") == ("term", compose("lang", "en"))


def test_field_numeric_exact():
    from miru_spark.fields import compose, encode_num

    assert parse_query("site:42") == ("term", compose("site", encode_num(42)))


def test_field_numeric_range_bracket_and_dash():
    want = ("frange", "site", 3, 10)
    assert parse_query("site:[3 TO 10]") == want
    assert parse_query("site:3-10") == want  # reference `obj:1-100` shape


def test_field_range_combines_with_text():
    tree = parse_query("site:[3 TO 10] AND w000001")
    assert tree == ("and", [("frange", "site", 3, 10), ("term", "w000001")])
    pos, _, _ = collect_terms(tree)
    assert pos == {"w000001"}  # field constraints are filter-only
    terms, _, franges = all_referenced_terms(tree)
    assert terms == {"w000001"} and franges == {("frange", "site", 3, 10)}


def test_field_range_empty_and_errors():
    assert parse_query("site:[10 TO 3]") == ("none",)
    with pytest.raises(QueryParseError):
        parse_query("lang:[1 TO 2]")  # range on non-numeric field
    with pytest.raises(QueryParseError):
        parse_query("site:abc")  # non-numeric value for numeric field


def test_unbalanced_paren_raises():
    with pytest.raises(QueryParseError):
        parse_query("(a AND b")


def test_empty_query():
    assert parse_query("") == ("none",)


def test_quoted_single_term_collapses_to_term():
    # Lucene's QueryParser turns a 1-token "phrase" into a TermQuery
    # before makeFilter ever sees it
    assert parse_query('"Search"') == ("term", "search")
    assert parse_query('"searches"', locale="en") == ("term", "search")


def test_quoted_stopword_only_drops_clause():
    assert parse_query('"the" foo', locale="en") == ("term", "foo")


def test_quoted_multiterm_phrase_rejected_like_reference():
    # the reference's makeFilter throws "Unsupported query type" on
    # PhraseQuery (LuceneBackedQueryParser.java:108-110): no positions
    with pytest.raises(QueryParseError, match="Unsupported query type"):
        parse_query('"big data"')


def test_quoted_composes_with_boolean():
    assert parse_query('foo -"junk"', locale=None) == (
        "not",
        ("term", "foo"),
        ("term", "junk"),
    )


def test_field_prefix_composes():
    # field-scoped PrefixQuery: same dictionary range-scan machinery as
    # text wildcards, composed into the field's term space
    assert parse_query("lang:d*") == ("prefix", "lang\x1fd")
    assert parse_query("lang:D*") == ("prefix", "lang\x1fd")


def test_field_prefix_filter_only_never_scores():
    pos_t, pos_p, neg_t = collect_terms(parse_query("foo AND lang:d*"))
    assert pos_t == {"foo"} and pos_p == set() and neg_t == set()


def test_field_prefix_numeric_and_bare_star_rejected():
    with pytest.raises(QueryParseError, match="numeric"):
        parse_query("doclen:1*")
    with pytest.raises(QueryParseError, match="Unsupported query type"):
        parse_query("lang:*")


def test_field_group_distributes():
    from miru_spark.fields import compose

    assert parse_query("lang:(de OR fr)") == (
        "or",
        [("term", compose("lang", "de")), ("term", compose("lang", "fr"))],
    )
    assert parse_query("lang:(DE fr)") == (
        "and",
        [("term", compose("lang", "de")), ("term", compose("lang", "fr"))],
    )
    assert parse_query("lang:(de -fr)") == (
        "not",
        ("term", compose("lang", "de")),
        ("term", compose("lang", "fr")),
    )


def test_field_group_numeric_and_ranges():
    assert parse_query("site:([1 TO 3] OR 7)") == (
        "or",
        [("frange", "site", 1, 3), parse_query("site:7")],
    )
    assert parse_query("site:(1-3 OR 9-12)") == (
        "or",
        [("frange", "site", 1, 3), ("frange", "site", 9, 12)],
    )


def test_field_group_prefix_and_quoted():
    from miru_spark.fields import compose

    assert parse_query("lang:(d* OR sv)") == (
        "or",
        [("prefix", compose("lang", "d")), ("term", compose("lang", "sv"))],
    )
    assert parse_query('lang:("de")') == ("term", compose("lang", "de"))


def test_field_group_values_not_stemmed():
    from miru_spark.fields import compose

    # 'searches' under en would stem to 'search' as a text term; as a
    # field VALUE it stays raw
    assert parse_query("lang:(searches)", locale="en") == (
        "term", compose("lang", "searches")
    )


def test_field_group_errors():
    with pytest.raises(QueryParseError, match="nested"):
        parse_query("lang:(de lang:fr)")
    with pytest.raises(QueryParseError, match="nested"):
        parse_query("lang:(site:(1))")
    with pytest.raises(QueryParseError, match="unbalanced"):
        parse_query("lang:(de OR fr")
    with pytest.raises(QueryParseError, match="outside a field"):
        parse_query("[1 TO 3]")


def test_field_group_composes_with_text():
    tree = parse_query("w000001 AND lang:(de OR fr)")
    pos, prefixes, neg = collect_terms(tree)
    assert pos == {"w000001"} and prefixes == set() and neg == set()


def test_unsupported_lucene_syntax_rejected():
    # the reference's makeFilter throws on FuzzyQuery/BoostQuery/
    # WildcardQuery; silently analyzing the operators away would return
    # different results than the reference errors on
    for q in ["foo~", "foo~2", "foo^2", "te*m", "*foo", "te*m*",
              "lang:de~", "lang:d^2", "lang:d*e", "lang:(de~)"]:
        with pytest.raises(QueryParseError, match="Unsupported query type"):
            parse_query(q)
