"""Lucene-classic-subset query parser -> filter tree.

Re-expresses the reference's LuceneBackedQueryParser
(miru-plugin/.../query/LuceneBackedQueryParser.java:48-144): default
operator AND (:51), TermQuery -> and[term], PrefixQuery -> wildcard term,
BooleanQuery MUST/SHOULD/MUST_NOT -> and/or/pButNotQ trees
(MiruFilterOperation.java:179-192 -- `and`, `or`, `pButNotQ` are the only
filter ops the reference implements).

Tree nodes (plain tuples, picklable for broadcast into UDFs):
    ("term", t)            -- analyzed term (or a composed field term,
                              `field\\x1fvalue` -- filter-only, never scored)
    ("phrase", ((t, p), ...)) -- positional phrase (only when the parser is
                              invoked with allow_phrases=True, i.e. the
                              index was built with positions=True; the
                              reference rejects PhraseQuery because its
                              index stores no positions,
                              LuceneBackedQueryParser.java:108-110). Each
                              member carries its position in the analyzed
                              stream, so stopword gaps stay gaps ("kick
                              the ball" under `en` = kick@0, ball@2).
                              Matches docs where every member occurs at
                              its relative offset; members score like
                              ordinary positive terms (phrase = AND +
                              adjacency filter)
    ("prefix", p)          -- wildcard `p*` (MiruAggregateUtil.java:1154-1167)
    ("frange", f, lo, hi)  -- numeric range `f:[lo TO hi]` / `f:lo-hi` over
                              an order-preserving-encoded numeric field
                              (MiruTermComposer.java:130-141 rawRange);
                              expands to a term-dictionary range scan,
                              filter-only
    ("and", [nodes...])
    ("or", [nodes...])
    ("not", pos_node, neg_node)   -- pButNotQ: pos AND NOT neg
    ("all",)               -- match-everything (inclusiveFilter base,
                              MiruFilter.java:18)
    ("dropped",)           -- parser-internal only: a clause the analyzer
                              eliminated entirely (stopword-only word or
                              quote). Lucene's QueryParser omits such
                              clauses from the BooleanQuery, so every
                              combiner filters this sentinel out (under
                              AND, OR and NOT alike); it never appears in
                              a returned tree -- a query that analyzes to
                              nothing raises, like the reference's
                              wrap() "Nothing to filter"
                              (LuceneBackedQueryParser.java:142)
    ("none",)              -- match-nothing (empty AND operand short-circuit,
                              MiruAggregateUtil.java:1175-1177)
"""

from __future__ import annotations

import re

from .analyzer import analyze, analyze_positions
from .fields import FIELD_SEP, NUMERIC_FIELDS, compose, compose_value

_TOKEN_SPEC = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<and>AND\b)
      | (?P<or>OR\b)
      | (?P<not>NOT\b)
      | (?P<minus>-)
      | (?P<quoted>"[^"]*")
      | (?P<fieldgroup>[A-Za-z_][A-Za-z0-9_]*:\()
      | (?P<fieldphrase>[A-Za-z_][A-Za-z0-9_]*:"[^"]*")
      | (?P<fieldexpr>[A-Za-z_][A-Za-z0-9_]*:(?:\[[^\]]*\]|[^\s()]+))
      | (?P<bracket>\[[^\]]*\])
      | (?P<word>[^\s()\-][^\s()]*)
    )""",
    re.VERBOSE,
)

_RANGE_BRACKET = re.compile(r"^(-?\d+)\s+TO\s+(-?\d+)$", re.IGNORECASE)
_RANGE_DASH = re.compile(r"^(\d+)-(\d+)$")


class QueryParseError(ValueError):
    pass


def _reject_unsupported_syntax(val: str) -> None:
    """Lucene-classic syntax the reference's makeFilter throws
    'Unsupported query type' on (LuceneBackedQueryParser.java:108-110):
    FuzzyQuery (~), BoostQuery (^). Failing loudly beats silently
    analyzing the operator characters away."""
    if "~" in val:
        raise QueryParseError(f"Unsupported query type: fuzzy {val!r}")
    if "^" in val:
        raise QueryParseError(f"Unsupported query type: boost {val!r}")


def _lex(q: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_SPEC.match(q, pos)
        if not m:
            rest = q[pos:].strip()
            if not rest:
                break
            raise QueryParseError(f"cannot lex query at: {rest!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind:
            out.append((kind, m.group(kind)))
    return out


class _Parser:
    def __init__(
        self,
        tokens: list[tuple[str, str]],
        locale: str | None,
        allow_phrases: bool = False,
        use_stopwords: bool = True,
    ):
        self.toks = tokens
        self.i = 0
        self.locale = locale
        self.use_stopwords = use_stopwords
        self.allow_phrases = allow_phrases
        self._fields: list[str] = []  # enclosing field-group context

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse_expr(self):
        node = self.parse_and_list()
        parts = [node]
        while self.peek()[0] == "or":
            self.next()
            parts.append(self.parse_and_list())
        live = [p for p in parts if p != ("dropped",)]
        if not live:
            return ("dropped",)
        if len(live) == 1:
            return live[0]
        return ("or", live)

    def parse_and_list(self):
        pos, neg = [], []
        while True:
            kind, _ = self.peek()
            if kind in (None, "rparen", "or"):
                break
            if kind == "and":
                self.next()
                continue
            if kind in ("not", "minus"):
                self.next()
                neg.append(self.parse_atom())
            else:
                pos.append(self.parse_atom())
        if not pos and not neg:
            raise QueryParseError("empty clause")
        pos = [p for p in pos if p != ("dropped",)]
        neg = [n for n in neg if n != ("dropped",)]
        if not pos and not neg:
            return ("dropped",)
        pos = [p for p in pos if p != ("all",)]
        if any(p == ("none",) for p in pos):
            pos_node = ("none",)
        elif not pos:
            pos_node = ("all",)
        elif len(pos) == 1:
            pos_node = pos[0]
        else:
            pos_node = ("and", pos)
        neg = [n for n in neg if n != ("none",)]
        if not neg:
            return pos_node
        neg_node = neg[0] if len(neg) == 1 else ("or", neg)
        return ("not", pos_node, neg_node)

    def _field_atom(self, field: str, rest: str):
        """One value under a field: range bracket / dash shorthand,
        prefix star, numeric or keyword term -- shared by `field:value`
        and the values inside a `field:(...)` group."""
        _reject_unsupported_syntax(rest)
        if "*" in rest[:-1]:
            raise QueryParseError(
                f"Unsupported query type: wildcard {field}:{rest!r} "
                f"(only trailing-star PrefixQuery, like the reference)"
            )
        if rest.startswith("[") and rest.endswith("]"):
            m = _RANGE_BRACKET.match(rest[1:-1].strip())
            if not m:
                raise QueryParseError(f"bad range syntax: {field}:{rest!r}")
            if field not in NUMERIC_FIELDS:
                raise QueryParseError(f"range on non-numeric field: {field}")
            lo, hi = int(m.group(1)), int(m.group(2))
            if lo > hi:
                return ("none",)
            return ("frange", field, lo, hi)
        if rest.endswith("*"):
            # field-scoped PrefixQuery (the reference composes it as
            # MiruValue(text, "*") over the field's term space,
            # LuceneBackedQueryParser.java:102-107); expansion is the
            # same dictionary range scan as text wildcards, composed
            # terms share the posting dictionary
            if rest == "*":
                raise QueryParseError(
                    f"Unsupported query type: wildcard {field}:{rest!r}"
                )
            if field in NUMERIC_FIELDS:
                raise QueryParseError(
                    f"prefix on numeric field {field!r}: use a range "
                    f"({field}:[lo TO hi])"
                )
            return ("prefix", compose(field, rest[:-1].lower()))
        if field in NUMERIC_FIELDS:
            m = _RANGE_DASH.match(rest)
            if m:  # reference numeric-range shorthand `obj:1-100`
                lo, hi = int(m.group(1)), int(m.group(2))
                if lo > hi:
                    return ("none",)
                return ("frange", field, lo, hi)
            if not re.match(r"^-?\d+$", rest):
                raise QueryParseError(
                    f"non-numeric value for numeric field: {field}:{rest!r}"
                )
        try:
            return ("term", compose_value(field, rest))
        except ValueError as e:
            raise QueryParseError(str(e)) from e

    def parse_atom(self):
        kind, val = self.next()
        if kind == "fieldphrase":
            # Lucene's field:"multi word" phrase scope -- the composed
            # keyword fields hold single values, so a quoted span can
            # never match one term; failing loudly beats the silent
            # misparse (a quote-bearing composed term plus stray text
            # terms) the generic fieldexpr token would produce
            raise QueryParseError(
                f"Unsupported query type: field-scoped phrase {val!r} "
                f"(use field:value, or field:(a OR b))"
            )
        if kind == "fieldexpr":
            if self._fields:
                raise QueryParseError(
                    f"nested field expression {val!r} inside "
                    f"{self._fields[-1]}:(...)"
                )
            field, _, rest = val.partition(":")
            return self._field_atom(field, rest)
        if kind == "fieldgroup":
            # Lucene field grouping `field:(a OR b ...)`: the field
            # distributes over every value leaf in the group
            if self._fields:
                raise QueryParseError(
                    f"nested field group {val!r} inside "
                    f"{self._fields[-1]}:(...)"
                )
            self._fields.append(val[: val.index(":")])
            try:
                node = self.parse_expr()
                if self.next()[0] != "rparen":
                    raise QueryParseError(
                        "unbalanced parenthesis in field group"
                    )
            finally:
                self._fields.pop()
            return node
        if kind == "bracket":
            if not self._fields:
                raise QueryParseError(f"range {val!r} outside a field")
            return self._field_atom(self._fields[-1], val)
        if kind == "lparen":
            node = self.parse_expr()
            if self.next()[0] != "rparen":
                raise QueryParseError("unbalanced parenthesis")
            return node
        if kind == "quoted":
            if self._fields:
                # a quoted value inside a field group is one raw value
                return self._field_atom(self._fields[-1], val[1:-1])
            # Lucene-classic phrase syntax: 1 analyzed token collapses to
            # a TermQuery (QueryParser does this before makeFilter ever
            # sees it); 0 tokens (all stopwords) drops the clause. >=2
            # tokens is a PhraseQuery: supported as a positional phrase
            # node when the index carries positions (allow_phrases=True,
            # an opt-in capability BEYOND the reference); otherwise
            # rejected with "Unsupported query type" exactly like the
            # reference (LuceneBackedQueryParser.java:108-110).
            analyzed, positions = analyze_positions(
                val[1:-1], self.locale, self.use_stopwords
            )
            if not analyzed:
                return ("dropped",)
            if len(analyzed) == 1:
                return ("term", analyzed[0])
            if self.allow_phrases:
                return (
                    "phrase",
                    tuple(zip(analyzed, positions)),
                )
            raise QueryParseError(
                f"Unsupported query type: phrase {val} (index stores no "
                f"term positions, same as the reference; build with "
                f"positions=True to enable phrases)"
            )
        if kind == "word":
            if self._fields:
                # a bare word inside `field:(...)` is a field VALUE --
                # composed raw (lowercased), never analyzer-stemmed,
                # exactly like the single `field:value` form
                return self._field_atom(self._fields[-1], val)
            _reject_unsupported_syntax(val)
            if val.endswith("*") and len(val) > 1:
                stem = val[:-1].lower()
                if "*" in stem:
                    raise QueryParseError(
                        f"Unsupported query type: wildcard {val!r} (only "
                        f"trailing-star PrefixQuery, like the reference)"
                    )
                return ("prefix", stem)
            if "*" in val:
                raise QueryParseError(
                    f"Unsupported query type: wildcard {val!r} (only "
                    f"trailing-star PrefixQuery, like the reference)"
                )
            analyzed = analyze(val, self.locale, self.use_stopwords)
            if not analyzed:
                # analyzer removed the term (stopword under `en`): Lucene
                # omits the clause from the BooleanQuery entirely, so it
                # must contribute nothing under AND, OR *and* NOT alike
                return ("dropped",)
            if len(analyzed) == 1:
                return ("term", analyzed[0])
            return ("and", [("term", t) for t in analyzed])
        raise QueryParseError(f"unexpected token {kind}:{val}")


def parse_query(
    q: str,
    locale: str | None = None,
    allow_phrases: bool = False,
    use_stopwords: bool = True,
):
    """Parse a Lucene-classic-subset query string to a filter tree.
    `allow_phrases` admits multi-term quoted phrases as positional
    phrase nodes (requires a positions=True index); the default matches
    the reference, which rejects PhraseQuery. `use_stopwords=False`
    parses with the locale's NON-stopword analyzer -- same locale
    tokenize/stem chain, stop list off -- the reference's
    findAnalyzer(locale, useStopWords) second axis
    (TermAnalyzers.java:117-133; FullTextQuery.useStopWords)."""
    tokens = _lex(q)
    if not tokens:
        return ("none",)
    p = _Parser(tokens, locale, allow_phrases, use_stopwords)
    node = p.parse_expr()
    if p.peek()[0] is not None:
        raise QueryParseError("trailing tokens")
    if node == ("dropped",):
        # every clause was analyzer-eliminated; the reference's wrap()
        # throws "Nothing to filter" (LuceneBackedQueryParser.java:142)
        raise QueryParseError("Nothing to filter (query analyzed to nothing)")
    return node


def collect_terms(node) -> tuple[set, set, set]:
    """Return (positive_terms, positive_prefixes, negative_terms).

    Positive terms/prefixes contribute BM25 score; negative terms only
    filter (reference scores only collected query terms,
    FullText.java:99-170 termCollector side-channel). NOTE: negated
    PREFIXES appear in the negative set with a trailing '*' marker --
    they are NOT literal index terms; a consumer wanting the negated
    match set must expand them (or walk the tree). No runtime path
    consumes the negative set today (the engine filters via the tree).
    """
    pos_t: set[str] = set()
    pos_p: set[str] = set()
    neg_t: set[str] = set()

    def walk(n, negated: bool):
        tag = n[0]
        if tag == "term":
            if FIELD_SEP in n[1]:
                return  # composed field terms filter, never score
            (neg_t if negated else pos_t).add(n[1])
        elif tag == "phrase":
            # members score like ordinary positive terms (phrase = AND
            # of members + adjacency filter)
            for t, _p in n[1]:
                (neg_t if negated else pos_t).add(t)
        elif tag == "frange":
            return  # filter-only
        elif tag == "prefix":
            if FIELD_SEP in n[1]:
                return  # composed field prefixes filter, never score
            if negated:
                neg_t.add(n[1] + "*")
            else:
                pos_p.add(n[1])
        elif tag in ("and", "or"):
            for c in n[1]:
                walk(c, negated)
        elif tag == "not":
            walk(n[1], negated)
            walk(n[2], True)

    walk(node, False)
    return pos_t, pos_p, neg_t


def all_referenced_terms(node) -> tuple[set, set, set]:
    """All term / prefix / frange leaves anywhere in the tree (for the
    postings fetch -- negatives need their postings too). frange leaves
    are returned as whole nodes; the engine keys its expansion map by
    the node itself."""
    terms: set[str] = set()
    prefixes: set[str] = set()
    franges: set[tuple] = set()

    def walk(n):
        tag = n[0]
        if tag == "term":
            terms.add(n[1])
        elif tag == "phrase":
            for t, _p in n[1]:
                terms.add(t)
        elif tag == "prefix":
            prefixes.add(n[1])
        elif tag == "frange":
            franges.add(n)
        elif tag in ("and", "or"):
            for c in n[1]:
                walk(c)
        elif tag == "not":
            walk(n[1])
            walk(n[2])

    walk(node)
    return terms, prefixes, franges


def collect_phrases(node) -> list:
    """Every ("phrase", members) node in the tree, in walk order --
    the engine fetches position blobs for exactly these members' terms."""
    out: list = []

    def walk(n):
        tag = n[0]
        if tag == "phrase":
            out.append(n)
        elif tag in ("and", "or"):
            for c in n[1]:
                walk(c)
        elif tag == "not":
            walk(n[1])
            walk(n[2])

    walk(node)
    return out


def with_access(
    tree,
    constraints=None,
    authz=None,
    locale: str | None = None,
    allow_phrases: bool = False,
    use_stopwords: bool = True,
):
    """AND an optional constraints filter and an authz label expression
    onto a parsed query tree -- the reference's fulltext question composes
    exactly this way: the parsed query bitmap is ANDed with the request's
    MiruFilter constraints and the composite authz bitmap per partition
    (FullTextCustomQuestion.java:91-107; MiruAuthzUtils.getCompositeAuthz
    :24-33 ORs one bitmap per granted label).

    `constraints` is a query string (parsed here, same grammar) or an
    already-parsed tree; `authz` is an iterable of granted labels --
    a doc matches if it carries ANY of them (OR of `authz\\x1flabel`
    composed-term postings). Both are FILTER-ONLY: callers must collect
    scoring terms from the original tree before wrapping."""
    extra = []
    if constraints is not None:
        # constraints share the QUERY's analyzer configuration --
        # findAnalyzer(locale, useStopWords) applies to the whole
        # request, not just the scored clause
        extra.append(
            constraints if isinstance(constraints, tuple)
            else parse_query(
                constraints, locale, allow_phrases, use_stopwords
            )
        )
    if authz is not None:
        if isinstance(authz, (str, bytes)):
            # a bare string would iterate per CHARACTER, granting one
            # single-char label per letter -- always a caller bug
            raise TypeError(
                "authz must be an iterable of labels, not a bare "
                "string; wrap it: authz=[label]"
            )
        labels = sorted({str(a).lower() for a in authz})
        if not labels:
            # an empty grant set matches nothing (the reference sends
            # MiruAuthzExpression.NOT_PROVIDED to skip authz entirely;
            # an explicit empty list is a deny-all)
            extra.append(("none",))
        else:
            nodes = [("term", compose("authz", lbl)) for lbl in labels]
            extra.append(nodes[0] if len(nodes) == 1 else ("or", nodes))
    if not extra:
        return tree
    return ("and", [tree, *extra])
