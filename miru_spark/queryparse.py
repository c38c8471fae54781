"""Lucene-classic-subset query parser -> filter tree.

Re-expresses the reference's LuceneBackedQueryParser
(miru-plugin/.../query/LuceneBackedQueryParser.java:48-144): default
operator AND (:51), TermQuery -> and[term], PrefixQuery -> wildcard term,
BooleanQuery MUST/SHOULD/MUST_NOT -> and/or/pButNotQ trees
(MiruFilterOperation.java:179-192 -- `and`, `or`, `pButNotQ` are the only
filter ops the reference implements).

Tree nodes (plain tuples, picklable for broadcast into UDFs):
    ("term", t)            -- analyzed term
    ("prefix", p)          -- wildcard `p*` (MiruAggregateUtil.java:1154-1167)
    ("and", [nodes...])
    ("or", [nodes...])
    ("not", pos_node, neg_node)   -- pButNotQ: pos AND NOT neg
    ("all",)               -- match-everything (inclusiveFilter base,
                              MiruFilter.java:18)
    ("none",)              -- match-nothing (empty AND operand short-circuit,
                              MiruAggregateUtil.java:1175-1177)
"""

from __future__ import annotations

import re

from .analyzer import analyze

_TOKEN_SPEC = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<and>AND\b)
      | (?P<or>OR\b)
      | (?P<not>NOT\b)
      | (?P<minus>-)
      | (?P<word>[^\s()\-][^\s()]*)
    )""",
    re.VERBOSE,
)


class QueryParseError(ValueError):
    pass


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
    def __init__(self, tokens: list[tuple[str, str]], locale: str | None):
        self.toks = tokens
        self.i = 0
        self.locale = locale

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
        if len(parts) == 1:
            return parts[0]
        return ("or", parts)

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
        pos = [p for p in pos if p != ("all",)] or []
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

    def parse_atom(self):
        kind, val = self.next()
        if kind == "lparen":
            node = self.parse_expr()
            if self.next()[0] != "rparen":
                raise QueryParseError("unbalanced parenthesis")
            return node
        if kind == "word":
            if val.endswith("*") and len(val) > 1:
                stem = val[:-1].lower()
                return ("prefix", stem)
            analyzed = analyze(val, self.locale)
            if not analyzed:
                # analyzer removed the term (stopword under `en`): the
                # clause contributes nothing -- match-all so AND siblings
                # decide, mirroring Lucene's dropped-stopword behavior.
                return ("all",)
            if len(analyzed) == 1:
                return ("term", analyzed[0])
            return ("and", [("term", t) for t in analyzed])
        raise QueryParseError(f"unexpected token {kind}:{val}")


def parse_query(q: str, locale: str | None = None):
    """Parse a Lucene-classic-subset query string to a filter tree."""
    tokens = _lex(q)
    if not tokens:
        return ("none",)
    p = _Parser(tokens, locale)
    node = p.parse_expr()
    if p.peek()[0] is not None:
        raise QueryParseError("trailing tokens")
    return node


def collect_terms(node) -> tuple[set, set, set]:
    """Return (positive_terms, positive_prefixes, negative_terms).

    Positive terms/prefixes contribute BM25 score; negative terms only
    filter (reference scores only collected query terms,
    FullText.java:99-170 termCollector side-channel).
    """
    pos_t: set[str] = set()
    pos_p: set[str] = set()
    neg_t: set[str] = set()

    def walk(n, negated: bool):
        tag = n[0]
        if tag == "term":
            (neg_t if negated else pos_t).add(n[1])
        elif tag == "prefix":
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


def all_referenced_terms(node) -> tuple[set, set]:
    """All term leaves and prefix leaves anywhere in the tree (for the
    postings fetch -- negatives need their postings too)."""
    terms: set[str] = set()
    prefixes: set[str] = set()

    def walk(n):
        tag = n[0]
        if tag == "term":
            terms.add(n[1])
        elif tag == "prefix":
            prefixes.add(n[1])
        elif tag in ("and", "or"):
            for c in n[1]:
                walk(c)
        elif tag == "not":
            walk(n[1])
            walk(n[2])

    walk(node)
    return terms, prefixes
