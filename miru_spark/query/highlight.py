"""Query-term highlighting over document content.

Re-expresses `LuceneBackedQueryParser.highlight`
(miru-plugin/.../query/LuceneBackedQueryParser.java:56-74): analyze the
query with the locale's analyzer, wrap every content token whose
analyzed form matches a positive query term (or prefix) in `pre`/`post`
tags, fragment the content into ~`fragment_size`-char token-aligned
fragments (SimpleFragmenter), score fragments by matched query terms
(QueryTermScorer), and return the best `max_fragments` fragments in
document order joined by ``" ... "``, analyzing at most `preview`
characters (setMaxDocCharsToAnalyze). Returns None when nothing
matches, matching the reference's blank-summary contract.

Pure driver-side string work -- highlighting runs on the k result docs
of a query, never inside a distributed job.
"""

from __future__ import annotations

from ..analyzer import _TOKEN_RE, analyze
from ..queryparse import QueryParseError, collect_terms, parse_query


def highlight(
    query: str,
    content: str,
    locale: str | None = None,
    pre: str = "<b>",
    post: str = "</b>",
    preview: int = 50_000,
    fragment_size: int = 100,
    max_fragments: int = 4,
    separator: str = " ... ",
    use_stopwords: bool = True,
) -> str | None:
    if not query or not content:
        return None
    try:
        # phrases always parse here: highlighting is pure string work
        # over result docs (members highlight like plain terms), so it
        # needs no positional index
        tree = parse_query(
            query, locale, allow_phrases=True,
            use_stopwords=use_stopwords,
        )
    except QueryParseError:
        # the reference catches ParseException and returns null
        # (LuceneBackedQueryParser.highlight:68-71); a stopword-only
        # query analyzes to nothing and can highlight nothing
        return None
    pos_terms, pos_prefixes, _neg = collect_terms(tree)
    if not pos_terms and not pos_prefixes:
        return None
    prefixes = tuple(sorted(pos_prefixes))

    body = content[:preview]

    # token scan with original offsets; a token matches when its
    # locale-analyzed form hits a query term / prefix (stopwords analyze
    # to nothing and so can never match -- same as Lucene's analyzed
    # token stream)
    matches: list[tuple[int, int, str]] = []  # (start, end, analyzed)
    for m in _TOKEN_RE.finditer(body):
        out = analyze(m.group(0), locale, use_stopwords)
        if not out:
            continue
        t = out[0]
        if t in pos_terms or (prefixes and t.startswith(prefixes)):
            matches.append((m.start(), m.end(), t))
    if not matches:
        return None

    # SimpleFragmenter: a new fragment starts when a token crosses the
    # next fragment_size boundary
    frags: list[tuple[int, int]] = []
    start = 0
    boundary = fragment_size
    for m in _TOKEN_RE.finditer(body):
        if m.start() >= boundary:
            frags.append((start, m.start()))
            start = m.start()
            boundary = m.start() + fragment_size
    frags.append((start, len(body)))

    # QueryTermScorer (simplified): fragment score = distinct query terms
    # matched, ties by total matches then document order
    scored = []
    for fi, (fs, fe) in enumerate(frags):
        in_frag = [mm for mm in matches if fs <= mm[0] < fe]
        if not in_frag:
            continue
        scored.append(
            (len({t for _s, _e, t in in_frag}), len(in_frag), -fi, fi)
        )
    if not scored:
        return None
    best = sorted(
        fi for _d, _n, _o, fi in sorted(scored, reverse=True)[:max_fragments]
    )

    pieces = []
    for fi in best:
        fs, fe = frags[fi]
        out = []
        cursor = fs
        for ms, me, _t in matches:
            if ms < fs or ms >= fe:
                continue
            out.append(body[cursor:ms])
            out.append(pre)
            out.append(body[ms:me])
            out.append(post)
            cursor = me
        out.append(body[cursor:fe])
        pieces.append("".join(out).strip())
    return separator.join(pieces) if pieces else None
