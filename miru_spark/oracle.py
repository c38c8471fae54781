"""Pure-Python brute-force BM25 oracle.

Defines ground truth for rank-identity tests (SURVEY.md §5): same analyzer,
same partition/docID minting rule, exact BM25 (k1=1.2, b=0.75) computed by
brute force. The Spark engine must produce rank-identical top-k (pid,
doc_id) and equal scores.

Semantics fixed here (and mirrored by the engine):
- pid = floor(warc_ts_micros / (partition_seconds * 1e6))
- doc_id = dense rank within pid ordered by (warc_ts, url) -- the
  reference's time-ordered dense ids (MiruTimeIndex.nextId,
  miru-plugin/.../MiruTimeIndex.java:55).
- doc_len = len(analyzed tokens); avgdl/N/df are global across partitions
  (the reference's global cardinality at docId -1,
  LabFieldIndex.java:510-536).
- idf = ln(1 + (N - df + 0.5)/(df + 0.5))  (Robertson/Lucene form)
- score(d) = sum over distinct positive query terms present in d, iterated
  in sorted term order (fixed float summation order), of
  idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
- prefix `p*` expands to the first `max_expansion` matching index terms in
  lexicographic order (MiruAggregateUtil.java:1154-1167 wildcard cap); the
  expansions join the positive scoring set.
- tie-break: (score desc, pid asc, doc_id asc) -- documented deviation from
  the reference's docID-desc recency tie (FullText.java:294-303).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from .analyzer import analyze_positions
from .fields import FIELD_SEP, doc_field_terms, encode_num
from .queryparse import collect_terms, parse_query, with_access

K1 = 1.2
B = 0.75
DEFAULT_PARTITION_SECONDS = 86400
MAX_WILDCARD_EXPANSION = 1024


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(tf: float, dl: float, avgdl: float, idf: float) -> float:
    return idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


class OracleIndex:
    """Brute-force in-memory index over webtext-shaped rows.

    rows: iterable of dicts with keys url, warc_us (int micros), text, lang.
    """

    def __init__(self, rows, partition_seconds: int = DEFAULT_PARTITION_SECONDS):
        psec_us = partition_seconds * 1_000_000
        by_pid: dict[int, list[dict]] = defaultdict(list)
        for r in rows:
            by_pid[r["warc_us"] // psec_us].append(r)
        self.docs: dict[tuple[int, int], dict] = {}
        self.postings: dict[str, dict[tuple[int, int], int]] = defaultdict(dict)
        # per-term token positions (pre-stop-removal stream indices,
        # Lucene position-increment semantics) -- phrase-match truth
        self.positions: dict[str, dict[tuple[int, int], list]] = defaultdict(dict)
        self.pid_doc_counts: dict[int, int] = {}
        total_len = 0
        for pid, rlist in by_pid.items():
            rlist.sort(key=lambda r: (r["warc_us"], r["url"]))
            self.pid_doc_counts[pid] = len(rlist)
            for doc_id, r in enumerate(rlist):
                tokens, tok_pos = analyze_positions(r["text"], r.get("lang"))
                key = (pid, doc_id)
                self.docs[key] = {
                    "url": r["url"],
                    "warc_us": r["warc_us"],
                    "dl": len(tokens),
                    "tf": Counter(tokens),
                }
                total_len += len(tokens)
                for t, c in Counter(tokens).items():
                    self.postings[t][key] = c
                for t, p in zip(tokens, tok_pos):
                    self.positions[t].setdefault(key, []).append(p)
                # composed metadata field terms: filter-only postings
                # (tf=1), excluded from dl and the scoring tf counter
                for ft in doc_field_terms(
                    r["url"], r.get("lang"), len(tokens), r.get("authz")
                ):
                    self.postings[ft][key] = 1
        self.n_docs = len(self.docs)
        self.avgdl = (total_len / self.n_docs) if self.n_docs else 0.0
        self.terms_sorted = sorted(self.postings)

    # -- filter-tree evaluation ------------------------------------------
    def expand_prefix(self, p: str) -> list[str]:
        out = [t for t in self.terms_sorted if t.startswith(p)]
        return out[:MAX_WILDCARD_EXPANSION]

    def _eval(self, node) -> set:
        tag = node[0]
        if tag == "term":
            return set(self.postings.get(node[1], ()))
        if tag == "phrase":
            members = node[1]
            cand: set | None = None
            for t, _p in members:
                s = set(self.postings.get(t, ()))
                cand = s if cand is None else cand & s
                if not cand:
                    return set()
            base = members[0][1]
            out = set()
            for key in cand:
                for b in self.positions[members[0][0]][key]:
                    if all(
                        (b + p - base) in self.positions[t].get(key, ())
                        for t, p in members[1:]
                    ):
                        out.add(key)
                        break
            return out
        if tag == "prefix":
            s: set = set()
            for t in self.expand_prefix(node[1]):
                s |= set(self.postings[t])
            return s
        if tag == "frange":
            _, field, lo, hi = node
            lo_key = f"{field}{FIELD_SEP}{encode_num(int(lo))}"
            hi_key = f"{field}{FIELD_SEP}{encode_num(int(hi))}"
            s = set()
            matched = [
                t for t in self.terms_sorted if lo_key <= t <= hi_key
            ][:MAX_WILDCARD_EXPANSION]
            for t in matched:
                s |= set(self.postings[t])
            return s
        if tag == "and":
            sets = [self._eval(c) for c in node[1]]
            out = sets[0]
            for s in sets[1:]:
                out = out & s
            return out
        if tag == "or":
            out: set = set()
            for c in node[1]:
                out |= self._eval(c)
            return out
        if tag == "not":
            return self._eval(node[1]) - self._eval(node[2])
        if tag == "all":
            return set(self.docs)
        if tag == "none":
            return set()
        raise ValueError(f"bad node {node!r}")

    # -- search -----------------------------------------------------------
    def search(self, query: str | None, k: int = 10,
               locale: str | None = None, constraints=None, authz=None,
               allow_phrases: bool = False):
        """Return top-k [(pid, doc_id, score, url)]. `constraints`/`authz`
        AND into the match set but never score (with_access; the
        reference's FullTextCustomQuestion.java:91-107 composition)."""
        tree = (
            ("all",) if query is None
            else parse_query(query, locale, allow_phrases)
        )
        pos_terms, pos_prefixes, _ = collect_terms(tree)
        matches = self._eval(
            with_access(tree, constraints, authz, locale, allow_phrases)
        )
        scoring_terms = set(pos_terms)
        for p in pos_prefixes:
            scoring_terms.update(self.expand_prefix(p))
        scoring_terms = sorted(scoring_terms)
        idf = {
            t: bm25_idf(self.n_docs, len(self.postings.get(t, ())))
            for t in scoring_terms
        }
        scored = []
        for key in matches:
            d = self.docs[key]
            s = 0.0
            for t in scoring_terms:
                tf = d["tf"].get(t)
                if tf:
                    s += bm25_term_score(tf, d["dl"], self.avgdl, idf[t])
            scored.append((key[0], key[1], s, d["url"]))
        scored.sort(key=lambda x: (-x[2], x[0], x[1]))
        return scored[:k]

    def newest(self, k: int = 10, query: str | None = None,
               locale: str | None = None, constraints=None, authz=None):
        """TIME strategy oracle: newest-k [(pid, doc_id, url)] among the
        filtered matches (FullText.collectTime:222-251 descending docID
        order; composite (pid, doc_id) descending == warc order since
        docIDs are minted time-ordered per pid)."""
        if query is None and constraints is None and authz is None:
            keys = set(self.docs)
        else:
            tree = ("all",) if query is None else parse_query(query, locale)
            keys = self._eval(with_access(tree, constraints, authz, locale))
        out = sorted(keys, key=lambda x: (-x[0], -x[1]))[:k]
        return [(p, d, self.docs[(p, d)]["url"]) for p, d in out]
