"""Wiki-miru pipeline: KeywordsExtractor topic parity (vs a direct
nested-loop transliteration of the Java), distributed extraction, gram
aggregation + typeahead, and the wiki graph-schema e2e through the real
engine (WikiSchemaConstants fields as schema-declared extra fields)."""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from miru_spark.analyzer import ENGLISH_STOPWORDS, porter2_stem, standard_tokenize
from miru_spark.fields import FIELD_SEP
from miru_spark.index.build import build_index
from miru_spark.ops.wikitopics import (
    WIKI_EXTRA_FIELDS,
    WIKI_TOPIC_FIELDS,
    extract_topics,
    topics_frame,
    typeahead,
    wiki_documents,
    wiki_documents_with_topics,
    wiki_grams,
)
from miru_spark.query.engine import SearchEngine

SF = "/root/testdata/sf0.001"


# -- independent oracle: direct transliteration of getKeywordsList ----------

def _oracle_topics(text, m, top_n):
    """Quadratic nested-loop rendering of KeywordsExtractor.java:74-160,
    kept deliberately close to the Java (no incremental window state) so
    the optimized implementation is checked against the semantics, not
    against itself. Ties resolved the documented deterministic way."""
    import re as _re

    text = _re.sub(r"https?://\S+\s?", "", text or "")
    terms = [t for t in standard_tokenize(text) if t not in ENGLISH_STOPWORDS]
    stems = [porter2_stem(t) for t in terms]
    freq = {}
    for s in stems:
        freq[s] = freq.get(s, 0) + 1
    uniq = set()
    cands = []  # (score, encounter, terms)
    for t in range(len(terms)):
        score = 1
        for length in range(m):
            i = t + length
            if i >= len(terms):
                break
            score += freq[stems[i]]
            j = set()
            ts = []
            for k, s in enumerate(stems[t : t + length + 1]):
                if s not in j:
                    j.add(s)
                    ts.append(terms[t + k])
            key = frozenset(j)
            if key not in uniq:
                uniq.add(key)
                cands.append((score / (1.0 + length), len(cands), tuple(ts)))
    cands.sort(key=lambda c: (-c[0], c[1]))
    return [(ts, sc) for sc, _e, ts in cands[:top_n]]


def test_handcrafted():
    got = extract_topics("cat cat cat dog", max_phrase_len=20, top_n=20)
    assert got == [
        (("cat",), 4.0),
        (("cat", "dog"), 2.75),
        (("dog",), 2.0),
    ]


def test_url_stripping_and_stopwords():
    got = extract_topics(
        "the cat https://example.com/path sat cat", max_phrase_len=3, top_n=5
    )
    # 'the' is a stopword, the URL vanishes; com/example never tokenized
    flat = {t for ts, _ in got for t in ts}
    assert flat == {"cat", "sat"}


def test_stem_grouping_counts_inflections_together():
    # running/runs share the stem -> one keyword with frequency 2; the
    # topic surfaces the FIRST unstemmed form (Keyword(term) ctor arg)
    got = extract_topics("running runs", max_phrase_len=2, top_n=5)
    # one distinct-stem set {run}: first window wins, frequency 2 counted
    # (score 1+2 at length 1), the 2-token window dedups away
    assert got == [(("running",), 3.0)]


def test_empty_and_stopword_only():
    assert extract_topics("") == []
    assert extract_topics("the a is was") == []


def test_matches_bruteforce_oracle():
    rng = random.Random(42)
    vocab = ["cat", "cats", "dog", "run", "running", "mouse", "frog",
             "the", "a", "jumped", "jumping", "tree", "trees", "house"]
    for trial in range(60):
        n = rng.randrange(0, 40)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        m = rng.choice([1, 2, 3, 5, 20])
        k = rng.choice([1, 3, 10, 50])
        got = extract_topics(text, max_phrase_len=m, top_n=k)
        want = _oracle_topics(text, m, k)
        assert got == want, (trial, text, m, k)


def test_matches_bruteforce_oracle_unicode():
    # the Java hardcodes EnglishAnalyzer regardless of page language
    # (KeywordsExtractor.java:78); non-Latin tokens pass through the
    # tokenizer unstommed -- parity must hold there too
    rng = random.Random(7)
    vocab = ["kätzchen", "läuft", "бежит", "кошка", "猫", "走る",
             "the", "chat", "chats", "running"]
    for trial in range(30):
        text = " ".join(
            rng.choice(vocab) for _ in range(rng.randrange(0, 30))
        )
        m = rng.choice([2, 4, 20])
        k = rng.choice([3, 10])
        assert extract_topics(text, m, k) == _oracle_topics(text, m, k), (
            trial, text)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.text(max_size=400),
        st.integers(min_value=1, max_value=25),
        st.integers(min_value=1, max_value=30),
    )
    def test_extract_topics_properties(text, m, k):
        got = extract_topics(text, max_phrase_len=m, top_n=k)
        assert got == _oracle_topics(text, m, k)
        assert len(got) <= k
        scores = [sc for _ts, sc in got]
        assert scores == sorted(scores, reverse=True)
        assert all(sc > 0 for sc in scores)
        # every topic's term list is stopword-free and non-empty
        for ts, _sc in got:
            assert ts
            assert not (set(ts) & ENGLISH_STOPWORDS)
        # dedup invariant: distinct stem sets only
        seen = set()
        for ts, _sc in got:
            key = frozenset(porter2_stem(t) for t in ts)
            assert key not in seen
            seen.add(key)
except ImportError:  # pragma: no cover
    pass


# -- distributed paths -------------------------------------------------------

@pytest.fixture(scope="module")
def topics_df(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(80)
    return topics_frame(docs, max_phrase_len=4, top_n=6).cache()


def test_topics_frame_matches_driver(spark, topics_df):
    rows = topics_df.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    pdf = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .limit(80)
        .select("doc_id", "text")
        .toPandas()
    )
    assert len(by_doc) > 0
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        want = extract_topics(text, max_phrase_len=4, top_n=6)
        got = sorted(by_doc.get(doc_id, []), key=lambda r: r["rank"])
        assert len(got) == len(want)
        for r, (ts, sc) in zip(got, want):
            assert r["topic"] == " ".join(ts)
            assert r["n_terms"] == len(ts)
            assert r["score"] == pytest.approx(sc)


def test_wiki_grams_and_typeahead(spark, topics_df):
    grams = wiki_grams(topics_df).cache()
    gp = {r["topic"]: r for r in grams.collect()}
    tp = topics_df.toPandas()
    want = tp.groupby("topic").agg(
        n_docs=("doc_id", "size"), score_sum=("score", "sum")
    )
    assert len(gp) == len(want)
    for topic, row in want.iterrows():
        assert gp[topic]["n_docs"] == row["n_docs"]
        assert gp[topic]["score_sum"] == pytest.approx(row["score_sum"])
    # typeahead: prefix-filtered, count-desc then topic-asc, bounded
    some = sorted(gp)[0][:1]
    sug = typeahead(grams, some, k=5).collect()
    assert len(sug) <= 5
    assert all(r["topic"].startswith(some) for r in sug)
    keys = [(-r["n_docs"], r["topic"]) for r in sug]
    assert keys == sorted(keys)
    want_top = sorted(
        ((-v["n_docs"], t) for t, v in gp.items() if t.startswith(some))
    )[: len(sug)]
    assert keys == want_top


# -- wiki graph schema through the engine ------------------------------------

@pytest.fixture(scope="module")
def wiki_engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wiki_idx"))
    build_index(
        spark,
        wiki_documents(spark, SF).limit(200),
        d,
        partition_seconds=10**9,
        block_span=64,
        extra_fields=WIKI_EXTRA_FIELDS,
    )
    return SearchEngine(spark, d)


def test_wiki_schema_fields_queryable(spark, wiki_engine):
    eng = wiki_engine
    pdf = (
        wiki_documents(spark, SF).limit(200)
        .select("url", "fields")
        .toPandas()
    )
    # every guid is its own composed term (graph node addressability)
    guids = eng.expand_prefix(f"guid{FIELD_SEP}")
    assert len(guids) == len(pdf)
    # type facet == input distribution
    want = {}
    for f in pdf["fields"]:
        want[f["type"][0]] = want.get(f["type"][0], 0) + 1
    assert dict(eng.distincts("type")) == want
    # graph filter x text query, both engine paths agree
    q = "type:src1 AND userGuid:u001"
    a = sorted(r["doc_id"] for r in eng.search(q, k=300).collect())
    assert eng.count(q) == len(a)
    assert eng.count(q, local=False) == len(a)
    expect = [
        i
        for i, f in enumerate(pdf["fields"])
        if f["type"][0] == "src1" and f["userGuid"][0] == "u001"
    ]
    # doc ids are assigned in warc_ts order == doc_id order for this corpus
    assert a == expect


def test_wiki_auth_dimension(wiki_engine):
    """WikiSchemaConstants' auth field through the engine's first-class
    authz labels: public pages vs folder/user grants, deny-all default."""
    eng = wiki_engine
    pub = [i for i in range(200) if i % 3 == 0]
    priv = [i for i in range(200) if i % 3 != 0]
    assert eng.count(None, authz=["public"]) == len(pub)
    # a user grant sees their own non-public pages (public needs the label)
    mine = [i for i in priv if i % 101 == 1]
    assert eng.count(None, authz=["user-u001"]) == len(mine)
    # folder grant + public grant composes as OR over labels
    fold = [i for i in priv if (i // 7) % 31 == 2]
    got = eng.count(None, authz=["public", "folder-f002"])
    assert got == len(pub) + len(fold)
    # empty grants = deny all, on both paths
    assert eng.count(None, authz=[]) == 0
    assert eng.count(None, authz=[], local=False) == 0
    # authz composes with graph-field queries identically on both paths
    q = "verb:created"
    a = eng.count(q, authz=["public"])
    assert a == len([i for i in pub if i % 5 != 0])
    assert eng.count(q, authz=["public"], local=False) == a


def test_wiki_verb_edit_ratio(spark, wiki_engine):
    # every 5th doc is an edit (wiki_documents' verb rule)
    n_edit = wiki_engine.count("verb:edited")
    n_all = wiki_engine.count("verb:created") + n_edit
    assert n_all == 200
    assert n_edit == len([i for i in range(200) if i % 5 == 0])


# -- topics as an engine dimension (gram store consolidated into the index) --

def test_wiki_topics_as_engine_field(spark, tmp_path_factory):
    from miru_spark.fields import compose

    d = str(tmp_path_factory.mktemp("wiki_topic_idx"))
    # deterministic 120-doc slice (limit-after-join would be arbitrary)
    wt = wiki_documents_with_topics(
        spark, SF, max_phrase_len=3, top_n=3
    ).filter(F.col("url") <= "wiki00000119")
    build_index(
        spark, wt, d,
        partition_seconds=10**9, block_span=64,
        extra_fields=WIKI_TOPIC_FIELDS,
    )
    eng = SearchEngine(spark, d)
    # oracle: per-doc driver extraction over the same 120 docs
    pdf = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .orderBy("doc_id").limit(120)
        .select("doc_id", "text").toPandas()
    )
    want: dict = {}
    for text in pdf["text"]:
        # per-doc set: the index dedupes a field's values per doc
        for t in {
            " ".join(tt).lower()
            for tt, _sc in extract_topics(text, max_phrase_len=3, top_n=3)
        }:
            want[t] = want.get(t, 0) + 1
    # topic counts straight off the index == gram counts
    assert dict(eng.distincts("topic")) == want
    # typeahead = term-dictionary prefix scan over composed topic terms
    pref = sorted(want)[0][:2]
    got = eng.expand_prefix(compose("topic", pref))
    assert got == sorted(
        compose("topic", t) for t in want if t.startswith(pref)
    )
    # topic filter x graph field, both paths agree
    # a topic VALUE is the whole composed string; query by the most
    # common single-word topic so the parser-side term is exact
    singles = [t for t in want if " " not in t]
    top1 = max(singles, key=lambda t: (want[t], t))
    q = f"topic:{top1}"
    n = eng.count(q)
    assert n == eng.count(q, local=False) == want[top1] > 0
