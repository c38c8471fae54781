"""The vectorized indexer path (analyze_block + _invert_group_flat)
must be BIT-identical to the per-doc `analyze` pipeline it replaced:
same posting blocks, same encoded binaries, same doc lens -- across
mixed locales, scripts, empty docs, authz labels, and schema-declared
extra fields."""

import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

from miru_spark.analyzer import analyze, analyze_block
from miru_spark.codec import decode_postings, decode_varint
from miru_spark.fields import doc_field_terms, extra_field_terms
from miru_spark.index.build import _make_indexer

PARTITION_US = 3600 * 10**6
BLOCK_SPAN = 16  # small so the group loop crosses block boundaries


def _docs():
    texts = {
        "en": "The running foxes ran quickly over the lazy dogs again",
        "de": "Die laufenden Füchse liefen schnell über die faulen Hunde",
        "ru": "Бегущие лисы быстро бежали через ленивых собак",
        "th": "สวัสดีครับ แมวกินปลา",
        "zz": "Unknown locale keeps raw lowercase tokens only",
        "": "",
    }
    langs = list(texts)
    out = []
    for i in range(120):
        lang = langs[i % len(langs)]
        body = texts[lang]
        # vary text so tf/df differ per doc; every 11th doc is empty
        extra = "" if i % 11 == 0 else f" shard{i % 7} " + "fox " * (i % 4)
        out.append(
            {
                "url": f"https://site{i % 9}.example/en/page/{i}",
                "warc_us": 1704067200_000_000 + i * 60_000_000,
                "lang": lang or None,
                "text": (body + extra) if body or extra else "",
                "authz": [f"g{i % 3}", f"g{i % 3}"] if i % 2 else None,
                "fields": {"team": [f"t{i % 5}"]} if i % 3 else None,
            }
        )
    return out


def _batch(rows):
    return pa.RecordBatch.from_pydict(
        {
            "pid": pa.array(
                [r["warc_us"] // PARTITION_US for r in rows], pa.int64()
            ),
            "url": pa.array([r["url"] for r in rows]),
            "warc_us": pa.array(
                [r["warc_us"] for r in rows], pa.int64()
            ),
            "lang": pa.array([r["lang"] for r in rows]),
            "text": pa.array([r["text"] for r in rows]),
            "authz": pa.array(
                [r["authz"] for r in rows], pa.list_(pa.string())
            ),
            "fields": pa.array(
                [r["fields"] for r in rows],
                pa.map_(pa.string(), pa.list_(pa.string())),
            ),
        }
    )


def _expected(rows):
    """Per-doc oracle: analyze() + Counter + field terms, minted in the
    worker's (pid, warc_us, url) sort order."""
    order = sorted(
        range(len(rows)),
        key=lambda i: (
            rows[i]["warc_us"] // PARTITION_US,
            rows[i]["warc_us"],
            rows[i]["url"],
        ),
    )
    nxt: dict = defaultdict(int)
    exp = defaultdict(dict)  # (pid, blk, term) -> {doc: (tf, dl)}
    dls = {}
    for i in order:
        r = rows[i]
        pid = r["warc_us"] // PARTITION_US
        did = nxt[pid]
        nxt[pid] += 1
        blk = did // BLOCK_SPAN
        toks = analyze(r["text"], r["lang"])
        dls[(pid, did)] = len(toks)
        items = list(Counter(toks).items())
        fts = doc_field_terms(r["url"], r["lang"], len(toks), r["authz"])
        fts += extra_field_terms(r["fields"], ["team"])
        items += [(t, 1) for t in fts]
        for t, c in items:
            exp[(pid, blk, t)][did] = (c, len(toks))
    return exp, dls


def test_vectorized_blocks_match_per_doc_oracle():
    rows = _docs()
    out = list(
        _make_indexer(BLOCK_SPAN, extra_fields=["team"])(
            iter([_batch(rows)])
        )
    )
    tbl = pa.Table.from_batches(out)
    exp, dls = _expected(rows)

    p = tbl.filter(pa.compute.equal(tbl.column("row_type"), "p"))
    got_keys = set()
    for b in p.to_batches():
        d = b.to_pydict()
        for pid, blk, term, n, ctf, ids_bin, tfs_bin, dls_bin in zip(
            d["pid"], d["blk"], d["term"], d["n"], d["ctf"],
            d["ids_bin"], d["tfs_bin"], d["dls_bin"],
        ):
            key = (pid, blk, term)
            got_keys.add(key)
            want = exp[key]
            ids = decode_postings(ids_bin).tolist()
            tfs = decode_varint(tfs_bin).tolist()
            dl_arr = decode_varint(dls_bin).tolist()
            assert ids == sorted(want), key
            assert n == len(want)
            assert tfs == [want[i][0] for i in ids], key
            assert dl_arr == [want[i][1] for i in ids], key
            assert ctf == sum(want[i][0] for i in ids)
    assert got_keys == set(exp)

    # forward doc rows carry the oracle doc lens
    drows = tbl.filter(pa.compute.equal(tbl.column("row_type"), "d"))
    d = drows.to_pydict()
    for pid, did, dl in zip(d["pid"], d["doc_id"], d["doc_len"]):
        assert dl == dls[(pid, did)]


def test_analyze_block_identity_across_locales():
    texts = [
        "The quick brown foxes are running",
        "",
        "Les renards bruns rapides couraient",
        "done Done DONE doing",
    ]
    for loc in ["en", "de", "fr", "ru", "ar", "th", "zz", None, "de_AT"]:
        di, ti, td, dl = analyze_block(texts, loc)
        td = td.to_pylist()
        got = [[] for _ in texts]
        for dd, tt in zip(di, ti):
            got[dd].append(td[tt])
        want = [analyze(t, loc) for t in texts]
        assert got == want, loc
        assert dl.tolist() == [len(w) for w in want], loc


def test_analyze_block_stem_collision_shares_term_id():
    # "running" and "runs" both stem to "run": tf counting must merge
    di, ti, td, dl = analyze_block(["running runs ran run"], "en")
    terms = td.to_pylist()
    assert terms.count("run") == 1
    key = [terms[t] for t in ti]
    assert Counter(key)["run"] == 3  # running/runs/run (ran stems to ran)
    assert dl.tolist() == [4]


_MIXED_TEXTS = [
    "Hello, WORLD! The foo_bar-123 tests... run; quickly (again).",
    "",
    "   ",
    "!!!",
    "pure ascii lower tokens only",
    "Straße über Füchse",                      # non-ascii latin
    "İstanbul ŞEHİR",                          # Python-lower special case
    "ΑΣ ΟΔΟΣ τέλος",                           # final-sigma context case
    "ёлка Ёж ПРИВЕТ-мир",                      # cyrillic
    "emoji 😀 between ASCII words",
    "tab\tsep\nnewline  double  space",
    "trailing space ",
    " leading",
    "a",
    None,
]


def test_analyze_block_arrow_input_identity():
    """pa.Array input (the index worker's path) must be token-identical
    to list input and to per-doc analyze -- including the ASCII fast
    path, the mixed ascii/non-ascii hybrid, None/null docs, and the
    Unicode special-casing traps (İ, final sigma) that force the
    non-ascii fallback."""
    for loc in ["en", "de", "ru", "zz", None]:
        arr = pa.array(_MIXED_TEXTS, type=pa.large_string())
        di_a, ti_a, td_a, dl_a = analyze_block(arr, loc)
        td_al = td_a.to_pylist()
        got = [[] for _ in _MIXED_TEXTS]
        for dd, tt in zip(di_a, ti_a):
            got[dd].append(td_al[tt])
        want = [analyze(t, loc) for t in _MIXED_TEXTS]
        assert got == want, loc
        assert dl_a.tolist() == [len(w) for w in want], loc
        # list input agrees with arrow input term-for-term
        di_l, ti_l, td_l, dl_l = analyze_block(list(_MIXED_TEXTS), loc)
        td_ll = td_l.to_pylist()
        got_l = [[] for _ in _MIXED_TEXTS]
        for dd, tt in zip(di_l, ti_l):
            got_l[dd].append(td_ll[tt])
        assert got_l == got, loc
        assert dl_l.tolist() == dl_a.tolist(), loc


def test_analyze_block_arrow_plain_string_and_chunked():
    texts = ["running runs ran", "The fox. The dog!"]
    want = [analyze(t, "en") for t in texts]
    for arr in [
        pa.array(texts, type=pa.string()),
        pa.chunked_array([texts[:1], texts[1:]], type=pa.large_string()),
    ]:
        di, ti, td, dl = analyze_block(arr, "en")
        tdl = td.to_pylist()
        got = [[] for _ in texts]
        for dd, tt in zip(di, ti):
            got[dd].append(tdl[tt])
        assert got == want
        assert dl.tolist() == [len(w) for w in want]


def test_invert_group_flat_arrow_equals_list():
    """_invert_group_flat fed the worker's Arrow text slice must emit a
    RecordBatch byte-identical to the Python-list path."""
    from miru_spark.index.build import _invert_group_flat

    texts = [t or "" for t in _MIXED_TEXTS] * 3
    langs = (["en", "de", "ru", "zz", "en"] * len(_MIXED_TEXTS))[: len(texts)]
    urls = [f"https://s{i % 5}.example/p/{i}" for i in range(len(texts))]
    azs = [None] * len(texts)
    flds = [None] * len(texts)
    did = np.arange(len(texts), dtype=np.int64)
    b_list, dl_list = _invert_group_flat(
        3, 1, did, texts, langs, urls, azs, flds, None
    )
    b_arrow, dl_arrow = _invert_group_flat(
        3, 1, did, pa.array(texts, type=pa.large_string()),
        langs, urls, azs, flds, None,
    )
    assert dl_list == dl_arrow
    assert b_list.equals(b_arrow)


def test_analyze_block_fuzz_arrow_vs_perdoc():
    """Property fuzz: for ANY unicode batch and locale, the Arrow input
    path must agree with per-doc analyze() token-for-token."""
    from hypothesis import given, settings, strategies as st

    alphabet = st.sampled_from(
        list("abcXYZ 019_.,!-\t\n") + ["ß", "ü", "İ", "ı", "Σ", "ς", "ж",
                                       "Я", "ά", "ไ", "ท", "ย", "😀", "中",
                                       "é"]
    )
    texts_s = st.lists(
        st.text(alphabet=alphabet, max_size=40), min_size=0, max_size=12
    )
    locales = st.sampled_from(["en", "de", "ru", "gr", "tr", "zz", None])

    @settings(max_examples=120, deadline=None)
    @given(texts=texts_s, loc=locales)
    def run(texts, loc):
        arr = pa.array(texts, type=pa.large_string())
        di, ti, td, dl = analyze_block(arr, loc)
        tdl = td.to_pylist()
        got = [[] for _ in texts]
        for dd, tt in zip(di, ti):
            got[dd].append(tdl[tt])
        want = [analyze(t, loc) for t in texts]
        assert got == want
        assert dl.tolist() == [len(w) for w in want]

    run()
