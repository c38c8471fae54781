"""Field-scoped term composition, including order-preserving numerics.

Re-expresses the reference's MiruTermComposer (miru-api/.../activity/
schema/MiruTermComposer.java:130-141,202-211): non-text metadata fields are
indexed as composed terms in the SAME posting space as text tokens, with the
field name and a `\\x1f` (unit separator) prefix -- the analyzer never emits
control characters, so composed terms can't collide with text tokens.

Numeric values are encoded as fixed-width, sign-offset hexadecimal so that
LEXICOGRAPHIC term order equals NUMERIC order (the reference's
lexicographic byte encoding for rawRange/numeric prefixes,
MiruFieldDefinition.java:139-198 Prefix types). A numeric range query is
then a term-dictionary range scan between the two encoded endpoints --
identical machinery to wildcard prefix expansion, and it prunes parquet
row groups the same way.

Field terms are FILTER-ONLY: they never join the BM25 scoring set,
matching the reference where MiruFilter constraints gate the bitmap but
only collected full-text query terms score (FullText.java:99-170
termCollector).
"""

from __future__ import annotations

import re

FIELD_SEP = "\x1f"

# Schema registry analog (MiruFieldDefinition): which queryable fields
# carry numeric (order-preserving-encoded) values.
NUMERIC_FIELDS = frozenset({"site", "doclen"})

_SIGN_OFFSET = 1 << 63  # maps int64 onto uint64 preserving order


def encode_num(v: int) -> str:
    """Order-preserving fixed-width encoding of an int64: lexicographic
    compare of encodings == numeric compare of values."""
    u = int(v) + _SIGN_OFFSET
    if not 0 <= u < (1 << 64):
        raise ValueError(f"numeric field value out of int64 range: {v}")
    return format(u, "017x")


def decode_num(s: str) -> int:
    return int(s, 16) - _SIGN_OFFSET


def compose(field: str, value: str) -> str:
    return f"{field}{FIELD_SEP}{value}"


def compose_value(field: str, value) -> str:
    """Compose a field term, numeric-encoding values of numeric fields."""
    if field in NUMERIC_FIELDS:
        return compose(field, encode_num(int(value)))
    return compose(field, str(value).lower())


_SITE_RE = re.compile(r"^https?://[a-z]*?(\d+)\.")


def doc_field_terms(
    url: str, lang: str | None, doc_len: int, authz=None
) -> list[str]:
    """Deterministic per-doc metadata field terms indexed alongside the
    text tokens (tf=1 each). Fields: `lang` keyword, `site` numeric (the
    crawl host id embedded in the synthetic url), `doclen` numeric --
    the numeric-`obj`-field shape MiruFullTextNGTest.java:52-73 queries
    by range -- plus one `authz` keyword term per access label carried on
    the doc (the MiruActivity.authz field, miru-api/.../activity/
    MiruActivity.java:38; indexed per value like MiruAuthzIndex so a
    query-side authz expression is an OR over label postings,
    MiruAuthzUtils.getCompositeAuthz:24-33)."""
    out = []
    if lang:
        out.append(compose("lang", str(lang).lower()))
    m = _SITE_RE.match(url or "")
    if m:
        out.append(compose("site", encode_num(int(m.group(1)))))
    out.append(compose("doclen", encode_num(int(doc_len))))
    if authz:
        if isinstance(authz, (str, bytes)):
            # a bare string iterates per CHARACTER -- one bogus
            # single-char label per letter, and any grant sharing a
            # character would then match the doc. Always a caller bug.
            raise TypeError(
                "authz must be an iterable of labels, not a bare "
                "string; wrap it: authz=[label]"
            )
        # dedupe (case-folded): a repeated label must not emit a
        # duplicate docID into the term's posting list
        out.extend(
            compose("authz", lbl)
            for lbl in sorted({str(a).lower() for a in authz})
        )
    return out


def extra_field_terms(fields_map, declared: list[str]) -> list[str]:
    """Composed terms for the schema-declared EXTRA fields of one doc --
    the MiruSchema analog (miru-api/.../schema/MiruSchema.java: arbitrary
    multi-term fields per activity, each indexed per value like
    MiruFieldIndex). `fields_map` is the doc's `fields` map column
    (field -> array of string values); only fields in `declared` are
    indexed, values are case-folded and deduped (same discipline as
    authz labels). pyarrow map columns decode to key/value tuple lists,
    plain dict inputs also accepted."""
    if not fields_map:
        return []
    if not isinstance(fields_map, dict):
        fields_map = dict(fields_map)
    out: list[str] = []
    for f in declared:
        vals = fields_map.get(f)
        if vals:
            if isinstance(vals, (str, bytes)):
                raise TypeError(
                    f"field {f!r} values must be a list of strings, "
                    f"not a bare string (it would index per character)"
                )
            out.extend(
                compose(f, v)
                for v in sorted({str(v).lower() for v in vals})
            )
    return out
