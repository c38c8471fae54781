"""Reference JSON wire-shape adapter: saved miru requests run unchanged.

A reference deployment speaks JSON request POJOs over HTTP: a MiruRequest
envelope (miru-api/.../MiruRequest.java: tenantId, actorId,
authzExpression, query, logLevel) whose `query` payload is one of the
plugin request classes (FullTextQuery, AnalyticsQuery, TrendingQuery,
DistinctsQuery, UniquesQuery, DistinctCountQuery, AggregateCountsQuery,
MetricsQuery, StumptownQuery, AnomalyQuery, RecoQuery, StrutQuery). Users
keep libraries of these requests (dashboards, saved searches, alerting
rules); migration means those JSON bodies must keep working.

This module converts each wire shape into the equivalent engine call:

- `filter_tree` renders a MiruFilter JSON dict into the engine's filter
  tree, operand for operand with the reference's evaluator
  (MiruAggregateUtil.filterInOut, miru-plugin/.../solution/
  MiruAggregateUtil.java:1122-1201 + executeFilter:1222-1239):
  inclusiveFilter prepends the index mask (= our ("all",) node, which
  already excludes tombstones); each MiruFieldFilter ORs its values'
  composed-term postings (wildcard values -- last part "*" -- become
  prefix scans, MiruAggregateUtil.java:1154-1167); an `and` filter whose
  field filter matched no terms short-circuits to empty
  (abortIfEmpty, :1143,1177); subFilters recurse; the operand list then
  combines under the filter's operation -- and/or/pButNotQ are the only
  operations the reference implements (MiruFilterOperation.java:12-21,
  executeFilter throws UnsupportedOperationException on the rest, and so
  do we). pButNotQ = andNotTx(first, rest...) = first AND NOT (OR rest).

- `time_range_us` reads a MiruTimeRange (smallestTimestamp,
  largestTimestamp -- MiruTimeRange.java:12 ALL_TIME = (0, Long.MAX)).
  DEVIATION: the reference packs epoch millis through a snowflake
  orderId packer host-side; this engine's time axis is plain epoch
  MICROseconds (the webtext `warc_ts` column), so wire ranges here carry
  epoch micros. ALL_TIME and null both mean "no bound".

- `execute(engine, kind, request)` dispatches a full MiruRequest (or a
  bare query payload) to the SearchEngine method that answers that
  endpoint, returning that method's native result shape. The envelope's
  authzExpression.values become the granted-label list
  (MiruAuthzExpression.java:13 NOT_PROVIDED = null values = skip authz).

MiruFilter.NO_FILTER -- (or, false, null, null), MiruFilter.java:12-16 --
is detected structurally and treated as "no constraint", exactly as the
question implementations do (FullTextCustomQuestion.java:91,
Analytics.java:113 skip the filter pass when NO_FILTER.equals(...)).
"""

from __future__ import annotations

from .fields import FIELD_SEP, NUMERIC_FIELDS, compose, compose_value

_LONG_MAX = (1 << 63) - 1

#: executeFilter's supported truth-table rows
#: (MiruAggregateUtil.java:1229-1236).
_SUPPORTED_OPS = ("and", "or", "pButNotQ")


class WireError(ValueError):
    """A wire request this adapter (or the reference itself) rejects."""


# ---------------------------------------------------------------- values


def value_parts(v) -> list[str]:
    """MiruValue JSON is {"parts": [...]} (MiruValue.java:15-18); accept
    a bare string or list as the obvious shorthand."""
    if isinstance(v, str):
        return [v]
    if isinstance(v, (list, tuple)):
        return [str(p) for p in v]
    if isinstance(v, dict) and "parts" in v:
        return [str(p) for p in v["parts"]]
    raise WireError(f"not a MiruValue: {v!r}")


def _compose_parts(field: str, parts: list[str]) -> str:
    """termComposer.compose analog (MiruTermComposer.java:202-211):
    multi-part values join under the same unit separator the field
    prefix uses; numeric fields get the order-preserving encoding."""
    if not parts:
        raise WireError(f"empty MiruValue for field {field!r}")
    if field in NUMERIC_FIELDS and len(parts) == 1:
        try:
            return compose_value(field, parts[0])
        except ValueError as e:
            # a non-numeric value for a numeric field is a malformed
            # request, not an int-parse traceback
            raise WireError(
                f"non-numeric value {parts[0]!r} for numeric field "
                f"{field!r}"
            ) from e
    return compose(field, FIELD_SEP.join(str(p).lower() for p in parts))


# ---------------------------------------------------------------- filter


def is_no_filter(f) -> bool:
    """Structural MiruFilter.NO_FILTER match (MiruFilter.java:12-16)."""
    if f is None:
        return True
    return (
        f.get("operation", "or") in (None, "or")
        and not f.get("inclusiveFilter", False)
        and not f.get("fieldFilters")
        and not f.get("subFilters")
    )


def filter_tree(f):
    """MiruFilter JSON dict -> engine filter tree; None for NO_FILTER."""
    if is_no_filter(f):
        return None
    return _filter_tree(f)


def _filter_tree(f):
    op = f.get("operation") or "or"
    if op not in _SUPPORTED_OPS:
        # executeFilter parity (MiruAggregateUtil.java:1236)
        raise WireError(f"{op} isn't currently supported.")
    operands = []
    if f.get("inclusiveFilter"):
        # buildIndexMask: the full universe minus removals -- the
        # engine's ("all",) node already composes the tombstone mask
        operands.append(("all",))
    for ff in f.get("fieldFilters") or []:
        ftype = ff.get("fieldType", "primary")
        if ftype not in (None, "primary"):
            # the engine's aux indexes (latest/pairedLatest/bloom) are
            # query OPS, not filter operands; fail loudly rather than
            # silently answering from the wrong index
            raise WireError(
                f"fieldType {ftype!r} field filters are not supported; "
                "use the latest/bloom query operators instead"
            )
        field = ff.get("fieldName")
        if not field:
            raise WireError("MiruFieldFilter without fieldName")
        nodes = []
        for v in ff.get("values") or []:
            parts = value_parts(v)
            if parts and parts[-1] == "*":
                # wildcard value: term-dictionary range scan over the
                # composed prefix (MiruAggregateUtil.java:1154-1167);
                # expansion happens at prep time, capped like any other
                # prefix node
                base = FIELD_SEP.join(
                    str(p).lower() for p in parts[:-1]
                )
                nodes.append(("prefix", compose(field, base)))
            else:
                nodes.append(("term", _compose_parts(field, parts)))
        if not nodes:
            if op == "and":
                # abortIfEmpty: an `and` over a valueless field filter
                # is implicitly empty (MiruAggregateUtil.java:1143,1177)
                return ("none",)
            if op == "pButNotQ":
                # POSITION matters here: an empty FIRST operand empties
                # the whole result, an empty exclusion is a no-op --
                # keep a placeholder so operands stay aligned (skipping
                # would promote the first exclusion into the positive
                # slot and return the very docs meant to be subtracted)
                operands.append(("none",))
            continue
        operands.append(nodes[0] if len(nodes) == 1 else ("or", nodes))
    for sub in f.get("subFilters") or []:
        operands.append(_filter_tree(sub))
    if not operands:
        # andTx/orTx/andNotTx of zero operands is the empty bitmap
        return ("none",)
    if op == "and":
        return operands[0] if len(operands) == 1 else ("and", operands)
    if op == "or":
        return operands[0] if len(operands) == 1 else ("or", operands)
    # pButNotQ: first AND NOT (OR of the rest)
    if operands[0] == ("none",):
        return ("none",)
    negs = [o for o in operands[1:] if o != ("none",)]
    if not negs:
        return operands[0]
    neg = negs[0] if len(negs) == 1 else ("or", negs)
    return ("not", operands[0], neg)


# ------------------------------------------------------------ time/authz


def time_range_us(tr) -> tuple[int, int] | None:
    """MiruTimeRange -> (lo_us, hi_us) or None for null/ALL_TIME."""
    if tr is None:
        return None
    # explicit JSON nulls mean "unbounded", same as an absent key
    lo = int(tr.get("smallestTimestamp") or 0)
    hi = tr.get("largestTimestamp")
    hi = _LONG_MAX if hi is None else int(hi)
    if lo <= 0 and hi >= _LONG_MAX:
        return None
    return (lo, min(hi, _LONG_MAX))


def authz_labels(expr) -> list | None:
    """MiruAuthzExpression -> granted labels; None when NOT_PROVIDED
    (null values, MiruAuthzExpression.java:13) = skip authz. An explicit
    empty list stays a deny-all, matching with_access."""
    if expr is None:
        return None
    vals = expr.get("values") if isinstance(expr, dict) else expr
    if vals is None:
        return None
    return [str(v) for v in vals]


def _segments(tr, n) -> dict:
    """divideTimeRangeIntoNSegments + its range -> engine kwargs. The
    dense-segments mode requires an explicit range (the reference's
    scoresets always carry one)."""
    rng = time_range_us(tr)
    n = int(n or 0)
    if n > 0 and rng is None:
        raise WireError(
            "divideTimeRangeIntoNSegments requires a bounded timeRange"
        )
    out: dict = {"time_range_us": rng}
    if n > 0:
        out["segments"] = n
    return out


def _and_trees(*trees):
    """AND together any non-None trees; None when all are None."""
    ts = [t for t in trees if t is not None]
    if not ts:
        return None
    return ts[0] if len(ts) == 1 else ("and", ts)


# ------------------------------------------------------------- requests


def _payload(request: dict) -> tuple[dict, list | None]:
    """Accept a full MiruRequest envelope or a bare query payload."""
    if "query" in request and isinstance(request["query"], dict):
        return request["query"], authz_labels(request.get("authzExpression"))
    return request, None


def _single_term_seed(f) -> tuple[str, str]:
    """RecoQuery's constraintsFilter is the 'my activity' seed
    (RecoQuestion.java:124 allMyActivity = filter(constraintsFilter));
    the engine's reco seed is one (field, value). Accept exactly that
    shape and reject anything wider, loudly."""
    ffs = (f or {}).get("fieldFilters") or []
    if (
        f is None
        or f.get("subFilters")
        or len(ffs) != 1
        or len(ffs[0].get("values") or []) != 1
    ):
        raise WireError(
            "reco constraintsFilter must be a single-field single-value "
            "seed (the 'my activity' posting)"
        )
    parts = value_parts(ffs[0]["values"][0])
    if parts[-1] == "*":
        raise WireError("reco seed cannot be a wildcard")
    return (ffs[0]["fieldName"], FIELD_SEP.join(parts))


_TREND_STRATEGIES = {
    "LINEAR_REGRESSION": "linear_regression",
    "LEADER": "leader",
    "PEAKS": "peaks",
    "HIGHEST_PEAK": "highest_peak",
}

_STRUT_STRATEGIES = {
    "UNIT_WEIGHTED": "unit_weighted",
    "REGRESSION_WEIGHTED": "regression_weighted",
    "MAX": "max",
}


def execute(engine, kind: str, request: dict, **kw):
    """Answer a reference JSON request against a SearchEngine.

    `kind` names the plugin endpoint the request body belongs to
    (the reference routes by URL path, not by a field in the JSON):
    fulltext | analytics | distincts | uniques | trending | count |
    metrics | stumptown | anomaly | reco | strut | aggregate-counts.

    Returns the native result shape of the engine method answering that
    endpoint (documented on each method). Extra keyword args pass
    through (e.g. read_state= for unread-aware endpoints,
    highlight_from= for fulltext summaries)."""
    q, authz = _payload(request)
    kind = kind.replace("_", "-").lower()
    if kind == "fulltext":
        return _fulltext(engine, q, authz, **kw)
    if kind == "analytics":
        return _analytics(engine, q, authz, **kw)
    if kind == "distincts":
        return _distincts(engine, q, authz, **kw)
    if kind == "uniques":
        return _uniques(engine, q, authz, **kw)
    if kind == "trending":
        return _trending(engine, q, authz, **kw)
    if kind in ("count", "distinct-count"):
        return _distinct_count(engine, q, authz, **kw)
    if kind == "metrics":
        return _metrics(engine, q, authz, **kw)
    if kind == "stumptown":
        return _stumptown(engine, q, authz, **kw)
    if kind == "anomaly":
        return _anomaly(engine, q, authz, **kw)
    if kind == "reco":
        return _reco(engine, q, authz, **kw)
    if kind == "strut":
        return _strut(engine, q, authz, **kw)
    if kind == "aggregate-counts":
        return _aggregate_counts(engine, q, authz, **kw)
    raise WireError(f"unknown endpoint kind: {kind!r}")


def _fulltext(engine, q, authz, **kw):
    """FullTextQuery.java:30-53. TF_IDF -> search (BM25 top-k);
    TIME -> newest-k. useStopWords picks the locale's stopword vs
    non-stopword analyzer -- same tokenize/stem chain either way
    (TermAnalyzers.findAnalyzer:117-133)."""
    common = dict(
        locale=q.get("locale"),
        use_stopwords=bool(q.get("useStopWords", True)),
        time_range_us=time_range_us(q.get("timeRange")),
        constraints=filter_tree(q.get("constraintsFilter")),
        authz=authz,
    )
    # the JSON property is named maxDeterminizedStates but binds the
    # maxWildcardExpansion field (FullTextQuery.java:30-36); <=0 means
    # engine default, exactly how the plugin treats it
    max_expand = int(q.get("maxDeterminizedStates", 0) or 0)
    if max_expand > 0:
        common["max_expand"] = max_expand
    k = int(q.get("desiredNumberOfResults", 10))
    if q.get("strategy", "TF_IDF") == "TIME":
        return engine.newest(k=k, query=q["query"], **common, **kw)
    return engine.search(q["query"], k=k, **common, **kw)


def _analytics(engine, q, authz, **kw):
    """AnalyticsQuery.java:14-18: a list of keyed scoresets (range + N
    segments each) over a shared map of keyed filters, all under one
    constraints filter. Returns {scoreSetKey: {filterKey: [(bucket_us,
    count)]}} -- Analytics.analyze's waveform map per scoreset."""
    cons = filter_tree(q.get("constraintsFilter"))
    queries = {
        key: filter_tree(f)  # None = match-all, like a null filter
        for key, f in (q.get("analyticsFilters") or {}).items()
    }
    out = {}
    for ss in q.get("scoreSets") or []:
        seg = _segments(
            ss.get("timeRange"), ss.get("divideTimeRangeIntoNSegments")
        )
        out[ss["key"]] = engine.waveform_many(
            queries, constraints=cons, authz=authz, **seg, **kw
        )
    return out


def _prefix_list(q) -> list | None:
    """DistinctsQuery/UniquesQuery `prefixes`: MiruValues that are plain
    value prefixes (Distincts.java feeds them to prefixLowerInclusive);
    a trailing "*" part, if present, is just the wildcard spelling."""
    out = []
    for p in q.get("prefixes") or []:
        parts = value_parts(p)
        if parts and parts[-1] == "*":
            parts = parts[:-1]
        out.append(FIELD_SEP.join(str(x).lower() for x in parts))
    return out or None


def _distincts(engine, q, authz, **kw):
    """DistinctsQuery.java:15-19; the engine's `prefix` takes the whole
    list (values matching ANY prefix gather)."""
    return engine.distincts(
        q["gatherDistinctsForField"],
        constraints=filter_tree(q.get("constraintsFilter")),
        authz=authz,
        time_range_us=time_range_us(q.get("timeRange")),
        prefix=_prefix_list(q),
        **kw,
    )


def _uniques(engine, q, authz, **kw):
    """UniquesQuery.java:15-21 -> number of distinct field values."""
    cons = filter_tree(q.get("constraintsFilter"))
    rng = time_range_us(q.get("timeRange"))
    return engine.uniques(
        q["gatherUniquesForField"],
        constraints=cons,
        authz=authz,
        time_range_us=rng,
        prefix=_prefix_list(q),
        **kw,
    )


def _trending_candidate_tree(q):
    """TrendingQuery.distinctQueries: 'inner lists are OR'd together,
    the outer list is AND'd together' (TrendingQuery.java:24) -- each
    leaf contributes its constraints filter."""
    outer = []
    for inner in q.get("distinctQueries") or []:
        ts = [filter_tree(d.get("constraintsFilter")) for d in inner]
        ts = [t for t in ts if t is not None]
        if ts:
            outer.append(ts[0] if len(ts) == 1 else ("or", ts))
    return _and_trees(*outer) if outer else None


def _trending(engine, q, authz, **kw):
    """TrendingQuery.java:14-24: per scoreset, each requested strategy's
    top-N trends of `aggregateCountAroundField`. Returns
    {scoreSetKey: {strategy: [(value, score), ...]}}."""
    field = q["aggregateCountAroundField"]
    cons = _and_trees(
        filter_tree(q.get("constraintsFilter")), _trending_candidate_tree(q)
    )
    out = {}
    for ss in q.get("scoreSets") or []:
        seg = _segments(
            ss.get("timeRange"), ss.get("divideTimeRangeIntoNSegments")
        )
        per = {}
        for strat in ss.get("strategies") or ["LINEAR_REGRESSION"]:
            name = _TREND_STRATEGIES.get(str(strat).upper())
            if name is None:
                raise WireError(f"unknown trending strategy {strat!r}")
            per[str(strat)] = engine.trending(
                field,
                strategy=name,
                top_n=int(ss.get("desiredNumberOfDistincts", 10)),
                constraints=cons,
                authz=authz,
                **seg,
                **kw,
            )
        out[ss["key"]] = per
    return out


def _distinct_count(engine, q, authz, **kw):
    """DistinctCountQuery.java:17-25: |distinct values of
    aggregateCountAroundField| among docs passing streamFilter AND
    constraintsFilter (the custom question ANDs both,
    DistinctCountCustomQuestion.java). A non-empty streamId scopes to
    that inbox stream's posting (DistinctCountInboxQuestion); unreadOnly
    needs the read-state table -- pass read_state= through."""
    field = q["aggregateCountAroundField"]
    cons = _and_trees(
        filter_tree(q.get("streamFilter")),
        filter_tree(q.get("constraintsFilter")),
    )
    rng = time_range_us(q.get("timeRange"))
    stream = _stream_id(q)
    if stream is None:
        if q.get("unreadOnly"):
            raise WireError("unreadOnly requires a streamId inbox scope")
        n = engine.uniques(
            field, constraints=cons, authz=authz, time_range_us=rng, **kw
        )
        return min(n, int(q.get("desiredNumberOfDistincts", n) or n))
    page = engine.inbox(
        stream,
        item_field=field,
        count=int(q.get("desiredNumberOfDistincts", 10)),
        unread_only=bool(q.get("unreadOnly")),
        constraints=cons,
        authz=authz,
        time_range_us=rng,
        **kw,
    )
    return page["n_unread"] if q.get("unreadOnly") else page["n_items"]


def _stream_id(q):
    """MiruStreamId JSON ({"bytes": ...} or a plain string); empty/null
    = not an inbox question."""
    s = q.get("streamId")
    if s is None:
        return None
    if isinstance(s, dict):
        s = s.get("bytes") or s.get("value")
    if s in (None, "", []):
        return None
    return s


def _metrics(engine, q, authz, **kw):
    """MetricsQuery.java:15-19: keyed filters -> per-key bit-sliced
    metric sums over the powerBits field (Metrics.metricingSum).
    Returns {filterKey: [(bucket_us, sum)]}."""
    from .siphon import anomaly_sum

    cons = filter_tree(q.get("constraintsFilter"))
    seg = _segments(
        q.get("timeRange"), q.get("divideTimeRangeIntoNSegments")
    )
    out = {}
    for key, f in (q.get("filters") or {}).items():
        out[key] = anomaly_sum(
            engine,
            query=filter_tree(f),
            constraints=cons,
            authz=authz,
            **seg,
            **kw,
        )
    return out


def _stumptown(engine, q, authz, **kw):
    """StumptownQuery.java:15-19: per keyed filter, the waveform + the
    newest-k matching docs. Returns {filterKey: stumptown dict}."""
    cons = filter_tree(q.get("constraintsFilter"))
    seg = _segments(
        q.get("timeRange"), q.get("divideTimeRangeIntoNSegments")
    )
    k = int(q.get("desiredNumberOfResultsPerWaveform", 10))
    return {
        key: engine.stumptown(
            filter_tree(f),
            k=k,
            constraints=cons,
            authz=authz,
            **seg,
            **kw,
        )
        for key, f in (q.get("stumptownFilters") or {}).items()
    }


def _anomaly(engine, q, authz, **kw):
    """AnomalyQuery.java:16-23: metrics plus an expansion -- when
    expansionField is set with concrete values, one keyed answer per
    (filterKey, expansionValue) with the expansion term AND'd in."""
    base = _metrics_like_filters(q)
    cons = filter_tree(q.get("constraintsFilter"))
    seg = _segments(
        q.get("timeRange"), q.get("divideTimeRangeIntoNSegments")
    )
    from .siphon import anomaly_sum

    exp_field = q.get("expansionField")
    exp_vals = [
        v for v in (q.get("expansionValues") or []) if v and v != "*"
    ]
    out = {}
    for key, tree in base.items():
        if exp_field and exp_vals:
            for v in exp_vals:
                t = _and_trees(tree, ("term", _compose_parts(
                    exp_field, value_parts(v))))
                out[f"{key}\x1f{v}"] = anomaly_sum(
                    engine, query=t, constraints=cons, authz=authz,
                    **seg, **kw,
                )
        else:
            out[key] = anomaly_sum(
                engine, query=tree, constraints=cons, authz=authz,
                **seg, **kw,
            )
    return out


def _metrics_like_filters(q) -> dict:
    return {
        key: filter_tree(f)
        for key, f in (q.get("filters") or {}).items()
    }


def _reco(engine, q, authz, **kw):
    """RecoQuery.java:17-25: constraintsFilter carries the 'my activity'
    seed (RecoQuestion.java:124); scorableFilter gates which activity is
    considered throughout (RecoQuestion.java:90); removeDistinctsQuery
    excludes already-seen parents."""
    my = _single_term_seed(q.get("constraintsFilter"))
    remove = None
    rd = q.get("removeDistinctsQuery")
    if rd is not None:
        remove = [
            v for v, _c in _distincts(engine, rd, authz)
        ]
    return engine.reco(
        my,
        q["aggregateFieldName1"],
        q["aggregateFieldName2"],
        q["aggregateFieldName3"],
        k=int(q.get("desiredNumberOfDistincts", 10)),
        constraints=filter_tree(q.get("scorableFilter")),
        authz=authz,
        time_range_us=time_range_us(q.get("timeRange")),
        remove_distincts=remove,
        **kw,
    )


def _strut(engine, q, authz, **kw):
    """StrutQuery.java:20-40 + CatwalkDefinition (CatwalkQuery.java):
    score the scorableField candidates by model-weighted feature counts.
    Feature list and strategy come from the definition; the model (or
    model_id for the serving-node score cache) passes through kw."""
    cd = q.get("catwalkDefinition") or {}
    feats = [
        (1.0, tuple(f["featureFields"]))
        for f in (cd.get("features") or [])
    ]
    if not feats:
        raise WireError("strut request without catwalk features")
    scalars = q.get("numeratorScalars")
    if scalars:
        if len(scalars) < len(feats):
            # silently wrapping would score features with the WRONG
            # weights while the request appears to succeed
            raise WireError(
                f"numeratorScalars has {len(scalars)} entries for "
                f"{len(feats)} catwalk features"
            )
        feats = [
            (float(scalars[i % len(scalars)]), ff)
            for i, (_s, ff) in enumerate(feats)
        ]
    strat = _STRUT_STRATEGIES.get(
        str(q.get("numeratorStrategy", "UNIT_WEIGHTED")).upper()
    )
    if strat is None:
        raise WireError(
            f"unknown strut strategy {q.get('numeratorStrategy')!r}"
        )
    model_id = None
    ms = q.get("modelScalars") or []
    if ms:
        model_id = ms[0].get("modelId")
    return engine.strut(
        cd.get("scorableField") or cd.get("gatherField"),
        feats,
        strategy=strat,
        k=int(q.get("desiredNumberOfResults", 10)),
        constraints=_and_trees(
            filter_tree(q.get("constraintFilter")),
            filter_tree(cd.get("scorableFilter")),
        ),
        authz=authz,
        time_range_us=time_range_us(q.get("timeRange")),
        include_features=bool(q.get("includeFeatures")),
        model_id=model_id,
        **kw,
    )


def _aggregate_counts(engine, q, authz, **kw):
    """AggregateCountsQuery.java:19-29: per named constraint, a page of
    distinct aggregateCountAroundField values with counts; a non-empty
    streamId makes it the inbox question (streamFilter = the inbox
    scope, unread resolved against read_state). Returns
    {constraintKey: page}."""
    stream = _stream_id(q)
    stream_cons = filter_tree(q.get("streamFilter"))
    rng = time_range_us(
        q.get("answerTimeRange") or q.get("collectTimeRange")
    )
    out = {}
    for key, c in (q.get("constraints") or {}).items():
        cons = _and_trees(
            stream_cons, filter_tree(c.get("constraintsFilter"))
        )
        field = c["aggregateCountAroundField"]
        start = int(c.get("startFromDistinctN", 0))
        count = int(c.get("desiredNumberOfDistincts", 10))
        gather = list(c.get("gatherTermsForFields") or []) or None
        if stream is None:
            out[key] = engine.aggregate_counts(
                field,
                start=start,
                count=count,
                constraints=cons,
                authz=authz,
                time_range_us=rng,
                gather_fields=gather,
                **kw,
            )
        else:
            out[key] = engine.inbox(
                stream,
                item_field=field,
                start=start,
                count=count,
                unread_only=bool(q.get("unreadOnly")),
                constraints=cons,
                authz=authz,
                time_range_us=rng,
                **kw,
            )
    return out
