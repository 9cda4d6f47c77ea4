"""OpenSearch-Dashboards saved-object ingestion: parse the ndjson
export format the reference ships (source/saved_objects/
each-indexpattern-search/*.ndjson, each-dashboard/*.ndjson) and
translate each panel into this engine's aggregation calls.

The export format is public (Kibana/OpenSearch-Dashboards saved
objects): one JSON object per line with ``type`` in {index-pattern,
search, visualization, dashboard}, the search source under
``attributes.kibanaSavedObjectMeta.searchSourceJSON`` and the
visualization definition under ``attributes.visState``.  The
reference's panels use a small agg vocabulary — count / cardinality /
sum metrics over terms / filters / date_histogram buckets (measured
across its dashboards) — all of which map 1:1 onto Searcher
aggregation methods, so a user's existing dashboards describe
executable queries here.

Scale shape: parsing is driver-side metadata work; execution calls
the same aggregation paths the oracle entries exercise (per-shard
partials on doc-partitioned indexes).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class PanelSpec:
    """One visualization, normalized."""
    title: str
    vis_type: str
    metric: dict = field(default_factory=lambda: {"type": "count"})
    buckets: list = field(default_factory=list)
    query: str = ""
    query_language: str = "kuery"
    # single-clause kuery 'field:"value"' lowers to a keyword filter
    filter_field: str | None = None
    filter_value: str | None = None
    # searchSourceJSON filter PILLS (phrase/phrases/exists, negatable)
    # lowered to aggregation-context filter specs — the reference's
    # dashboards narrow almost every panel this way
    pill_filters: tuple = ()
    supported: bool = True
    reason: str = ""


import re as _re

_KUERY_KV = _re.compile(
    r'^\s*([\w.@-]+)\s*:\s*(?:"([^"]*)"|([\w.-]+))\s*$')

_UNIT_MICROS = {"s": 1_000_000, "m": 60_000_000, "h": 3_600_000_000,
                "d": 86_400_000_000, "auto": 3_600_000_000,
                "w": 7 * 86_400_000_000}


def _fixed_interval_micros(interval) -> int:
    """'30s'/'h'/'auto' -> epoch-micro bucket width; raises on
    calendar intervals (month+), which are not a fixed micro count —
    those route through :func:`execute_panel`'s ``dataset=`` path."""
    m = _re.fullmatch(r"(\d*)([smhdw]|auto)", str(interval))
    if not m:
        raise ValueError(
            f"calendar date_histogram interval {interval!r} executes on "
            "the Dataset side (stages.windows.calendar_aggregate)")
    return int(m.group(1) or 1) * _UNIT_MICROS[m.group(2)]


def _calendar_unit(interval) -> str | None:
    """OpenSearch calendar_interval spellings -> floor_temporal unit
    (None = not calendar; 'w'/'1w' stays on the fixed 7-day path for
    back-compat — ISO-anchored weeks are available as 'week')."""
    return {"M": "month", "1M": "month", "month": "month",
            "q": "quarter", "1q": "quarter", "quarter": "quarter",
            "y": "year", "1y": "year", "year": "year",
            "week": "week"}.get(str(interval))


@dataclass
class SavedObjects:
    index_patterns: list[str] = field(default_factory=list)
    searches: list[dict] = field(default_factory=list)
    panels: list[PanelSpec] = field(default_factory=list)
    dashboards: list[str] = field(default_factory=list)


_SUPPORTED_METRICS = {"count", "cardinality", "sum", "min", "max", "avg",
                      "percentiles"}
# sibling pipeline aggregations: a scalar computed over the primary
# bucket list on the coordinator (OpenSearch *_bucket aggs)
_BUCKET_PIPELINE = {"max_bucket", "min_bucket", "avg_bucket", "sum_bucket"}
_SUPPORTED_BUCKETS = {"terms", "filters", "date_histogram"}


_KUERY_CLAUSE = _re.compile(
    r'^\s*(not\s+)?([\w.@-]+)\s*(:|>=|<=)\s*'
    r'(?:"([^"]*)"|\(([^()]*)\)|([\w.:*?-]+))\s*$', _re.IGNORECASE)


def parse_kuery_filters(query: str):
    """Lower a CONJUNCTIVE kuery string to context filter specs:
    ``a:"x" and not b:y and c >= 5 and d:(v1 or v2)`` ->
    (("kw","a","x"), ("kw_not","b","y"), ("range","c",5.0,None),
    ("kw","d",("v1","v2"))).  Returns None when any clause is beyond
    the conjunctive field-op grammar (top-level ``or``, bare text
    mixed with field clauses, nested groups) — callers then refuse
    or fall back to the bare-term text path."""
    parts = _re.split(r'\s+and\s+', query.strip(), flags=_re.IGNORECASE)
    out = []
    for part in parts:
        m = _KUERY_CLAUSE.match(part)
        if not m:
            return None
        neg, field, op, quoted, grouped, bare = m.groups()
        if op in (">=", "<="):
            if neg or grouped is not None or quoted is not None:
                return None
            try:
                v = float(bare)
            except ValueError:
                return None
            out.append(("range", field, v if op == ">=" else None,
                        v if op == "<=" else None))
            continue
        suf = "_not" if neg else ""
        if grouped is not None:
            vals = [v.strip().strip('"') for v in
                    _re.split(r'\s+or\s+', grouped, flags=_re.IGNORECASE)]
            if not all(vals):
                return None
            out.append(("kw" + suf, field, tuple(vals)))
        elif bare is not None and ("*" in bare or "?" in bare):
            # unquoted wildcard value (Kibana `field:val*`) — the
            # value dictionary matches shard-side, doc lists union
            out.append(("kw_like" + suf, field, bare))
        else:
            out.append(("kw" + suf, field,
                        quoted if quoted is not None else bare))
    return tuple(sorted(out, key=lambda s_: s_[0].endswith("_not")))


def _parse_pills(ss: dict):
    """searchSourceJSON ``filter`` pills -> context filter specs
    (("kw"/"kw_not", field, value|values), ("exists"/"exists_not",
    field), ("range", field, lo, hi)).  Returns None when any enabled
    pill has a shape the engine can't lower — the panel is then
    marked unsupported instead of silently ignoring the pill."""
    out = []
    for p in ss.get("filter") or []:
        m = p.get("meta", {})
        if m.get("disabled"):
            continue
        typ = m.get("type")
        neg = bool(m.get("negate"))
        key = m.get("key")
        if not key and typ != "custom":
            return None
        if typ == "phrase":
            v = (m.get("params") or {}).get("query")
            if v is None:
                return None
            out.append(("kw_not" if neg else "kw", key, str(v)))
        elif typ == "phrases":
            vs = m.get("params") or []
            if not isinstance(vs, list) or not vs:
                return None
            out.append(("kw_not" if neg else "kw", key,
                        tuple(str(v) for v in vs)))
        elif typ == "exists":
            out.append(("exists_not" if neg else "exists", key))
        elif typ == "range":
            prm = m.get("params") or {}
            if neg or not set(prm) <= {"gte", "lte"}:
                return None
            out.append(("range", key, prm.get("gte"), prm.get("lte")))
        else:
            return None
    # positives first: the pure execution path bases the match set on
    # the first spec
    return tuple(sorted(out, key=lambda s_: s_[0].endswith("_not")))


def _parse_vis(attrs: dict) -> PanelSpec:
    title = attrs.get("title", "")
    try:
        vs = json.loads(attrs["visState"])
    except (KeyError, ValueError):
        return PanelSpec(title, "unknown", supported=False,
                         reason="no parseable visState")
    spec = PanelSpec(title, vs.get("type", "unknown"))
    try:
        ss = json.loads(
            attrs["kibanaSavedObjectMeta"]["searchSourceJSON"])
        q = ss.get("query", {})
        spec.query = (q.get("query") or "") if isinstance(q, dict) else ""
        spec.query_language = (q.get("language", "kuery")
                               if isinstance(q, dict) else "kuery")
        pills = _parse_pills(ss)
        if pills is None:
            spec.supported = False
            spec.reason = "unsupported filter pill shape"
        else:
            spec.pill_filters = pills
    except (KeyError, ValueError):
        pass
    if spec.vis_type in ("markdown", "timelion", "input_control_vis"):
        return PanelSpec(title, spec.vis_type, supported=False,
                         reason=f"non-data panel type {spec.vis_type}")
    metric = None
    for ag in vs.get("aggs", []):
        sch = ag.get("schema")
        ty = ag.get("type")
        prm = ag.get("params", {})
        if sch == "metric" or (metric is None and
                               ty in _SUPPORTED_METRICS | _BUCKET_PIPELINE):
            if ty in _SUPPORTED_METRICS or ty in _BUCKET_PIPELINE:
                if metric is None or metric["type"] == "count":
                    metric = {"type": ty}
                    if prm.get("field"):
                        metric["field"] = prm["field"]
            elif ty != "top_hits":     # top_hits rides as sub-metric
                spec.supported = False
                spec.reason = f"unsupported metric {ty}"
        elif ty in _SUPPORTED_BUCKETS:
            b = {"type": ty}
            if prm.get("field"):
                b["field"] = prm["field"]
            if ty == "terms":
                b["size"] = int(prm.get("size", 10))
            if ty == "date_histogram":
                b["interval"] = prm.get("interval") or \
                    prm.get("calendar_interval", "auto")
            if ty == "filters":
                b["filters"] = [
                    f.get("input", {}).get("query", "")
                    for f in prm.get("filters", [])]
            spec.buckets.append(b)
        elif ty == "top_hits":
            spec.buckets.append({"type": "top_hits",
                                 "size": int(prm.get("size", 1))})
        else:
            spec.supported = False
            spec.reason = f"unsupported bucket {ty}"
    spec.metric = metric or {"type": "count"}
    if spec.query and spec.query_language == "kuery" \
            and any(c in spec.query for c in ":()\""):
        m = _KUERY_KV.match(spec.query)
        if m:
            spec.filter_field = m.group(1)
            spec.filter_value = (m.group(2) if m.group(2) is not None
                                 else m.group(3))
            spec.query = ""
        else:
            # compound conjunctive kuery lowers to filter pills
            # (a:"x" and not b:y and c >= 5 and d:(v1 or v2))
            kf = parse_kuery_filters(spec.query)
            if kf:
                spec.pill_filters = tuple(sorted(
                    spec.pill_filters + kf,
                    key=lambda s_: s_[0].endswith("_not")))
                spec.query = ""
            else:
                spec.supported = False
                spec.reason = ("kuery beyond conjunctive field "
                               "clauses / bare terms")
    return spec


def parse_saved_objects(text: str) -> SavedObjects:
    """Parse one ndjson export (the reference's saved-object files
    verbatim).  Never raises on unknown object types — they are
    simply not surfaced."""
    out = SavedObjects()
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            o = json.loads(line)
        except ValueError:
            continue
        t = o.get("type")
        a = o.get("attributes", {})
        if t == "index-pattern":
            out.index_patterns.append(a.get("title", ""))
        elif t == "search":
            try:
                ss = json.loads(
                    a["kibanaSavedObjectMeta"]["searchSourceJSON"])
            except (KeyError, ValueError):
                ss = {}
            pills = _parse_pills(ss)
            out.searches.append({
                "title": a.get("title", ""),
                "columns": a.get("columns", []),
                "sort": a.get("sort", []),
                "query": (ss.get("query") or {}).get("query", ""),
                "language": (ss.get("query") or {}).get("language",
                                                        "kuery"),
                # None = a pill shape the engine can't lower;
                # execute_search refuses instead of ignoring it
                "filters": pills,
            })
        elif t == "visualization":
            out.panels.append(_parse_vis(a))
        elif t == "dashboard":
            out.dashboards.append(a.get("title", ""))
    return out


def _execute_calendar_panel(dataset, spec: PanelSpec, hist_b: dict,
                            terms_b: dict | None,
                            tz_offset_hours: float) -> list[tuple]:
    """Calendar date_histogram panel (month/quarter/year/week) — month
    lengths are not a fixed micro count, so these buckets come from
    the Dataset side (stages.windows.add_calendar_window, the same
    kernel the orders_monthly/events_weekly oracles prove), not the
    index's epoch-range tables.  Supports count / sum / min / max /
    avg metrics, an optional terms split series, and the kuery
    field:"value" filter; the match set is the (filtered) table."""
    if dataset is None:
        raise ValueError(
            "calendar date_histogram panels execute on the Dataset "
            "side — pass dataset= (the panel's source table)")
    if spec.query:
        raise ValueError("calendar panels support match-all or a kuery "
                         "field filter, not fulltext queries")
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    from ..stages.windows import add_calendar_window
    unit = _calendar_unit(hist_b["interval"])
    ts_col = hist_b.get("field") or "@timestamp"
    ds = dataset
    ff, fv = spec.filter_field, spec.filter_value
    if ff is not None:
        ds = ds.map_batches(
            lambda b: b.filter(pc.equal(b.column(ff), fv)),
            batch_format="pyarrow")
    if spec.pill_filters:
        # filter pills apply as ONE vectorized Arrow mask per batch
        # (Dataset side — calendar panels never touch the index)
        pills = tuple(spec.pill_filters)

        def _apply_pills(b):
            import pyarrow as _pa
            mask = None
            for sp in pills:
                kind = sp[0]
                if kind in ("kw", "kw_not"):
                    vals = (sp[2] if isinstance(sp[2], tuple)
                            else (sp[2],))
                    m = pc.is_in(b.column(sp[1]),
                                 value_set=_pa.array(list(vals)))
                elif kind == "range":
                    col = b.column(sp[1])
                    m = None
                    if sp[2] is not None:
                        m = pc.greater_equal(col, sp[2])
                    if sp[3] is not None:
                        m2 = pc.less_equal(col, sp[3])
                        m = m2 if m is None else pc.and_(m, m2)
                    if m is None:
                        m = pc.is_valid(col)
                elif kind in ("exists", "exists_not"):
                    m = pc.is_valid(b.column(sp[1]))
                elif kind in ("kw_like", "kw_like_not"):
                    import fnmatch as _fn
                    m = pc.match_substring_regex(
                        b.column(sp[1]), _fn.translate(sp[2]))
                else:
                    raise ValueError(f"pill kind {kind!r}")
                if kind.endswith("_not"):
                    # a doc missing the field never matches the
                    # positive form, so it SURVIVES the negation
                    m = pc.invert(pc.fill_null(m, False))
                mask = m if mask is None else pc.and_(mask, m)
            return b.filter(mask)
        ds = ds.map_batches(_apply_pills, batch_format="pyarrow")
    win = ds.map_batches(
        lambda b: add_calendar_window(b, ts_col, unit, tz_offset_hours),
        batch_format="pyarrow")
    keys = (([terms_b["field"]] if terms_b is not None else [])
            + ["bucket_epoch"])
    mtype = spec.metric["type"]
    if mtype == "count":
        agg = Count(alias_name="_v")
    elif mtype in ("sum", "min", "max", "avg"):
        agg = {"sum": Sum, "min": Min, "max": Max, "avg": Mean}[mtype](
            spec.metric["field"], alias_name="_v")
    else:
        raise ValueError(f"calendar panel metric {mtype} unsupported")
    out = win.groupby(keys).aggregate(agg).to_pandas().sort_values(keys)
    if terms_b is not None:
        return [((t, int(b)), v) for t, b, v in
                zip(out[terms_b["field"]], out["bucket_epoch"], out["_v"])]
    return [(int(b), v) for b, v in zip(out["bucket_epoch"], out["_v"])]


def execute_panel(searcher, spec: PanelSpec,
                  text_field: str = "content", dataset=None,
                  tz_offset_hours: float = 0.0) -> list[tuple]:
    """Run one supported panel against an index.

    - terms bucket × count  -> terms_aggregation (match-all via the
      packed filter postings when the panel query is empty — the
      dashboards' dominant shape), truncated to the panel size.
    - terms bucket × sum    -> terms_stats_aggregation's sum column.
    - filters bucket        -> filters_aggregation.
    - metric-only count / cardinality over a terms field.
    - calendar date_histogram (month+) -> Dataset-side calendar
      buckets (requires ``dataset=``, the panel's source table).
    Returns [(bucket_value, number)] rows.
    """
    if not spec.supported:
        raise ValueError(f"unsupported panel: {spec.reason}")
    mtype = spec.metric["type"]
    if spec.pill_filters:
        # filter PILLS: install as ambient aggregation context (the
        # same machinery the DSL's bool-filtered contexts use), fold
        # the single kuery filter in as one more pill, and re-enter
        # with a query that routes every branch through the
        # chokepoint-honoring agg paths (pure sentinel when the panel
        # has no text query)
        from dataclasses import replace

        from ..state.searcher import ctx_filters
        hist_b0 = next((b for b in spec.buckets
                        if b["type"] == "date_histogram"), None)
        if hist_b0 is not None and \
                _calendar_unit(hist_b0.get("interval")) is not None:
            # calendar panels run Dataset-side; the pills apply there
            # as vectorized Arrow masks (no index context needed)
            terms_b0 = next((b for b in spec.buckets
                             if b["type"] == "terms"), None)
            return _execute_calendar_panel(dataset, spec, hist_b0,
                                           terms_b0, tz_offset_hours)
        pills = tuple(spec.pill_filters)
        if spec.filter_field is not None:
            pills = (("kw", spec.filter_field, spec.filter_value),) \
                + pills
        pills = tuple(sorted(pills,
                             key=lambda s_: s_[0].endswith("_not")))
        pure = not spec.query
        if pure and pills[0][0].endswith("_not"):
            raise ValueError("panel filter pills need at least one "
                             "positive filter when the panel has no "
                             "query")
        inner = replace(spec, pill_filters=(), filter_field=None,
                        filter_value=None,
                        query=spec.query or "ctxpure")
        with ctx_filters(searcher, pills, pure):
            bucket0 = next((b for b in spec.buckets
                            if b["type"] in _SUPPORTED_BUCKETS), None)
            if bucket0 is None and mtype == "count":
                return [(spec.title or "count",
                         int(searcher.match_count(inner.query,
                                                  field=text_field)))]
            if bucket0 is None and mtype == "cardinality":
                f = spec.metric.get("field")
                if f is None:
                    raise ValueError("cardinality panel needs a field")
                return [(f, int(searcher.cardinality_aggregation(
                    inner.query, f, text_field)))]
            return execute_panel(searcher, inner, text_field, dataset,
                                 tz_offset_hours)
    bucket = next((b for b in spec.buckets
                   if b["type"] in _SUPPORTED_BUCKETS), None)
    if bucket is None and mtype in ("count", "cardinality"):
        # metric-only panel over the whole match set (works against a
        # single index or a MultiSearcher pattern — counts federate)
        f = spec.metric.get("field")
        if f is None:
            raise ValueError("metric-only count panel needs a field "
                             "to count over in this engine")
        counts = searcher.filter_value_counts(f)
        n = (len(counts) if mtype == "cardinality"
             else sum(counts.values()))
        return [(spec.title or mtype, n)]
    if bucket is None:
        raise ValueError("panel has no executable bucket")
    terms_b = next((b for b in spec.buckets if b["type"] == "terms"), None)
    hist_b = next((b for b in spec.buckets
                   if b["type"] == "date_histogram"), None)
    if hist_b is not None and \
            _calendar_unit(hist_b.get("interval")) is not None:
        return _execute_calendar_panel(dataset, spec, hist_b, terms_b,
                                       tz_offset_hours)
    if terms_b is not None and hist_b is not None \
            and mtype == "count" and spec.query:
        # the area/line chart's split-series shape: terms x
        # date_histogram -> one nested aggregation call
        micros = _fixed_interval_micros(hist_b.get("interval", "auto"))
        rows3 = searcher.terms_histogram_aggregation(
            spec.query, terms_b["field"],
            hist_b.get("field") or "@timestamp", float(micros),
            field=text_field)
        return [((v, int(b)), n) for v, b, n in rows3]
    if bucket["type"] == "filters":
        # one bucket PER configured filter: disambiguate duplicate query
        # strings (and empty inputs beyond index 0) positionally so a
        # dict key collision can't silently collapse two panel filters
        named: dict[str, tuple[str, str]] = {}
        for i, q in enumerate(bucket.get("filters", [])):
            name = q or f"filter_{i}"
            if name in named:
                name = f"{name}#{i}"
            named[name] = (q or "", "or")
        res = searcher.filters_aggregation(named, field=text_field)
        return sorted(res.items())
    if bucket["type"] == "date_histogram":
        # fixed intervals run against the indexed timestamp range
        # field (epoch micros); calendar intervals (month+) belong to
        # the Dataset side (stages.windows.calendar_aggregate) because
        # month lengths are not a fixed micro count
        micros = _fixed_interval_micros(bucket.get("interval", "auto"))
        ts_field = bucket.get("field") or "@timestamp"
        buckets_out = searcher.histogram_aggregation(
            spec.query or "", ts_field, float(micros), field=text_field,
            min_doc_count=0) if spec.query else None
        if buckets_out is None:
            raise ValueError("match-all date_histogram needs the "
                             "Dataset-side aggs (no query to bound the "
                             "match set)")
        return [(int(b), n) for b, n in buckets_out]
    agg_field = bucket["field"]
    size = bucket.get("size", 10)
    if spec.filter_field is not None:
        # kuery 'field:"value"' -> keyword-filter match set, counted
        # per agg value via the packed filter postings
        rows = sorted(
            searcher.filtered_value_counts(spec.filter_field,
                                           spec.filter_value,
                                           agg_field).items(),
            key=lambda kv: (-kv[1], kv[0]))
    elif spec.query:
        rows = searcher.terms_aggregation(spec.query, agg_field,
                                          field=text_field)
    else:
        counts = searcher.filter_value_counts(agg_field)
        rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    if mtype == "cardinality":
        return [(agg_field, len(rows))]
    if mtype in ("sum", "min", "max", "avg"):
        f = spec.metric.get("field")
        col = {"sum": 2, "min": 3, "max": 4, "avg": 5}[mtype]
        if spec.filter_field is not None:
            # kuery-filtered stats panel (e.g. the reference's
            # "Accept Src Packets": sum(packets) per src where
            # action=ACCEPT): filter match set -> per-bucket moments
            # via the same partial the sharded agg path uses; the
            # metric field must be indexed as a range_field
            from ..state.searcher import _excl_mask, _group_stats_partial
            from ..state.shard import load_filter_ids
            cand = load_filter_ids(searcher.index_dir, spec.filter_field,
                                   spec.filter_value)
            if cand.size and searcher.tombstones.size:
                cand = cand[_excl_mask(cand, searcher.tombstones)]
            merged = _group_stats_partial(searcher.index_dir, agg_field,
                                          f, cand)
            stats = [(v, n, s, lo, hi, s / n)
                     for v, (n, s, lo, hi) in merged.items()]
            stats.sort(key=lambda r: (-r[1], r[0]))
        elif spec.query:
            stats = searcher.terms_stats_aggregation(
                spec.query, agg_field, f, field=text_field)
        else:
            raise ValueError(f"{mtype} metric without a panel query "
                             "needs the Dataset-side calendar/tumbling "
                             "aggs")
        return [(row[0], row[col]) for row in stats][:size]
    if mtype in _BUCKET_PIPELINE:
        # sibling pipeline agg: one scalar over the primary buckets'
        # counts, computed on the coordinator (OpenSearch parity)
        vals = [n for _, n in rows]
        if not vals:
            return [(mtype, None)]
        out = {"max_bucket": max(vals), "min_bucket": min(vals),
               "sum_bucket": sum(vals),
               "avg_bucket": sum(vals) / len(vals)}[mtype]
        return [(mtype, out)]
    if mtype == "percentiles":
        f = spec.metric.get("field") or agg_field
        if not spec.query:
            raise ValueError("percentiles without a panel query needs "
                             "the Dataset-side aggs")
        st = searcher.stats_aggregation(spec.query, f, field=text_field,
                                        quantiles=(0.5, 0.95))
        return [("p50", st["p50"]), ("p95", st["p95"])]
    return rows[:size]


def execute_search(searcher, saved: dict, k: int = 500,
                   text_field: str = "content",
                   time_field: str = "@timestamp"):
    """Execute a Discover saved search (the ``search`` saved objects
    the reference ships alongside every dashboard,
    source/saved_objects/each-dashboard/*.ndjson): kuery filter +
    sort (``attributes.sort``, default ``time_field`` desc — the
    Discover default) + docstore fetch of ``attributes.columns`` for
    the top page (Discover's sample size, default 500).

    Scale shape: the sort runs per doc shard (each shard ships k
    (value, doc_id) rows via the value-sorted range tables — no
    sort, no postings for match-all), and the docstore fetch reads
    only the k result ids with a parquet IN filter.

    Returns a pyarrow Table: doc_id, the sort field, then the saved
    columns that exist in the docstore, rows in result order."""
    import pyarrow as pa

    query = saved.get("query") or ""
    ff = fv = None
    kuery_pills: tuple = ()
    if query and saved.get("language", "kuery") == "kuery" \
            and any(c in query for c in ':()"'):
        m = _KUERY_KV.match(query)
        if m:
            ff = m.group(1)
            fv = m.group(2) if m.group(2) is not None else m.group(3)
        else:
            kf = parse_kuery_filters(query)
            if not kf:
                raise ValueError(
                    "saved-search kuery beyond conjunctive field "
                    "clauses / bare terms is unsupported")
            kuery_pills = kf
        query = ""
    sort = saved.get("sort") or []
    # exports spell sort as ['f','desc'] or [['f','desc'], ...]
    if sort and not isinstance(sort[0], (list, tuple)):
        sort = [sort]
    sfield, sdir = (sort[0] if sort else (time_field, "desc"))
    pills = saved.get("filters", ())
    if pills is None:
        raise ValueError("saved search carries a filter pill shape "
                         "the engine can't lower (custom raw-DSL?)")
    pills = tuple(pills) + kuery_pills
    if pills:
        # filter PILLS: the same ambient-context lowering panels use —
        # fold the kuery filter in, base on the pure sentinel when
        # there is no text query (field_sorted_search's match-set
        # computation flows through the context chokepoints)
        from ..state.searcher import ctx_filters
        if ff is not None:
            pills = (("kw", ff, fv),) + tuple(pills)
        pills = tuple(sorted(pills,
                             key=lambda s_: s_[0].endswith("_not")))
        pure = not query
        if pure and pills[0][0].endswith("_not"):
            raise ValueError("saved-search filter pills need at least "
                             "one positive filter without a query")
        with ctx_filters(searcher, pills, pure):
            hits = searcher.field_sorted_search(
                sfield, k=k, desc=(str(sdir).lower() != "asc"),
                query=query or "ctxpure", field=text_field)
    else:
        hits = searcher.field_sorted_search(
            sfield, k=k, desc=(str(sdir).lower() != "asc"), query=query,
            field=text_field, filter_field=ff, filter_value=fv)
    if not hits:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    ids = [d for _, d in hits]
    fetched = searcher.fetch_docs(ids)
    have = set(fetched.column_names) if fetched is not None else set()
    cols = [c for c in saved.get("columns") or [] if c in have]
    # reorder fetched rows into result order
    import numpy as np
    fid = fetched.column("doc_id").to_numpy(zero_copy_only=False)
    order = {int(d): i for i, d in enumerate(fid)}
    take = [order[d] for d in ids if d in order]
    fetched = fetched.take(pa.array(take, pa.int64()))
    out = {"doc_id": fetched.column("doc_id"),
           sfield: pa.array([v for v, d in hits if d in order])}
    for c in cols:
        if c not in out:
            out[c] = fetched.column(c)
    return pa.table(out)
