"""Metadata-only aggregate pushdown: answer COUNT/MIN/MAX from manifest
stats without reading any data file.

Mirrors the reference's SparkScanBuilder.pushAggregation
(spark/.../SparkScanBuilder.java:207) + AggregateEvaluator
(api/.../expressions/AggregateEvaluator.java:35): the pushdown applies
only when

* the scan has no delete files attached (MoR rows would falsify sums —
  same refusal as SparkScanBuilder.java:243-249), and
* every planned file matches the filter *strictly* (partition-strict
  through transform projection, or strict metrics), so per-file
  record_count / bounds are exact for the filtered set, and
* the needed stats (value/null counts, lower/upper bounds) are present
  in every file, with no NaN counts on float columns (NaNs are excluded
  from bounds per format/spec.md:653).

Returns None when it must bail — callers fall back to the full scan.
"""

from __future__ import annotations

from typing import Optional

from . import expressions as E

_FLOAT_TYPES = {"float", "double"}


class Unpushable(Exception):
    pass


def _strict_entries(table, expr: E.Expr, plan) -> list:
    """All planned entries iff each strictly matches expr, else raise."""
    schema = table.schema
    bound = E.bind(E.rewrite_not(expr), schema)
    strict_by_spec = {}
    for e in plan.files:
        spec = table.metadata.spec_by_id(e.file.spec_id)
        if e.file.spec_id not in strict_by_spec:
            strict_by_spec[e.file.spec_id] = E.project(bound, spec, inclusive=False)
        sproj = strict_by_spec[e.file.spec_id]
        part_strict = (not isinstance(sproj, E.AlwaysFalse)
                       and E.evaluate(sproj, e.file.partition))
        fs = E.FileStats(e.file.record_count, e.file.stats)
        if not (part_strict or E.strict_metrics_eval(bound, fs)):
            raise Unpushable(f"file {e.file.file_path} matches only partially")
    return plan.files


def aggregate_pushdown(table, aggs: list, filter=None,
                       snapshot_id: Optional[int] = None) -> Optional[dict]:
    """Evaluate aggregates from metadata only.

    aggs: list of (op, column) with op in {count_star, count, min, max};
    column is None for count_star. Returns {(op, col): value} or None if
    the query cannot be answered exactly from metadata.
    """
    scan = table.scan(filter=filter) if filter is not None else table.scan()
    if snapshot_id is not None:
        scan = scan.use_snapshot(snapshot_id)
    plan = scan.plan_files()
    if plan.pos_deletes or plan.eq_deletes:
        return None  # deletes present -> sums would overcount
    try:
        entries = _strict_entries(table, scan.row_filter, plan)
    except Unpushable:
        return None

    types = {f.name: f.type for f in table.schema.fields}
    out = {}
    for op, col in aggs:
        if op == "count_star":
            out[(op, None)] = sum(e.file.record_count for e in entries)
            continue
        # shredded-variant aggregate: (op, E.extract(col, path, type))
        # answers from the companion's manifest bounds when the path is
        # DECLARED (bind resolves it); undeclared extracts bail to the
        # engine plan like any other unpushable aggregate
        key = col
        stats_key = col
        if isinstance(col, E.ColumnRef):
            bound = E.bind(E.Predicate(E.NOT_NULL, col._term),
                           table.schema)
            sn = getattr(bound.term, "stats_name", None)
            if sn is None:
                return None
            stats_key = sn
            key = repr(col._term)
            types[sn] = bound.term.stats_type
            col = sn
        if col not in types:
            raise KeyError(f"unknown column {col!r}")
        vals = []
        for e in entries:
            s = e.file.stats.get(stats_key)
            if s is None:
                return None  # stats missing for this column
            mn, mx, nulls, nans, vc = s
            if op == "count":
                if vc is None or nulls is None:
                    return None
                vals.append(vc - nulls)
            else:
                if types[col] in _FLOAT_TYPES and (nans is None or nans > 0):
                    return None  # NaN-excluded bounds can't answer min/max
                if types[col] in ("string", "binary"):
                    # variable-length bounds may be TRUNCATED under the
                    # table's metrics config (write.metadata.metrics.*,
                    # default truncate(16)) — only `full` guarantees
                    # exact min/max (reference Min/MaxAggregate check
                    # the same mode)
                    from .manifests import metrics_config

                    mode, _n = metrics_config(
                        table.metadata.properties, table.schema).get(
                            col, ("full", 0))
                    if mode != "full":
                        return None
                bound = mn if op == "min" else mx
                if bound is None:
                    if vc is not None and nulls == vc:
                        continue  # all-null file contributes nothing
                    return None
                vals.append(bound)
        if op == "count":
            out[(op, key)] = sum(vals)
        elif not vals:
            out[(op, key)] = None
        else:
            out[(op, key)] = min(vals) if op == "min" else max(vals)
    return out
