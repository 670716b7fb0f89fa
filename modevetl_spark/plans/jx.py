"""Qb / "JSON Query Expressions" front-end.

The reference's public query API (``pyLibrary/queries/__init__.py
Q.run``, ``query.py`` normalization, ``MVEL.py`` expressions): a JSON
dict — ``{"from", "select", "edges", "groupby", "where", "window",
"sort", "limit"}`` — evaluated over document lists. This module
translates that dialect to a Catalyst logical plan: normalization maps to
the analyzer, expression trees to Columns, edges to the densify
composition, windows to pyspark Window specs. No interpreter loop — the
output IS a DataFrame, so Catalyst optimizes jx queries exactly like
hand-written ones (pushdown, pruning, codegen).

Supported surface (documented reference semantics):

- **from**: table name (catalog), DataFrame, or nested query dict.
- **select**: "field" | "*" (all leaf columns, deep paths flattened with
  escaped names) | "." (whole document as a struct) | {"name", "value",
  "aggregate", "default"} | list of same.
  Aggregates: count, sum, min, max, average|mean, median, percentile,
  cardinality, union, geomean, variance, std.
- **edges**: dense-domain group-bys: {"value", "domain": {"type":
  set|time|range|duration|default, ...}} — every partition materializes
  (cube.py semantics); ``allowNulls`` adds the overflow bucket.
- **groupby**: sparse group-by (list of fields / computed values).
- **where**: expression tree — and/or/not, eq/term, ne, gt/gte/lt/lte,
  in/terms, exists, missing, prefix, regex, match_all, between.
- **window**: [{name, value, aggregate, edges, sort, range{min,max}}]
  (windows.py semantics: aggregate over sorted partition + row frame).
- **sort**: field | {"value", "sort": ±1} list — nulls first, like the
  reference's Null-is-least ordering.
- **limit**: int.

Scalar expression ops: literal, add/sub/mult/div (div takes optional
default), abs, floor, round, exp, ln, coalesce, concat, length, lower,
upper, left, right, find (0-based substring index, Null when absent),
between (substring form: {"value", "prefix", "suffix"} dict; the
[field, lo, hi] list stays the boolean range op),
left_pad/right_pad (aka lpad/rpad), not, when/then/else, date/number
casts. ``select`` entries accept a per-column ``default`` applied to
missing values before any aggregation (upstream select.default).
"""

from __future__ import annotations

import contextvars
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, StructType

from modevetl_spark.operators.cube import (
    default_domain,
    densify,
    range_domain,
    set_domain,
    time_domain,
)
from modevetl_spark.sources.catalog import TABLES, load


class JxError(ValueError):
    pass


# ---------------------------------------------------------------- scalars

# Null-safe navigation (``struct.Null``): referencing a field the document
# doesn't have yields Null, never an analysis error. QB.run installs a
# schema-aware resolver for the current 'from'; outside QB, field refs
# resolve strictly via F.col.
_FIELD_RESOLVER: contextvars.ContextVar = contextvars.ContextVar(
    "jx_field_resolver", default=None
)


def _field(name: str) -> Column:
    resolver = _FIELD_RESOLVER.get()
    return resolver(name) if resolver else F.col(name)


def schema_paths(schema: StructType, prefix: str = "") -> set[str]:
    """All addressable dot-paths in a (possibly nested) schema."""
    out: set[str] = set()
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        out.add(path)
        if isinstance(f.dataType, StructType):
            out |= schema_paths(f.dataType, prefix=path + ".")
    return out


def _dtype_at(schema: StructType, path: str) -> DataType:
    """Data type at a dot-path (path must exist — see schema_paths)."""
    dt: DataType = schema
    for seg in path.split("."):
        dt = dt[seg].dataType
    return dt


def _lit(v: Any) -> Column:
    return F.lit(v)


def to_col(e: Any) -> Column:
    """jx expression -> Column."""
    if isinstance(e, Column):
        return e
    if isinstance(e, str):
        return _field(e)
    if isinstance(e, bool) or isinstance(e, (int, float)):
        return F.lit(e)
    if e is None:
        return F.lit(None)
    if not isinstance(e, dict) or len(e) == 0:
        raise JxError(f"cannot translate expression: {e!r}")

    if "when" in e and "then" in e:  # {"when": cond, "then": v, "else": w}
        return F.when(to_boolean(e["when"]), to_col(e["then"])).otherwise(
            to_col(e.get("else"))
        )

    default = e.get("default")
    op, arg = next(iter((k, v) for k, v in e.items() if k != "default"))

    out = _scalar_op(op, arg)
    if default is not None:
        out = F.coalesce(out, _lit(default))
    return out


def _scalar_op(op: str, arg: Any) -> Column:
    if op == "literal":
        return _lit(arg)
    if op in ("add", "sum"):
        cols = [to_col(a) for a in arg]
        out = cols[0]
        for c in cols[1:]:
            out = out + c
        return out
    if op in ("sub", "subtract", "minus"):
        a, b = (to_col(x) for x in arg)
        return a - b
    if op in ("mult", "mul", "multiply"):
        cols = [to_col(a) for a in arg]
        out = cols[0]
        for c in cols[1:]:
            out = out * c
        return out
    if op in ("div", "divide"):
        a, b = (to_col(x) for x in arg)
        # reference div never raises on 0 — yields Null (then `default`)
        return F.when(b != 0, a / b)
    if op == "exp":
        a, b = (to_col(x) for x in arg)
        return F.pow(a, b)
    if op == "abs":
        return F.abs(to_col(arg))
    if op == "floor":
        if isinstance(arg, list):  # floor to multiple: {"floor": [x, m]}
            a, m = (to_col(x) for x in arg)
            return F.floor(a / m) * m
        return F.floor(to_col(arg))
    if op == "round":
        if isinstance(arg, list):
            a, places = to_col(arg[0]), int(arg[1])
            return F.round(a, places)
        return F.round(to_col(arg), 0)
    if op == "ln":
        return F.log(to_col(arg))
    if op == "log":
        return F.log10(to_col(arg))
    if op == "sqrt":
        return F.sqrt(to_col(arg))
    if op == "coalesce":
        return F.coalesce(*[to_col(a) for a in arg])
    if op == "concat":
        sep = ""
        if isinstance(arg, dict):
            sep, arg = arg.get("separator", ""), arg["terms"]
        return F.concat_ws(sep, *[to_col(a) for a in arg])
    if op == "length":
        return F.length(to_col(arg))
    if op == "lower":
        return F.lower(to_col(arg))
    if op == "upper":
        return F.upper(to_col(arg))
    if op == "left":
        a, n = to_col(arg[0]), int(arg[1])
        return F.substring(a, 1, n)
    if op == "right":
        a, n = to_col(arg[0]), int(arg[1])
        return a.substr(F.greatest(F.length(a) - n + 1, F.lit(1)), F.lit(n))
    if op == "find":
        # {"find": [str, substr]} or [str, substr, start0] -> 0-based index
        # of the first occurrence at/after start0; missing -> Null (the
        # 2-valued missing, so a where like {"gte": {...}} is just false).
        s = to_col(arg[0])
        sub = to_col(arg[1])
        start0 = to_col(arg[2]) if len(arg) > 2 else F.lit(0)
        pos = F.call_function("locate", sub, s, (start0 + 1).cast("int"))
        # Empty substring follows the reference's (Python str.find) rule —
        # found at the start offset while it is within the string — because
        # SQL locate('') ignores the start position entirely.
        return F.when(
            F.length(sub) == 0, F.when(start0 <= F.length(s), start0)
        ).otherwise(F.when(pos > 0, pos - 1))
    if op == "between" and isinstance(arg, dict) and (
        "prefix" in arg or "suffix" in arg
    ):
        # String between: {"between": {"value": v, "prefix": p, "suffix": s}}
        # -> substring strictly between the first occurrence of prefix and
        # the next occurrence of suffix. A None prefix anchors at the
        # start, a None suffix runs to the end; an absent prefix/suffix
        # yields Null (missing), like the reference's strings.between.
        # ONLY the prefix/suffix dict form is claimed here — the 3-list
        # form {"between": [field, lo, hi]} stays the boolean range op.
        v, p, sfx = arg.get("value"), arg.get("prefix"), arg.get("suffix")
        s = to_col(v)
        if p is None:
            content_start = F.lit(1)
        else:
            pc = to_col(p)
            ppos = F.call_function("locate", pc, s)
            content_start = F.when(ppos > 0, ppos + F.length(pc))
        if sfx is None:
            content_end = F.length(s) + 1
        else:
            sc = to_col(sfx)
            spos = F.call_function("locate", sc, s, content_start.cast("int"))
            content_end = F.when(spos > 0, spos)
        return s.substr(content_start, content_end - content_start)
    if op in ("left_pad", "lpad"):
        a, n = to_col(arg[0]), int(arg[1])
        fill = str(arg[2]) if len(arg) > 2 else " "
        return F.lpad(a, n, fill)
    if op in ("right_pad", "rpad"):
        a, n = to_col(arg[0]), int(arg[1])
        fill = str(arg[2]) if len(arg) > 2 else " "
        return F.rpad(a, n, fill)
    if op == "string":
        return to_col(arg).cast("string")
    if op == "number":
        return to_col(arg).cast("double")
    if op == "case":
        # [{"when": cond, "then": v}, ..., else_v]
        *whens, els = arg
        out = None
        for w in whens:
            c = F.when(to_boolean(w["when"]), to_col(w["then"]))
            out = c if out is None else out.when(
                to_boolean(w["when"]), to_col(w["then"])
            )
        return out.otherwise(to_col(els))
    if op == "not":
        return ~to_boolean(arg)
    # boolean ops used in scalar position
    return to_boolean({op: arg})


# ---------------------------------------------------------------- booleans


def to_boolean(e: Any) -> Column:
    """jx filter expression tree -> boolean Column
    (``pyLibrary/queries/filters.py`` semantics)."""
    if isinstance(e, Column):
        return e
    if e is True or e is None:
        return F.lit(True)
    if e is False:
        return F.lit(False)
    if isinstance(e, str):
        return _field(e).cast("boolean")
    if not isinstance(e, dict):
        raise JxError(f"cannot translate filter: {e!r}")
    if len(e) == 0 or "match_all" in e:
        return F.lit(True)

    op, arg = next(iter(e.items()))

    # Reference semantics are TWO-valued (``struct.Null``: a comparison
    # against a missing value is plain False, never Unknown — so
    # not(eq(missing, x)) MATCHES). Each comparison leaf is coalesced to
    # false, making and/or/not ordinary boolean algebra. (Found by the
    # hypothesis differential test vs the naive Python evaluator.)
    def _2v(c: Column) -> Column:
        return F.coalesce(c, F.lit(False))

    if op == "and":
        out = F.lit(True)
        for a in arg:
            out = out & to_boolean(a)
        return out
    if op == "or":
        out = F.lit(False)
        for a in arg:
            out = out | to_boolean(a)
        return out
    if op == "not":
        return ~to_boolean(arg)
    if op in ("eq", "term"):
        return _2v(_pairwise(arg, lambda a, b: a == b))
    if op in ("ne", "neq"):
        # Null != x is True in the reference (Null equals nothing)
        return ~_2v(_pairwise(arg, lambda a, b: a == b))
    if op == "gt":
        return _2v(_pairwise(arg, lambda a, b: a > b))
    if op == "gte":
        return _2v(_pairwise(arg, lambda a, b: a >= b))
    if op == "lt":
        return _2v(_pairwise(arg, lambda a, b: a < b))
    if op == "lte":
        return _2v(_pairwise(arg, lambda a, b: a <= b))
    if op in ("in", "terms"):
        (field, values), = arg.items()
        return _2v(to_col(field).isin(*values))
    if op == "between":
        (field, bounds), = arg.items() if isinstance(arg, dict) else ((arg[0], arg[1:]),)
        return _2v(to_col(field).between(_lit(bounds[0]), _lit(bounds[1])))
    if op == "exists":
        field = arg if isinstance(arg, str) else arg.get("field", arg)
        return to_col(field).isNotNull()
    if op == "missing":
        field = arg if isinstance(arg, str) else arg.get("field", arg)
        return to_col(field).isNull()
    if op == "prefix":
        (field, pre), = arg.items()
        return _2v(to_col(field).startswith(pre))
    if op == "regex":
        (field, pattern), = arg.items()
        return _2v(to_col(field).rlike(pattern))
    raise JxError(f"unknown filter op: {op!r}")


def _pairwise(arg: Any, cmp) -> Column:
    """Accept both {"field": literal} and [expr, expr] comparison forms."""
    if isinstance(arg, dict):
        out = F.lit(True)
        for field, value in arg.items():
            out = out & cmp(to_col(field), _lit(value))
        return out
    a, b = (to_col(x) for x in arg)
    return cmp(a, b)


# ---------------------------------------------------------------- aggregates


def _time_aligned(min_str: str, unit: str) -> bool:
    """True when ``min_str`` sits exactly on a ``unit`` boundary, so
    ``date_trunc(unit, v)`` lands on the same points as the generated grid."""
    from datetime import datetime

    try:
        t = datetime.fromisoformat(str(min_str))
    except ValueError:
        return False
    midnight = (t.hour, t.minute, t.second, t.microsecond) == (0, 0, 0, 0)
    if unit == "year":
        return midnight and t.month == 1 and t.day == 1
    if unit == "quarter":
        return midnight and t.month in (1, 4, 7, 10) and t.day == 1
    if unit == "month":
        return midnight and t.day == 1
    if unit == "week":
        return midnight and t.weekday() == 0  # Spark's week starts Monday
    if unit == "day":
        return midnight
    if unit == "hour":
        return (t.minute, t.second, t.microsecond) == (0, 0, 0)
    if unit == "minute":
        return (t.second, t.microsecond) == (0, 0)
    if unit == "second":
        return t.microsecond == 0
    return False


def _time_bucket_key(val: Column, dom_min: str, dom_max: str, interval: str) -> Column:
    """Group key for a time-domain edge.

    Fast path: a single-unit interval ('1 MONTH') whose domain min is
    aligned to that unit — ``date_trunc`` lands exactly on the generated
    grid. Everything else ('2 MONTH', '7 DAY', a week min that isn't a
    Monday) must bucket relative to the domain min or the keys never match
    the grid and rows silently vanish into dropped cells. The general path
    picks the largest boundary <= val from the SAME ``sequence`` expression
    that generates the grid, so key and grid are equal by construction.
    O(|grid|) comparisons per row, array codegen'd — fine for the <=1000
    cells a dense cube can render anyway.

    The key is clamped to the right-open domain [min, max): rows outside it
    get a NULL key, so they either fall out of the densify join or — when
    ``allowNulls`` coalesces afterwards — land in the overflow bucket, the
    same treatment out-of-domain values get in a set domain. Without the
    clamp a val >= max whose floor is the partial final bucket's start (a
    real grid member when max is not interval-aligned) was silently counted
    into that bucket; date_trunc on the fast path leaked identically.
    """
    parts = interval.split()
    unit = parts[-1].lower().rstrip("s")
    single = len(parts) == 2 and parts[0] in ("1", "+1")
    if single and _time_aligned(dom_min, unit):
        key = F.date_trunc(unit, val)
    else:
        seq = F.sequence(
            F.to_timestamp(F.lit(dom_min)),
            F.to_timestamp(F.lit(dom_max)),
            F.expr(f"INTERVAL {interval}"),
        )
        below = F.filter(seq, lambda b: b <= val)
        key = F.when(F.size(below) > 0, F.element_at(below, F.size(below)))
    lo = F.to_timestamp(F.lit(dom_min))
    hi = F.to_timestamp(F.lit(dom_max))
    return F.when((val >= lo) & (val < hi), key)


def _aggregate(agg: str, value: Column, percentile: float | None = None) -> Column:
    if agg == "count":
        return F.count(value)
    if agg == "sum":
        return F.sum(value)
    if agg in ("minimum", "min"):
        return F.min(value)
    if agg in ("maximum", "max"):
        return F.max(value)
    if agg in ("average", "mean", "avg"):
        return F.avg(value)
    if agg == "median":
        return F.percentile(value, F.lit(0.5))
    if agg == "percentile":
        return F.percentile(value, F.lit(percentile if percentile is not None else 0.5))
    if agg == "cardinality":
        return F.countDistinct(value)
    if agg == "union":
        return F.array_sort(F.collect_set(value))
    if agg == "geomean":
        return F.exp(F.avg(F.log(value)))
    if agg in ("variance", "var"):
        return F.var_samp(value)
    if agg in ("std", "stddev"):
        return F.stddev(value)
    if agg == "first":
        return F.first(value)
    if agg == "last":
        return F.last(value)
    raise JxError(f"unknown aggregate: {agg!r}")


# ---------------------------------------------------------------- QB engine


class QB:
    """``Q.run`` equivalent: evaluate jx JSON queries as DataFrame plans.

    tables: name -> DataFrame mapping, or pass ``sf_dir`` to lazily load
    the driver catalog tables.
    """

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame] | None = None,
        sf_dir: str | None = None,
        dimensions=None,
    ):
        self.spark = spark
        self._tables = dict(tables or {})
        self._sf_dir = sf_dir
        self.dimensions = dimensions  # DimensionCatalog | None

    def _resolve_dimensions(self, raw) -> list:
        """Expand named-dimension references in a raw edges/groupby list
        (``plans.dimensions``): bare strings and string values that match a
        registered dimension inherit its value + domain; explicit
        ``{"dimension": name}`` requires registration."""
        out = []
        for e in _listify(raw):
            if isinstance(e, dict) and "dimension" in e:
                if self.dimensions is None or e["dimension"] not in self.dimensions:
                    raise JxError(f"unknown dimension {e.get('dimension')!r}")
                out.append(self.dimensions.edge(e["dimension"], e))
            elif (
                isinstance(e, str) and self.dimensions is not None and e in self.dimensions
            ):
                out.append(self.dimensions.edge(e))
            elif (
                isinstance(e, dict)
                and "domain" not in e
                and isinstance(e.get("value"), str)
                and self.dimensions is not None
                and e["value"] in self.dimensions
            ):
                # the edge's "value" IS the dimension reference — it must
                # not survive into the overrides or it would clobber the
                # catalog's real value expression with the dimension name
                out.append(
                    self.dimensions.edge(
                        e["value"], {k: v for k, v in e.items() if k != "value"}
                    )
                )
            else:
                out.append(e)
        return out

    def table(self, name: str) -> DataFrame:
        if name in self._tables:
            return self._tables[name]
        if self._sf_dir and name in TABLES:
            df = load(self.spark, self._sf_dir, name)
            self._tables[name] = df
            return df
        raise JxError(f"unknown table {name!r}")

    def _from_path(self, frm: str) -> DataFrame:
        """Resolve a ``from`` string: a table name, or a dot-path into a
        nested array column (``"orders.items"``) — the reference's
        ES nested-document query shape (es_query.py dispatches on the
        nested path; query.py normalizes ``from`` clauses with dots).

        Dotting into an array-of-structs explodes it: one output row per
        inner document with the parent row's fields repeated, and the
        inner document addressable by its path (``items.qty``). An
        explode is a narrow transformation — no shuffle; Catalyst prunes
        unreferenced parent columns out of the scan as usual.
        """
        try:
            return self.table(frm)
        except JxError:
            pass
        parts = frm.split(".")
        for i in range(len(parts) - 1, 0, -1):
            try:
                df = self.table(".".join(parts[:i]))
                break
            except JxError:
                continue
        else:
            raise JxError(f"unknown table {frm!r}")

        base = None  # addressable prefix of the current navigation point
        for seg in parts[i:]:
            ref = f"{base}.{seg}" if base else seg
            if ref not in schema_paths(df.schema):
                raise JxError(f"no nested path {ref!r} in {frm!r}")
            if isinstance(_dtype_at(df.schema, ref), ArrayType):
                # explode into a top-level column named after the segment
                df = df.withColumn(seg, F.explode_outer(F.col(ref)))
                base = seg
            else:
                base = ref
        return df

    # -- main entry point ---------------------------------------------

    def run(self, query: dict) -> DataFrame:
        frm = query.get("from")
        if isinstance(frm, DataFrame):
            df = frm
        elif isinstance(frm, dict):
            df = self.run(frm)
        elif isinstance(frm, str):
            df = self._from_path(frm)
        else:
            raise JxError("query needs a 'from'")

        # schemaless documents: unknown field paths resolve to Null
        available = schema_paths(df.schema)

        def resolver(name: str) -> Column:
            return F.col(name) if name in available else F.lit(None)

        token = _FIELD_RESOLVER.set(resolver)
        try:
            return self._run_body(df, query)
        finally:
            _FIELD_RESOLVER.reset(token)

    def _run_body(self, df: DataFrame, query: dict) -> DataFrame:
        if query.get("where") is not None:
            df = df.where(to_boolean(query["where"]))

        selects = _normalize_selects(_expand_star(df, query.get("select")))
        edges = _normalize_edges(self._resolve_dimensions(query.get("edges")))
        groupby = _normalize_edges(self._resolve_dimensions(query.get("groupby")))
        has_agg = any(s.get("aggregate") for s in selects)

        windows = _listify(query.get("window"))

        if edges:
            df = self._run_edges(df, selects, edges)
            for w in windows:
                df = self._add_window(df, w)
        elif groupby:
            df = self._run_groupby(df, selects, groupby, densify_grid=False)
            for w in windows:
                df = self._add_window(df, w)
        elif has_agg:
            df = df.agg(*[self._agg_col(s) for s in selects])
        else:
            # windows compute over source rows, then the projection keeps
            # selected + window columns (Q.window appends derived columns)
            for w in windows:
                df = self._add_window(df, w)
            if selects:
                df = df.select(
                    *[_select_value(s).alias(s["name"]) for s in selects],
                    *[w["name"] for w in windows],
                )

        sort = query.get("sort")
        if sort is not None:
            # sort runs on the PROJECTED output, so field names resolve
            # against the current schema (select aliases included), not the
            # source document schema the outer resolver holds
            out_avail = schema_paths(df.schema)
            tok = _FIELD_RESOLVER.set(
                lambda n: F.col(n) if n in out_avail else F.lit(None)
            )
            try:
                df = df.orderBy(*_sort_cols(sort))
            finally:
                _FIELD_RESOLVER.reset(tok)
        if query.get("limit") is not None:
            df = df.limit(int(query["limit"]))
        return df

    # -- helpers --------------------------------------------------------

    def _agg_col(self, s: dict) -> Column:
        value = _select_value(s)
        return _aggregate(s["aggregate"], value, s.get("percentile")).alias(s["name"])

    def _run_groupby(self, df, selects, keys, densify_grid):
        key_cols = [to_col(k["value"]).alias(k["name"]) for k in keys]
        aggs = [self._agg_col(s) for s in selects if s.get("aggregate")] or [
            F.count(F.lit(1)).alias("count")
        ]
        return df.groupBy(*key_cols).agg(*aggs)

    def _run_edges(self, df, selects, edges):
        """Dense cube: sparse aggregate + domain-grid densify (cube.py)."""
        key_cols, domains = [], []
        pre = df
        for e in edges:
            name = e["name"]
            dom = e.get("domain", {"type": "default"})
            dtype = dom.get("type", "default")
            val = to_col(e["value"])
            if dtype == "set":
                domains.append(
                    set_domain(self.spark, name, list(dom["partitions"]))
                )
                key = val
            elif dtype == "time":
                interval = dom.get("interval", "1 MONTH")
                domains.append(
                    time_domain(self.spark, name, dom["min"], dom["max"], interval)
                )
                key = _time_bucket_key(val, dom["min"], dom["max"], interval)
            elif dtype in ("range", "duration"):
                width = float(dom["interval"])
                start = float(dom["min"])
                domains.append(
                    range_domain(
                        self.spark, name, start, float(dom["max"]), width
                    )
                )
                # Same arithmetic shape as range_domain's grid
                # (lit(start) + <long> * lit(width)) so the double bucket
                # values are bit-identical to the generated grid — a
                # floor(val/width)*width key anchored at 0 misses every grid
                # point when start is not a multiple of width, and can miss
                # by 1 ulp even when aligned (different op order). Clamped to
                # the right-open [start, max): a val >= max keys to NULL
                # instead of the partial final bucket's start (which IS a
                # grid member when max isn't width-aligned), and a val <
                # start keys to NULL instead of a below-grid value, so both
                # sides behave like a set domain's out-of-domain values —
                # dropped, or swept into the allowNulls overflow bucket.
                stop = float(dom["max"])
                k = F.floor((val - F.lit(start)) / F.lit(width))
                key = F.when(
                    (val >= F.lit(start)) & (val < F.lit(stop)),
                    (F.lit(start) + k * F.lit(width)).cast("double"),
                )
            elif dtype == "default":
                pre_named = pre.withColumn(name, val)
                domains.append(default_domain(pre_named, name, dom.get("limit", 1000)))
                key = val
            else:
                raise JxError(f"unknown domain type {dtype!r}")
            if dom.get("allowNulls"):
                sentinel = dom.get("nullValue", "<null>")
                key = F.coalesce(key.cast("string"), F.lit(sentinel))
                domains[-1] = domains[-1].select(
                    F.col(name).cast("string").alias(name)
                ).union(self.spark.range(1).select(F.lit(sentinel).alias(name)))
            key_cols.append(key.alias(name))

        agg_selects = [s for s in selects if s.get("aggregate")]
        sparse = df.groupBy(*key_cols).agg(*[self._agg_col(s) for s in agg_selects])
        fill = {
            s["name"]: F.lit(0).cast("long")
            for s in agg_selects
            if s["aggregate"] == "count"
        }
        return densify(domains, sparse, [e["name"] for e in edges], fill)

    def _add_window(self, df: DataFrame, w: dict) -> DataFrame:
        """Q.window: aggregate over sorted partition with row frame
        (``windows.py`` range {min, max} relative to current row)."""
        parts = [to_col(p["value"]) for p in _normalize_edges(w.get("edges"))]
        spec = Window.partitionBy(*parts) if parts else Window.partitionBy(F.lit(1))
        sort = w.get("sort")
        if sort is not None:
            spec = spec.orderBy(*_sort_cols(sort))
            rng = w.get("range")
            if rng is not None:
                lo = rng.get("min")
                hi = rng.get("max", 0)
                spec = spec.rowsBetween(
                    Window.unboundedPreceding if lo is None else int(lo),
                    Window.unboundedFollowing if hi is None else int(hi),
                )
            else:
                spec = spec.rowsBetween(Window.unboundedPreceding, 0)
        agg = w.get("aggregate")
        if agg == "rownum":
            col = F.row_number().over(spec)
        elif agg == "rank":
            col = F.rank().over(spec)
        else:
            col = _aggregate(agg, to_col(w["value"]), w.get("percentile")).over(spec)
        return df.withColumn(w["name"], col)


# ---------------------------------------------------------------- normalize


def _leaf_paths(schema: StructType, prefix: str = "") -> list[str]:
    """Dot-paths of all LEAF columns (structs recursed, arrays/scalars are
    leaves) in schema order — the upstream ``select: "*"`` expansion set."""
    out: list[str] = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, StructType):
            out.extend(_leaf_paths(f.dataType, prefix=path + "."))
        else:
            out.append(path)
    return out


def _expand_star(df: DataFrame, select) -> list | None:
    """Expand the upstream wildcard selects against the current schema:
    ``"*"`` -> every leaf column (deep paths escaped in the output name,
    mirroring upstream's ``a\\.b`` flattened-leaf naming); ``"."`` -> the
    whole document as one struct column named ``record``."""
    if select is None:
        return None
    out = []
    for s in _listify(select):
        if isinstance(s, dict) and s.get("value") in ("*", ".") and s.get("aggregate"):
            # silently expanding would drop the aggregate (count(*) shape);
            # upstream expresses count-star as {"aggregate": "count"} with
            # no value at all
            raise JxError(
                "aggregate over '*'/'.' is not supported: use "
                '{"aggregate": "count"} without a value for count(*)'
            )
        if s == "*" or (isinstance(s, dict) and s.get("value") == "*"):
            out.extend(
                {"name": p.replace(".", "\\."), "value": p}
                for p in _leaf_paths(df.schema)
            )
        elif s == "." or (isinstance(s, dict) and s.get("value") == "."):
            name = s.get("name", "record") if isinstance(s, dict) else "record"
            out.append(
                {"name": name, "value": F.struct(*[F.col(c) for c in df.columns])}
            )
        else:
            out.append(s)
    return out


def _select_value(s: dict) -> Column:
    """Value expression of a select entry, honoring the per-column
    ``default`` (upstream select.default: a missing value reads as the
    default — before aggregation, so e.g. a sum treats absent as 0)."""
    c = to_col(s.get("value", F.lit(1)))
    if s.get("default") is not None:
        c = F.coalesce(c, F.lit(s["default"]))
    return c


def _listify(x) -> list:
    if x is None:
        return []
    return x if isinstance(x, list) else [x]


def _normalize_selects(select) -> list[dict]:
    """Query.__init__ canonicalization: wrap scalars, default names."""
    out = []
    for s in _listify(select):
        if isinstance(s, str):
            out.append({"name": s.replace(".", "\\."), "value": s})
        else:
            s = dict(s)
            s.setdefault(
                "name",
                s["value"] if isinstance(s.get("value"), str) else s.get("aggregate"),
            )
            out.append(s)
    return out


def _normalize_edges(edges) -> list[dict]:
    out = []
    for e in _listify(edges):
        if isinstance(e, str):
            out.append({"name": e, "value": e})
        else:
            e = dict(e)
            e.setdefault("name", e["value"] if isinstance(e["value"], str) else "edge")
            out.append(e)
    return out


def _sort_cols(sort) -> list[Column]:
    cols = []
    for s in _listify(sort):
        if isinstance(s, str):
            cols.append(to_col(s).asc_nulls_first())
        else:
            c = to_col(s["value"])
            cols.append(
                c.desc_nulls_last() if s.get("sort", 1) < 0 else c.asc_nulls_first()
            )
    return cols
