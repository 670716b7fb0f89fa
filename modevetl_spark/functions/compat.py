"""Oracle-parity numeric compat layer (SURVEY.md §7 "hard parts").

Floating-point aggregation is order-dependent: ``sum(double)`` over a
shuffled DataFrame and over DuckDB's sequential scan can differ in the last
bits, which breaks the driver's value-hash comparison. The fix is to make
the aggregation *exact*: cast each operand to a decimal wide enough to hold
it losslessly-after-fixed-rounding, aggregate in decimal (exact, associative),
and cast the final value back to double. Both engines then produce
bit-identical doubles regardless of row order or partial-aggregation
topology — and the decimal cast per row is still whole-stage-codegen'd
JVM-side work, so there is no performance cliff at scale.

Precision choices keep every intermediate within DECIMAL(38,_): operands at
(18,6); a product of two (18,6) is at most (37,12) in Spark's rules, and
DuckDB's (36,12) — both exact.

Reference analog: the reference aggregates in pure Python floats
(``pyLibrary/queries/windows.py`` accumulators) and never needed
cross-engine reproducibility; we do.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, places: int = 2) -> Column:
    """Exact (decimal-accumulated) sum, returned as a rounded double.

    The final ROUND matters: DuckDB's DECIMAL(38,12)->DOUBLE cast is not
    correctly rounded (int128 / 10^scale in float), so the two engines can
    differ by 1 ulp before rounding; after rounding to ``places`` they agree
    (verified empirically over every suppkey group at sf0.01 — 100/100 with
    ROUND, 57/100 with decimal-quantize, because DuckDB's decimal rescale is
    not HALF_UP either).
    """
    return F.round(F.sum(_c(col).cast(DEC)).cast("double"), places)


def davg(col: Column | str, places: int = 6) -> Column:
    """Exact-sum average: decimal sum cast to double, divided by count,
    rounded (same 1-ulp rationale as :func:`dsum`). NULL for an all-NULL
    group — Spark's ANSI mode raises on the 0-count division where
    DuckDB's ``SUM/COUNT`` quietly yields NULL, so the guard must be
    explicit (same lesson as the z-score zero-std case)."""
    c = _c(col)
    return F.when(
        F.count(c) > 0,
        F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), places),
    )


def money(price: Column | str, discount: Column | str) -> Column:
    """The TPC-H revenue term price*(1-discount) in exact decimal."""
    return _c(price).cast(DEC) * (F.lit(1) - _c(discount)).cast(DEC)


# --- hostile-input-tolerant twins (try_cast at the fold seam) ------------
#
# Under ANSI mode a single out-of-DECIMAL(18,6)-range value (1e300, or a
# product that overflows) ABORTS the whole job at the fold cast — at
# 100 TB that is one hostile row killing a 1000-executor stage. The
# try_* twins fold out-of-range operands to NULL instead, which then
# falls out of SUM exactly like a NULL input; verified cross-engine
# (Spark try_cast == DuckDB TRY_CAST on the whole class: 1e300 → NULL
# both, 5e-324 subnormal → 0.000000 both, 1e300 → BIGINT NULL both).
# They are deliberately separate functions rather than a change to
# dsum/money: only the keys that opted into the extreme-numerics
# contract re-pin into the grading window (COVERAGE.md M11).


def tsum(col: Column | str, places: int = 2) -> Column:
    """:func:`dsum` with a try_cast fold — same exact-decimal
    accumulate / cast-double / ROUND discipline, but an out-of-range
    operand becomes NULL instead of aborting the stage."""
    return F.round(F.sum(_c(col).try_cast(DEC)).cast("double"), places)


def tavg(col: Column | str, places: int = 6) -> Column:
    """:func:`davg` with a try_cast fold (re-added in r12 with
    consumers — see :func:`sql_tavg`): the sum NULL-folds out-of-range
    operands while the count keeps every non-NULL raw value, so the
    guard and the denominator agree with the SQL twin exactly."""
    c = _c(col)
    return F.when(
        F.count(c) > 0,
        F.round(F.sum(c.try_cast(DEC)).cast("double") / F.count(c), places),
    )


def tmoney(price: Column | str, discount: Column | str) -> Column:
    """:func:`money` with try_cast operands — either side out of range
    nulls the revenue term for that row. The admitted range is
    DECIMAL(18,6) and the SQL twin :func:`sql_tmoney` TRY_CASTs at the
    SAME (18,6) before widening for DuckDB's non-widening multiply, so
    hostile magnitudes in [1e12, 1e13) fold to NULL on BOTH engines
    (r11 ADVICE: a (19,6)-admitting oracle kept values the engine
    dropped)."""
    return _c(price).try_cast(DEC) * (F.lit(1) - _c(discount)).try_cast(DEC)


def dsum_money(price: Column | str, discount: Column | str, places: int = 2) -> Column:
    return F.round(F.sum(money(price, discount)).cast("double"), places)


def round_sig(col: Column | str, digits: int) -> Column:
    """Round to significant digits — the reference's ``Math.round(value,
    digits=n)`` (``pyLibrary/maths/__init__.py``) rounds to significant
    figures, not decimal places.

    try_divide, not ``/``: for a subnormal input (|x| ~ 5e-324) the
    scale term 10^(floor(log10|x|)-d+1) underflows to 0.0, and Spark's
    division aborts the stage where DuckDB's double x/0.0 quietly
    yields NULL — try_divide matches that NULL convention exactly, so
    one denormal row degrades to a NULL output instead of killing the
    job. In-range values divide identically.
    """
    c = _c(col)
    scale = F.pow(F.lit(10.0), F.floor(F.log10(F.abs(c))) - F.lit(digits - 1))
    return F.when(c == 0, F.lit(0.0)).otherwise(
        F.round(F.try_divide(c, scale), 0) * scale
    )


# --- SQL-side twins (DuckDB dialect, used to build oracle_sql strings) ---


def sql_dsum(expr: str, alias: str, places: int = 2) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE), {places})"
        f" AS {alias}"
    )


def sql_davg(expr: str, alias: str, places: int = 6) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}), {places}) AS {alias}"
    )


def sql_tsum(expr: str, alias: str, places: int = 2) -> str:
    """SQL twin of :func:`tsum` (re-added in r12 WITH consumers this
    time): the round-12 strong-materialization hostile sweep showed the
    raw-cast fold aborting 17 engines — and their oracles' matching raw
    CASTs erroring symmetrically — so both sides move to the try fold:
    an out-of-range operand becomes NULL instead of aborting the job.
    In-range values are bit-identical to :func:`sql_dsum`."""
    return (
        f"ROUND(CAST(SUM(TRY_CAST({expr} AS DECIMAL(18,6))) AS DOUBLE),"
        f" {places}) AS {alias}"
    )


def sql_tavg(expr: str, alias: str, places: int = 6) -> str:
    """SQL twin of the engine's try-fold average (tsum/count shape —
    see :func:`sql_tsum`): NULL-folds out-of-range operands while
    COUNT keeps counting every non-NULL raw value, exactly like the
    engine's F.count(col) over the unfolded column."""
    return (
        f"ROUND(CAST(SUM(TRY_CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}), {places}) AS {alias}"
    )


def sql_tmoney(price: str = "l_extendedprice", discount: str = "l_discount") -> str:
    """SQL twin of :func:`tmoney` — consumed by _ABC_ORACLE (single
    source of truth for the try-fold money shape; the formerly-unused
    tavg/sql_tsum/sql_tavg helpers were dropped, r11 ADVICE).

    Two casts per operand, each load-bearing: the INNER TRY_CAST admits
    exactly Spark's DECIMAL(18,6) range (so hostile magnitudes in
    [1e12, 1e13) fold to NULL on BOTH engines — a (19,6) TRY_CAST here
    kept values the engine dropped), and the OUTER lossless CAST to
    (19,6) widens the operands because DuckDB's decimal multiply does
    not auto-widen: an (18,6)x(18,6) product runs on the int64 path and
    overflows, while (19,6)x(19,6) lands exactly in (38,12) int128.
    Spark's tmoney stays (18,6) (it widens to (37,12) itself) — values
    identical."""
    return (
        f"CAST(TRY_CAST({price} AS DECIMAL(18,6)) AS DECIMAL(19,6))"
        f" * CAST(TRY_CAST(1 - {discount} AS DECIMAL(18,6)) AS DECIMAL(19,6))"
    )


def sql_money(price: str = "l_extendedprice", discount: str = "l_discount") -> str:
    return f"CAST({price} AS DECIMAL(18,6)) * CAST(1 - {discount} AS DECIMAL(18,6))"


def sql_dsum_money(alias: str = "revenue", places: int = 2) -> str:
    return f"ROUND(CAST(SUM({sql_money()}) AS DOUBLE), {places}) AS {alias}"
