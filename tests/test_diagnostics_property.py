"""Property-based gates for the diagnostics-wave operators: each Spark
operator is replayed against a naive pure-Python evaluator over
hypothesis-generated inputs (the SURVEY §5.3 differential pattern).
Spark round-trips are expensive, so example counts stay small and the
python oracle does the heavy sweeping."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# --- largest-remainder apportionment ------------------------------------


def _apportion_python(counts: dict[str, int], budget: int) -> dict[str, int]:
    n = sum(counts.values())
    base = {g: budget * c // n for g, c in counts.items()}
    rem = {g: budget * c % n for g, c in counts.items()}
    leftover = budget - sum(base.values())
    order = sorted(counts, key=lambda g: (-rem[g], g))
    return {
        g: base[g] + (1 if i < leftover else 0) for i, g in enumerate(order)
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=3),
        st.integers(1, 5000),
        min_size=1,
        max_size=8,
    )
)
def test_apportionment_matches_python(spark, counts):
    """The window-based largest-remainder assignment equals the direct
    python computation for arbitrary group-count vectors — Σ = budget
    exactly, every group within 1 of its unrounded share."""
    from pyspark.sql import Window

    budget = 1000
    groups = spark.createDataFrame(
        list(counts.items()), "source string, c long"
    )
    shares = groups.select(
        "source",
        "c",
        F.expr(f"({budget} * c) div sum(c) over ()").cast("long").alias("base"),
        F.expr(f"({budget} * c) % sum(c) over ()").cast("long").alias("rem"),
    )
    w_all = Window.partitionBy()
    ranked = shares.select(
        "source",
        "base",
        (budget - F.sum("base").over(w_all)).cast("long").alias("leftover"),
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), "source"))
        .alias("rk"),
    )
    got = {
        r.source: r.base + (1 if r.rk <= r.leftover else 0)
        for r in ranked.collect()
    }
    assert got == _apportion_python(counts, budget)
    assert sum(got.values()) == budget


# --- Misra–Gries heavy hitters ------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    freqs=st.dictionaries(
        st.text(alphabet="xyzw", min_size=1, max_size=2),
        st.integers(1, 60),
        min_size=1,
        max_size=12,
    ),
    parts=st.sampled_from([1, 3, 8]),
)
def test_heavy_hitters_exact_matches_python(spark, freqs, parts):
    """heavy_hitters_exact returns exactly {item: freq > n/denom} for
    arbitrary multisets under arbitrary partition counts."""
    from modevetl_spark.operators.sketches import heavy_hitters_exact

    denom = 5
    rows = [(t,) for t, c in freqs.items() for _ in range(c)]
    n = len(rows)
    want = {(t, c) for t, c in freqs.items() if c * denom > n}
    df = spark.createDataFrame(rows, "tok string").repartition(parts)
    got = {
        (r.tok, r.cnt)
        for r in heavy_hitters_exact(df, "tok", k=denom, denom=denom).collect()
    }
    assert got == want


# --- 2-D skyline sweep --------------------------------------------------


def _skyline_python(pts: set[tuple[int, int]]) -> set[tuple[int, int]]:
    return {
        p
        for p in pts
        if not any(
            q[0] <= p[0] and q[1] >= p[1] and q != p for q in pts
        )
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.sets(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=30,
    )
)
def test_skyline_sweep_matches_brute_force(spark, pts):
    """The sort + preceding-max sweep equals the quadratic dominance
    definition on arbitrary point sets (price ↓ better, size ↑
    better)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(list(pts), "price long, size long")
    w = Window.orderBy(F.col("price").asc(), F.col("size").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    got = {
        (r.price, r.size)
        for r in df.withColumn("pm", F.max("size").over(w))
        .where(F.col("pm").isNull() | (F.col("size") > F.col("pm")))
        .select("price", "size")
        .collect()
    }
    assert got == _skyline_python(pts)


# --- gaps-and-islands streaks -------------------------------------------


def _longest_streak_python(days: set[datetime.date]) -> tuple[int, datetime.date]:
    best_len, best_start = 0, None
    for d in sorted(days):
        if d - datetime.timedelta(days=1) in days:
            continue
        length = 1
        while d + datetime.timedelta(days=length) in days:
            length += 1
        if length > best_len:
            best_len, best_start = length, d
    return best_len, best_start


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    offsets=st.sets(st.integers(0, 40), min_size=1, max_size=25)
)
def test_streak_islands_match_python(spark, offsets):
    """The day − row_number anchor grouping finds the same longest
    streak (length and earliest start) as a direct python scan over
    arbitrary day sets."""
    from pyspark.sql import Window

    base = datetime.date(2024, 1, 1)
    days = {base + datetime.timedelta(days=o) for o in offsets}
    ev = spark.createDataFrame([(1, d) for d in days], "user_id long, day date")
    w_rn = Window.partitionBy("user_id").orderBy("day")
    islands = (
        ev.select("user_id", "day", F.row_number().over(w_rn).alias("rn"))
        .groupBy(
            "user_id", F.date_sub("day", F.col("rn").cast("int")).alias("anchor")
        )
        .agg(
            F.count(F.lit(1)).alias("len"),
            F.min("day").alias("start"),
        )
    )
    w_pick = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("start")
    )
    top = (
        islands.withColumn("pick", F.row_number().over(w_pick))
        .where(F.col("pick") == 1)
        .collect()[0]
    )
    want_len, want_start = _longest_streak_python(days)
    assert (top.len, top.start) == (want_len, want_start)


# --- weighted median ----------------------------------------------------


def _wmedian_python(pairs: list[tuple[int, int]]) -> int:
    total = sum(w for _, w in pairs)
    acc = 0
    for v, w in sorted(pairs):
        acc += w
        if 2 * acc >= total:
            return v
    raise AssertionError("unreachable")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 20)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
def test_weighted_median_matches_python(spark, pairs):
    """The window formulation of the lower weighted median equals the
    direct accumulate-and-cross scan for arbitrary (value, weight)
    tables."""
    from pyspark.sql import Window

    pv = spark.createDataFrame(pairs, "v long, wsum long")
    w_cum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = pv.select(
        "v",
        F.sum("wsum").over(w_cum).alias("cum_w"),
        F.sum("wsum").over(w_all).alias("total_w"),
    )
    got = (
        cum.where(2 * F.col("cum_w") >= F.col("total_w"))
        .agg(F.min("v"))
        .collect()[0][0]
    )
    assert got == _wmedian_python(pairs)


# --- KS statistic -------------------------------------------------------


def _ks_python(a: list[int], b: list[int]) -> float:
    support = sorted(set(a) | set(b))
    best = 0.0
    for v in support:
        fa = sum(1 for x in a if x <= v) / len(a)
        fb = sum(1 for x in b if x <= v) / len(b)
        best = max(best, abs(fa - fb))
    return best


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.lists(st.integers(0, 15), min_size=1, max_size=25),
    b=st.lists(st.integers(0, 15), min_size=1, max_size=25),
)
def test_ks_window_fold_matches_python(spark, a, b):
    """The per-value window formulation of the two-sample KS D equals
    the direct ECDF sweep for arbitrary integer samples."""
    from pyspark.sql import Window

    rows = [(v, 1) for v in a] + [(v, 0) for v in b]
    df = spark.createDataFrame(rows, "v long, is_a int")
    per_value = df.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("a_cnt"),
        F.sum(1 - F.col("is_a")).cast("long").alias("b_cnt"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    cum = per_value.select(
        F.sum("a_cnt").over(w_cum).alias("ca"),
        F.sum("b_cnt").over(w_cum).alias("cb"),
        F.sum("a_cnt").over(w_all).alias("na"),
        F.sum("b_cnt").over(w_all).alias("nb"),
    )
    d = cum.agg(
        F.max(
            F.abs(
                F.col("ca").cast("double") / F.col("na")
                - F.col("cb").cast("double") / F.col("nb")
            )
        )
    ).collect()[0][0]
    assert abs(d - _ks_python(a, b)) < 1e-12


# --- tied-rank fold (MWU / AUC) -----------------------------------------


def _rank_sum_python(a: list[int], b: list[int]) -> float:
    pooled = sorted(a + b)
    # average rank per value
    ranks: dict[int, float] = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        ranks[pooled[i]] = (i + 1 + j) / 2  # mean of ranks i+1..j
        i = j
    return sum(ranks[v] for v in a)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=st.lists(st.integers(0, 10), min_size=1, max_size=20),
    b=st.lists(st.integers(0, 10), min_size=1, max_size=20),
)
def test_doubled_integer_rank_fold_matches_python(spark, a, b):
    """The Σ a_cnt·(2·cum_before + t + 1) doubled-integer fold equals
    2× the classic tied-rank sum of group A — the identity both
    q_stats_mannwhitney and q_roc_auc stand on."""
    from pyspark.sql import Window

    rows = [(v, 1) for v in a] + [(v, 0) for v in b]
    df = spark.createDataFrame(rows, "v long, is_a int")
    per_value = df.groupBy("v").agg(
        F.sum("is_a").cast("long").alias("a_cnt"),
        F.sum(1 - F.col("is_a")).cast("long").alias("b_cnt"),
    )
    w_before = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    t = F.col("a_cnt") + F.col("b_cnt")
    cum = per_value.select(
        "a_cnt",
        t.alias("t"),
        F.coalesce(F.sum(t).over(w_before), F.lit(0)).alias("cb"),
    )
    r2a = cum.agg(
        F.sum(F.col("a_cnt") * (2 * F.col("cb") + F.col("t") + 1))
    ).collect()[0][0]
    assert r2a == round(2 * _rank_sum_python(a, b))


# --- CUSUM argmax -------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(
        st.integers(-50, 50), min_size=3, max_size=25
    )
)
def test_cusum_argmax_matches_python(spark, xs):
    """The windowed decimal CUSUM peak (value and earliest index)
    equals a direct python scan, with 6dp term rounding applied
    identically."""
    from pyspark.sql import Window

    mean = sum(xs) / len(xs)
    devs = [round(x - round(mean, 6), 6) for x in xs]
    acc, best_i, best_s = 0.0, None, None
    run = []
    for i, d in enumerate(devs):
        acc = round(acc + d, 6)  # decimal sum of 6dp terms is exact
        run.append(acc)
        if best_s is None or abs(acc) > abs(best_s) + 1e-12:
            best_i, best_s = i, acc

    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "i long, x double"
    )
    m = df.agg(F.round(F.avg("x"), 6).alias("m"))
    dev = df.crossJoin(F.broadcast(m)).select(
        "i", F.round(F.col("x") - F.col("m"), 6).alias("d")
    )
    w_cum = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cusum = dev.select(
        "i",
        F.round(
            F.sum(F.col("d").cast("decimal(18,6)")).over(w_cum).cast("double"), 6
        ).alias("s"),
    )
    top = (
        cusum.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.abs(F.col("s")).desc(), "i")),
        )
        .where(F.col("rk") == 1)
        .collect()[0]
    )
    assert top.i == best_i
    assert abs(top.s - best_s) < 1e-9
