"""Round-7 breadth wave, STAGED during round 6.

Eight operators rounding out families the registry already carries —
implemented, oracle-gated and driver-sim verified in round 6, but held
OUT of the round-6 grading window behind the never-graded drain cohort
(the staging priority was retired with the round-7 bookkeeping in
``queries/__init__``); they enter the round-7 window as ordinary
never-graded keys.

Contents:

- ``q_tpch_late_shipments`` — the TPC-H Q12 shape (the last Q-shape
  expressible over the fixture's tables; Q2/Q9/Q11/Q16/Q20 need the
  ``partsupp`` relation the fixture does not ship).
- ``q_sketch_quantiles`` — mergeable fixed-width histogram quantile
  sketch with a rank-check bounds oracle (the scale path next to the
  exact ``q_agg_percentile`` / ``q_hist_equidepth`` family).
- ``q_sample_reservoir`` — deterministic fixed-size-k uniform sample
  (the exactly-k companion of Bernoulli ``q_sample_hash``).
- ``q_session_stitch`` — cross-device identity stitching by connected
  components over an identity-link graph.
- ``q_gapfill_percentile`` — gap fill with the per-key lower median
  (the robust-statistic companion of ffill / linear interpolation).
- ``q_dedup_latest_wins`` — latest-version-per-key dedup as ONE
  hash aggregation (max-of-struct), the window-free form of the
  classic ``row_number() = 1`` pattern.
- ``q_embedding_quantize`` — int8 scalar quantization of the
  embedding corpus (per-dim min/max calibration), the 4× memory /
  bandwidth scale path under ANN serving.
- ``q_sim_topk_quantized`` — quantized ANN: ADC candidate search
  over the reconstructed codes + exact rerank, recall@k graded as
  data (full-replay oracle).

Reference parity: SURVEY.md §2's windowed-aggregate, sampling, dedup
and event families ([UPSTREAM MoDevETL/pyLibrary/queries]); each query
re-expresses the documented upstream semantics per SURVEY §0's
protocol, with the physical shape chosen for the 1000-executor case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from modevetl_spark.queries import prep
from modevetl_spark.queries._registry import make_registry
from modevetl_spark.sources.catalog import load
from modevetl_spark.operators.similarity import CLEAN_EMB_SQL as _CLEAN_EMB_SQL

QUERIES, ORACLE, q = make_registry()


# --- TPC-H Q12 shape: late shipments by priority class ------------------

_Q12_ORACLE = """
SELECT CASE CAST(l.l_partkey % 3 AS INT)
         WHEN 0 THEN 'AIR' WHEN 1 THEN 'RAIL' ELSE 'SHIP' END AS shipmode,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY 1
"""


@q("q_tpch_late_shipments", oracle_sql=_Q12_ORACLE)
def tpch_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+: TPC-H Q12 shape — how many high- vs low-priority line items
    shipped late, per ship mode. Fixture adaptation (documented, the
    same policy as the other Q shapes): the fixture has no
    ``l_shipmode`` / commit / receipt dates, so the mode is a derived
    3-way carrier assignment by part (``l_partkey % 3``) and "late"
    is shipped more than 60 days after the order date — the shape
    (fact-fact equi join, conjunct date predicate spanning both sides,
    CASE-split counts over a tiny derived key) is Q12's exactly.

    Plan shape: the ship-late predicate needs columns from BOTH sides,
    so the join itself cannot be avoided: a plain orderkey equi join
    with no strategy hint — at sf the orders side broadcasts under
    AQE, at 100 TB both sides are fact-sized and it degrades to a
    shuffled hash join on the natural join key with no code change.
    The date filter applies immediately post-join (before any other
    column is touched) and the aggregation key has 3 values, so the
    final agg is map-side-combined down to 3 rows per task before a
    negligible exchange."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    mode = (
        F.when(F.col("l_partkey") % 3 == 0, "AIR")
        .when(F.col("l_partkey") % 3 == 1, "RAIL")
        .otherwise("SHIP")
    )
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(mode.alias("shipmode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


# --- Mergeable histogram quantile sketch (bounds oracle) ----------------

_SKETCH_Q_ORACLE = """
WITH stats AS (
    SELECT MIN(l_extendedprice) AS mn,
           CAST(COUNT(*) AS BIGINT) AS n,
           (MAX(l_extendedprice) - MIN(l_extendedprice))
               / CAST(1024 AS DOUBLE) AS width
    FROM lineitem
),
hist AS (
    SELECT CASE WHEN s.width > 0
                THEN CAST(LEAST(FLOOR((l.l_extendedprice - s.mn) / s.width),
                                CAST(1023 AS DOUBLE)) AS BIGINT)
                ELSE 0 END AS bucket,
           COUNT(*) AS cnt
    FROM lineitem l, stats s
    GROUP BY 1
),
cum AS (SELECT bucket, SUM(cnt) OVER (ORDER BY bucket) AS cum FROM hist),
probs AS (
    SELECT UNNEST(['p50', 'p90', 'p99']) AS p_label,
           UNNEST([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                   CAST(0.99 AS DOUBLE)]) AS p
),
tgt AS (
    SELECT p.p_label, CAST(CEIL(p.p * s.n) AS BIGINT) AS target,
           s.mn, s.width, s.n
    FROM probs p, stats s
),
est AS (
    SELECT t.p_label, t.target, t.mn, t.width, t.n,
           MIN(c.bucket) AS est_bucket
    FROM tgt t JOIN cum c ON c.cum >= t.target
    GROUP BY 1, 2, 3, 4, 5
),
chk AS (
    SELECT e.p_label,
           COUNT(CASE WHEN l.l_extendedprice
                           <= e.mn + (e.est_bucket + 2) * e.width
                      THEN 1 END) AS cnt_le_hi,
           COUNT(CASE WHEN l.l_extendedprice
                           <  e.mn + (e.est_bucket - 1) * e.width
                      THEN 1 END) AS cnt_lt_lo
    FROM lineitem l, est e
    GROUP BY 1
)
SELECT e.p_label, e.n, e.est_bucket,
       (c.cnt_le_hi >= e.target AND c.cnt_lt_lo < e.target) AS bounds_ok
FROM est e JOIN chk c ON c.p_label = e.p_label
"""


@q("q_sketch_quantiles", oracle_sql=_SKETCH_Q_ORACLE)
def sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 scale path [EXT]: quantiles from a mergeable fixed-width
    histogram sketch — p50/p90/p99 of ``l_extendedprice`` located to a
    bucket of a K=1024 equi-width histogram, with a rank-check bounds
    verdict. The exact-quantile operators (``q_agg_percentile``,
    ``q_hist_equidepth``) pay a data-sized sort/range-exchange; the
    sketch never sorts the data: quantile error is bounded a priori by
    one bucket width, the classic accuracy-for-shuffle trade.

    Deterministic cross-engine by construction (no sketch internals to
    diverge): min/max/count are order-free, the bucket id is
    ``floor((v-mn)/width)`` — two exact-IEEE ops both engines evaluate
    identically — and the estimate is an integer cumulative walk.

    BOUNDS-ORACLE (the q_agg_approx_sketches pattern): ``bounds_ok``
    asserts the exact p-quantile's rank lands inside the estimated
    bucket ±1 bucket of slack, via counts of raw values against the
    bucket's widened edges — an independent path from the bucket
    assignment (edge arithmetic ``mn + b·width`` vs the floor
    division), recomputed identically by the DuckDB oracle rather than
    asserted as a literal. ``n`` and ``est_bucket`` are hash-graded
    integers.

    Plan shape (``operators/sketches.histogram_quantiles``): three fact
    scans, each a map-side-combined aggregate with NO data shuffle —
    (1) the one-row min/max/count, (2) the ≤K-row bucket histogram
    (hash agg on a derived int key), (3) the 3-row verification count
    against broadcast bucket edges. The cumulative walk runs on the
    ≤1024-row histogram through ``global_running`` (range-exchange
    machinery — bounded input, and keeps the registry-wide
    no-global-window gate clean); estimates and targets ride
    one-row/3-row broadcast cross joins (the Q22 scalar pattern). At
    100 TB: scans stream, every exchange is bounded by K or |probs|."""
    from modevetl_spark.operators.sketches import histogram_quantiles

    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    return histogram_quantiles(
        li,
        "l_extendedprice",
        [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)],
        k=1024,
    )


# --- Deterministic fixed-size reservoir sample --------------------------

_RESERVOIR_ORACLE = """
SELECT o_orderkey, o_totalprice,
       CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
            AS BIGINT) AS priority
FROM orders
ORDER BY priority, o_orderkey
LIMIT 200
"""


@q("q_sample_reservoir", oracle_sql=_RESERVOIR_ORACLE)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2+ [EXT]: deterministic reservoir sample — EXACTLY k=200 orders,
    uniform over the key space, independent of row order and partition
    layout. ``q_sample_hash`` is Bernoulli (a rate, size varies);
    training-data recipes routinely need an exact row budget — the
    classic reservoir. Determinism replaces the RNG: each row's
    priority is the shared 32-bit md5 idiom on its key
    (``conv(substr(md5(k),1,8),16,10)``, engine-identical), and the
    sample is the k smallest priorities with the unique key as
    tie-break — the bottom-k-by-random-priority formulation of
    reservoir sampling, replayable by any engine.

    Plan shape: ``ORDER BY priority LIMIT k`` compiles to
    TakeOrderedAndProject — each task keeps a k-row heap, the driver
    merges |tasks|·k candidate rows; NO global sort, no shuffle of the
    data. At 100 TB the cost is one streaming scan plus k·P rows of
    driver merge — the same bound as the repo's other TakeOrdered
    cuts (vocab build, Misra–Gries candidates)."""
    prep(spark)
    o = load(spark, sf_dir, "orders")
    priority = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return (
        o.select("o_orderkey", "o_totalprice", priority.alias("priority"))
        .orderBy("priority", "o_orderkey")
        .limit(200)
    )


# --- Cross-device identity stitching (connected components) -------------

_STITCH_ORACLE = """
WITH RECURSIVE s AS (
    SELECT user_id, event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events WHERE event_type = 'signup'
),
fl AS (
    SELECT user_id,
           arg_min(k, event_id) AS dev_k,
           arg_max(k, event_id) AS email_k
    FROM s GROUP BY user_id
),
e AS (
    SELECT user_id AS a, 100000 + dev_k AS b FROM fl
    UNION
    SELECT user_id AS a, 200000 + email_k AS b FROM fl
),
links AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
reach AS (
    SELECT a, b FROM links
    UNION
    SELECT r.a, l.b FROM reach r JOIN links l ON l.a = r.b
),
lab AS (SELECT a AS node, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a),
users AS (SELECT node, comp FROM lab WHERE node < 100000),
sizes AS (
    SELECT comp, CAST(COUNT(*) AS BIGINT) AS n_users FROM users GROUP BY comp
)
SELECT u.node AS user_id, u.comp AS stitched_id, z.n_users
FROM users u JOIN sizes z ON z.comp = u.comp
"""


@q("q_session_stitch", oracle_sql=_STITCH_ORACLE)
def session_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7+ [EXT]: cross-device identity stitching — resolve each user to
    a stitched identity by connecting users through shared device /
    email identifiers, the identity-resolution step upstream of any
    per-person sessionization or attribution. Fixture linkage (real
    schemas carry device ids; the fixture derives them): a user's
    "device" is the ``k`` prop of their FIRST signup event and their
    "email" the ``k`` of their LAST (min/max ``event_id`` —
    deterministic arg-extremes), giving a bipartite user↔identifier
    graph whose connected components are the stitched identities
    (stitched id = min user id in the component; identifier node ids
    are offset into disjoint ranges so the min is always a user).
    The range arithmetic is GUARDED, not assumed: every user id and
    identifier key is range-checked inline (``raise_error`` branch
    fused into the node expression, so Catalyst cannot prune it) —
    a key outside [0, 100000) would silently collide the user /
    device / email node spaces and merge unrelated identities while
    the oracle, replicating the same encoding, stayed green.

    Plan shape: edge derivation is one user-keyed aggregate of the
    signup slice (two ``min_by``/``max_by`` — no window, no sort);
    stitching reuses ``operators/components.connected_components`` —
    per-round cost one node-keyed join + hash agg, O(diameter) rounds,
    lineage checkpoint-truncated. Identifier hubs (one device shared
    by many users) are exactly the star graphs label propagation
    resolves in 2 rounds. Oracle: DuckDB recursive-CTE reachability
    closure + min-label (the q_graph_closure pattern) — a REAL
    component computation, not a closed form."""
    from modevetl_spark.operators.components import connected_components

    prep(spark)
    ev = load(spark, sf_dir, "events")
    s = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    fl = s.groupBy("user_id").agg(
        F.min_by("k", "event_id").alias("dev_k"),
        F.max_by("k", "event_id").alias("email_k"),
    )

    lim = 100000

    def _ranged(col: Column, offset: int) -> Column:
        # Range-guard fused into the node id so it survives pruning:
        # any id outside [0, lim) aborts the job instead of silently
        # colliding node spaces (user < lim <= device < 2·lim <= email).
        ok = (col >= 0) & (col < F.lit(lim))
        return F.when(ok, F.lit(offset) + col).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"session_stitch: id out of [0, {lim}): "),
                    col.cast("string"),
                )
            )
        )

    edges = fl.select(
        _ranged(F.col("user_id"), 0).alias("src"),
        _ranged(F.col("dev_k"), lim).alias("dst"),
    ).union(
        fl.select(
            _ranged(F.col("user_id"), 0).alias("src"),
            _ranged(F.col("email_k"), 2 * lim).alias("dst"),
        )
    )
    comp = connected_components(edges)
    users = comp.where(F.col("node") < 100000)
    sizes = users.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    return users.join(sizes, "component").select(
        F.col("node").alias("user_id"),
        F.col("component").alias("stitched_id"),
        "n_users",
    )


# --- Gap fill with the per-key lower median -----------------------------

_MEDIAN_FILL_ORACLE = """
WITH daily AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           ROUND(CAST(SUM(TRY_CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS v
    FROM events
    WHERE ts >= TIMESTAMP '1900-01-01' AND ts < TIMESTAMP '2100-01-01'
    GROUP BY 1, 2
),
span AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1),
grid AS (
    SELECT user_id,
           CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
    FROM span
),
ranked AS (
    SELECT user_id, v,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY v, day) AS rn,
           COUNT(*) OVER (PARTITION BY user_id) AS cnt
    FROM daily WHERE v IS NOT NULL
),
med AS (
    SELECT user_id, v AS med_v FROM ranked
    WHERE rn = CAST(CEIL(cnt / CAST(2 AS DOUBLE)) AS BIGINT)
)
SELECT g.user_id, CAST(g.day AS TIMESTAMP) AS day,
       COALESCE(d.v, m.med_v) AS value_filled,
       d.v IS NOT NULL AS observed
FROM grid g
LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
JOIN med m ON m.user_id = g.user_id
"""


@q("q_gapfill_percentile", oracle_sql=_MEDIAN_FILL_ORACLE)
def gapfill_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2+/T2+ [EXT]: gap fill with the per-key LOWER MEDIAN — densify
    each user's daily metric to a full day grid and fill missing days
    with the user's median observed daily value: the robust-statistic
    fill that completes the family next to last-observation
    (``q_gapfill_ffill``) and linear interpolation
    (``q_gapfill_interp``); medians shrug off the outlier days that
    poison a mean fill.

    Lower median on purpose (rank ``ceil(n/2)`` in ``(v, day)``
    order): it SELECTS an existing 6dp value instead of averaging the
    middle pair, so no new float is manufactured and the cross-engine
    .5-boundary rounding trap (round-5 k-means lesson) cannot occur —
    the oracle picks the identical row by the identical rank rule.
    NULL daily sums (a user-day whose every ``value`` is NULL) are
    excluded from the median rank on BOTH engines — Spark orders NULLs
    first while SQL ROW_NUMBER orders them last, so letting them into
    the rank would silently shift the pick (and could even fill gaps
    with NULL); the fill for such a day still comes from the non-null
    median via COALESCE.

    Plan shape: one (user, day) hash agg; the per-user median is a
    user-partitioned window rank (balanced — partitioned by key, never
    global) picking one row per user; the grid is generated from each
    user's min/max span (|users|·|days| rows — produced, never
    scanned) and takes the fill via two user-keyed joins that share
    the aggregation's hash partitioning. At 100 TB nothing windows or
    sorts globally. The valid-event-time guard (mirrored in the
    oracle) bounds the span a single malformed year-9999 row could
    otherwise explode to ~2.9M grid rows — the q_gapfill_interp
    poison-pill class."""
    prep(spark)
    ev = load(spark, sf_dir, "events").where(
        (F.col("ts") >= F.lit("1900-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2100-01-01").cast("timestamp"))
    )
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        # try_cast at the fold seam: one 1e300 value row NULLs out
        # instead of aborting the stage (COVERAGE.md M11)
        F.round(
            F.sum(F.col("value").try_cast("decimal(18,6)")).cast("double"), 6
        ).alias("v")
    )
    w_rank = Window.partitionBy("user_id").orderBy("v", "day")
    w_cnt = Window.partitionBy("user_id")
    med = (
        daily.where(F.col("v").isNotNull())
        .select(
            "user_id",
            "v",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_cnt).alias("cnt"),
        )
        .where(
            F.col("rn")
            == F.ceil(F.col("cnt") / F.lit(2.0)).cast("bigint")
        )
        .select("user_id", F.col("v").alias("med_v"))
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = span.select("user_id", F.explode(F.sequence("lo", "hi")).alias("day"))
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .join(med, "user_id")
        .select(
            "user_id",
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce("v", "med_v").alias("value_filled"),
            F.col("v").isNotNull().alias("observed"),
        )
    )


# --- Latest-version-per-key dedup, window-free --------------------------

_LATEST_WINS_ORACLE = """
SELECT user_id, CAST(ts AS TIMESTAMP) AS last_ts,
       event_id AS last_event_id, event_type AS last_event_type,
       n_versions
FROM (
    SELECT user_id, ts, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_versions
    FROM events
)
WHERE rn = 1
"""


@q("q_dedup_latest_wins", oracle_sql=_LATEST_WINS_ORACLE)
def dedup_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1+/W3 scale path [EXT]: latest-version-per-key dedup as ONE hash
    aggregation — keep each user's most recent event (by ``(ts,
    event_id)``, the unique id breaking timestamp ties) via
    ``max(struct(ts, event_id, event_type))``: struct comparison is
    lexicographic, so the max struct IS the ``ORDER BY ts DESC, id
    DESC LIMIT 1`` row. The CDC-compaction / snapshot-dedup primitive,
    graded against the classic ``row_number() = 1`` oracle to prove
    the rewrite exact.

    Why not the window: ``row_number() OVER (PARTITION BY key ORDER BY
    ts DESC)`` shuffles EVERY version of every row, then sorts each
    partition, only to discard all but one row per key. The max-struct
    aggregate does the discard map-side: partial aggregation collapses
    each task's rows to one candidate per key before the exchange, so
    the shuffle carries |keys| rows, not |rows| — at 100 TB of
    versioned events with long histories that is orders of magnitude
    less traffic, and there is no sort at all. ``n_versions`` rides
    the same agg for free."""
    prep(spark)
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type")).alias("last"),
        F.count(F.lit(1)).cast("bigint").alias("n_versions"),
    )
    return agg.select(
        "user_id",
        F.col("last.ts").alias("last_ts"),
        F.col("last.event_id").alias("last_event_id"),
        F.col("last.event_type").alias("last_event_type"),
        "n_versions",
    )


# --- Int8 scalar quantization of embeddings -----------------------------

# ROW-LOCAL, mirroring the engine's per-row transform against broadcast
# calibration arrays (no explode→GROUP BY→join): a grouped oracle loses
# rows whose embedding is NULL or empty (nothing to unnest), and a join
# back on vec_id is ill-posed when vec_id itself is NULL or duplicated.
# Degenerate contracts match the engine exactly: NULL embedding → NULL
# codes / NULL quant_ok; empty embedding → '' / TRUE (forall over [] is
# TRUE; list_aggregate over [] is NULL, hence the COALESCE).
_QUANTIZE_ORACLE = """
WITH ex AS (
    SELECT unnest(range(1, len(embedding) + 1)) AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
),
stats AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY dim),
arrs AS (
    SELECT list(mn ORDER BY dim) AS mns, list(mx ORDER BY dim) AS mxs
    FROM stats
)
SELECT e.vec_id,
       CASE WHEN e.embedding IS NULL THEN NULL
            ELSE COALESCE(array_to_string(list_transform(
                range(1, len(e.embedding) + 1),
                i -> CAST(CASE WHEN a.mxs[i] > a.mns[i]
                               THEN CAST(FLOOR(((CAST(e.embedding[i] AS DOUBLE)
                                                 - a.mns[i])
                                                / (a.mxs[i] - a.mns[i])) * 255)
                                         AS BIGINT)
                               ELSE 0 END AS VARCHAR)), ','), '')
       END AS codes,
       CASE WHEN e.embedding IS NULL THEN NULL
            ELSE COALESCE(list_aggregate(list_transform(
                range(1, len(e.embedding) + 1),
                i -> CASE WHEN a.mxs[i] > a.mns[i]
                          THEN ABS(CAST(e.embedding[i] AS DOUBLE)
                                   - (a.mns[i]
                                      + CAST(FLOOR(((CAST(e.embedding[i] AS DOUBLE)
                                                     - a.mns[i])
                                                    / (a.mxs[i] - a.mns[i])) * 255)
                                             AS BIGINT)
                                        * ((a.mxs[i] - a.mns[i]) / 255)))
                               <= ((a.mxs[i] - a.mns[i]) / 255)
                                  * CAST(1.000001 AS DOUBLE)
                          ELSE TRUE END), 'bool_and'), TRUE)
       END AS quant_ok
FROM embeddings e CROSS JOIN arrs a
"""


@q("q_embedding_quantize", oracle_sql=_QUANTIZE_ORACLE)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3+ scale path [EXT]: int8 scalar quantization of the embedding
    corpus — per-dimension min/max calibration, then each float maps to
    ``floor((x−mn)/(mx−mn)·255)`` ∈ 0..255: the standard 4× memory /
    bandwidth compression that lets an ANN serving tier hold the
    corpus in RAM (IVF cells + int8 codes is the classic pairing with
    this repo's ``q_sim_topk_ivf``). Deterministic end-to-end — the
    calibration is order-free min/max and the code is two exact IEEE
    ops both engines evaluate identically (everything cast to DOUBLE
    first: float arithmetic wouldn't round identically to double's).

    ``quant_ok`` verifies the quantization error bound |x − x̂| ≤ step
    per element from the raw values (1e-6 relative slack absorbs the
    one-ulp division rounding at cell boundaries; the oracle
    recomputes the same predicate, not a literal). Codes emit as an
    ordered CSV string (the array-output hash hazard).

    Plan shape: calibration is one posexplode → per-dim hash agg —
    the explode inflates 64× IN-TASK only; map-side combine collapses
    the exchange to |dims| rows per task. The 64-row stats table rides
    back as two broadcast arrays on a one-row crossJoin, and the
    encoding is a per-row array transform — zero shuffle of the
    corpus. At 100 TB: one streaming calibration pass, one streaming
    encode pass."""
    prep(spark)
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    stats = ex.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    statarr = stats.agg(
        F.array_sort(F.collect_list(F.struct("dim", "mn", "mx"))).alias("s")
    ).select(
        F.transform("s", lambda r: r.mn).alias("mns"),
        F.transform("s", lambda r: r.mx).alias("mxs"),
    )

    def _code(x, i):
        mn = F.element_at("mns", i + F.lit(1))
        mx = F.element_at("mxs", i + F.lit(1))
        xd = x.cast("double")
        return (
            F.when(
                mx > mn,
                F.floor(((xd - mn) / (mx - mn)) * F.lit(255)).cast("bigint"),
            )
            .otherwise(F.lit(0).cast("bigint"))
        )

    def _ok(x, i):
        mn = F.element_at("mns", i + F.lit(1))
        mx = F.element_at("mxs", i + F.lit(1))
        xd = x.cast("double")
        step = (mx - mn) / F.lit(255)
        recon = mn + _code(x, i) * step
        return F.when(
            mx > mn, F.abs(xd - recon) <= step * F.lit(1.000001)
        ).otherwise(F.lit(True))

    return emb.crossJoin(F.broadcast(statarr)).select(
        "vec_id",
        F.array_join(
            F.transform(
                F.col("embedding"), lambda x, i: _code(x, i).cast("string")
            ),
            ",",
        ).alias("codes"),
        # indexed transform, NOT zip_with + sequence(0, size-1): on an
        # empty array sequence(0, -1) is the DESCENDING [0, -1], whose
        # i=-1 reaches element_at(..., 0) and aborts the job with
        # INVALID_INDEX_OF_ZERO; transform over [] is simply [].
        F.forall(
            F.transform(F.col("embedding"), lambda x, i: _ok(x, i)),
            lambda b: b,
        ).alias("quant_ok"),
    )


# --- Quantized ANN: ADC candidate search + exact rerank -----------------

_TOPK_QUANT_ORACLE = f"""
WITH clean AS (SELECT * FROM embeddings WHERE {_CLEAN_EMB_SQL}),
ex AS (
    SELECT vec_id,
           unnest(range(1, len(embedding) + 1)) AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM clean
),
stats AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY dim),
coded AS (
    SELECT e.vec_id, e.dim, s.mn, s.mx,
           CASE WHEN s.mx > s.mn
                THEN CAST(FLOOR(((e.x - s.mn) / (s.mx - s.mn)) * 255)
                          AS BIGINT)
                ELSE 0 END AS code
    FROM ex e JOIN stats s USING (dim)
),
recon AS (
    SELECT vec_id,
           list(CASE WHEN mx > mn
                     THEN mn + (code + CAST(0.5 AS DOUBLE))
                               * ((mx - mn) / 255)
                     ELSE mn END ORDER BY dim) AS r_vec
    FROM coded GROUP BY vec_id
),
qs AS (
    SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_vec
    FROM clean WHERE vec_id < 20
),
adc AS (
    SELECT q.query_id, r.vec_id AS neighbor_id, q.q_vec,
           ROUND(list_cosine_similarity(q.q_vec, r.r_vec), 6) AS adc
    FROM qs q JOIN recon r ON r.vec_id <> q.query_id
),
cand AS (
    SELECT query_id, neighbor_id, q_vec FROM adc
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY adc DESC, neighbor_id) <= 10
),
rer AS (
    SELECT query_id, neighbor_id, cos_sim FROM (
        SELECT c.query_id, c.neighbor_id,
               ROUND(list_cosine_similarity(
                   c.q_vec, CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY c.query_id
                   ORDER BY ROUND(list_cosine_similarity(
                       c.q_vec, CAST(e.embedding AS DOUBLE[])), 6) DESC,
                   c.neighbor_id) AS rn
        FROM cand c JOIN clean e ON e.vec_id = c.neighbor_id
    ) WHERE rn <= 5
),
truth AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY ROUND(list_cosine_similarity(
                       q.q_vec, CAST(c.embedding AS DOUBLE[])), 6) DESC,
                   c.vec_id) AS rn
        FROM qs q JOIN clean c ON c.vec_id <> q.query_id
    ) WHERE rn <= 5
),
hits AS (
    SELECT r.query_id, CAST(COUNT(t.neighbor_id) AS BIGINT) AS h
    FROM rer r
    LEFT JOIN truth t ON t.query_id = r.query_id
                     AND t.neighbor_id = r.neighbor_id
    GROUP BY r.query_id
)
SELECT r.query_id, r.neighbor_id, r.cos_sim,
       h.h / CAST(5 AS DOUBLE) AS recall_at_k
FROM rer r JOIN hits h USING (query_id)
"""


@q("q_sim_topk_quantized", oracle_sql=_TOPK_QUANT_ORACLE)
def sim_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2+ scale path [EXT]: quantized ANN — asymmetric distance
    computation (ADC) over the int8-reconstructed corpus picks top-2k
    candidates per query, then an exact rerank of those candidates
    yields the final top-k, with recall@k against the exact
    brute-force truth emitted per query. This is the serving-tier
    pairing of ``q_embedding_quantize``: the scan phase reads 4×-
    compressed codes (reconstruction ``mn + (code+0.5)·step`` is two
    exact IEEE ops), and only ≤2k full-precision vectors per query are
    ever touched.

    FULL-REPLAY ORACLE (the LSH-oracle pattern, not a bounds gate):
    DuckDB recomputes the identical calibration, codes, reconstruction,
    ADC ranking and rerank — approximation error doesn't matter for
    parity because both engines run the same approximation; the
    ``recall_at_k`` column grades retrieval quality as data (an exact
    integer count / 5).

    Plan shape: calibration as in q_embedding_quantize (|dims|-row
    agg); the ADC pass is corpus × broadcast-20-queries with a
    query-partitioned (never global) top-10 window; the rerank joins
    10·|queries| candidate rows back to the corpus by id — at 100 TB
    the corpus is scanned once as codes and once point-probed by id,
    and with persisted codes (the deployment shape; the fixture
    derives them inline) the full-precision table is only touched by
    the point probes."""
    from modevetl_spark.operators.similarity import cosine_pre, nrm, well_formed

    prep(spark)
    # shared degenerate-vector contract (emits cosine + feeds the
    # per-dim quantization stats; see similarity.well_formed) — the
    # nrm projection is reused by every full-precision scoring tier
    emb = well_formed(load(spark, sf_dir, "embeddings"), nrm_col="nrm")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    stats = ex.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    statarr = stats.agg(
        F.array_sort(F.collect_list(F.struct("dim", "mn", "mx"))).alias("s")
    ).select(
        F.transform("s", lambda r: r.mn).alias("mns"),
        F.transform("s", lambda r: r.mx).alias("mxs"),
    )

    def _recon(x, i):
        mn = F.element_at("mns", i + F.lit(1))
        mx = F.element_at("mxs", i + F.lit(1))
        xd = x.cast("double")
        code = F.floor(((xd - mn) / (mx - mn)) * F.lit(255)).cast("bigint")
        return F.when(
            mx > mn, mn + (code + F.lit(0.5)) * ((mx - mn) / F.lit(255))
        ).otherwise(mn)

    recon = (
        emb.crossJoin(F.broadcast(statarr))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.transform(F.col("embedding"), _recon).alias("r_vec"),
        )
        .withColumn("r_nrm", nrm("r_vec"))
    )
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.col("nrm").alias("q_nrm"),
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    cand = (
        recon.crossJoin(F.broadcast(qs))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "q_vec",
            "q_nrm",
            F.round(
                cosine_pre(
                    F.col("q_vec"), F.col("r_vec"), F.col("q_nrm"), F.col("r_nrm")
                ),
                6,
            ).alias("adc"),
        )
        .withColumn("rn", F.row_number().over(w_adc))
        .where(F.col("rn") <= 10)
        .drop("rn", "adc")
    )
    exact = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        F.col("nrm").alias("c_nrm"),
    )
    w_rer = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    rer = (
        cand.join(exact, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_pre(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_nrm"), F.col("c_nrm")
                ),
                6,
            ).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w_rer))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )
    w_truth = Window.partitionBy("query_id").orderBy(
        F.col("tcos").desc(), F.col("neighbor_id")
    )
    truth = (
        exact.crossJoin(F.broadcast(qs))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_pre(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_nrm"), F.col("c_nrm")
                ),
                6,
            ).alias("tcos"),
        )
        .withColumn("rn", F.row_number().over(w_truth))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    hits = (
        rer.join(truth, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("h"))
    )
    full_hits = rer.select("query_id").distinct().join(hits, "query_id", "left")
    return (
        rer.join(
            full_hits.select(
                "query_id", F.coalesce("h", F.lit(0)).alias("h")
            ),
            "query_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            "cos_sim",
            (F.col("h") / F.lit(5.0)).alias("recall_at_k"),
        )
    )
