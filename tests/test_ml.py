"""Contract gates for queries/ml.py + operators/clustering.py: k-means
convergence and partition-invariance, range-search threshold contract,
paragraph-dedup conservation, attribution join shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from modevetl_spark.queries import all_queries
from tests.test_plans import plan

_Q = all_queries()


def test_kmeans_separates_planted_blobs(spark):
    """Two tight, far-apart blobs; k=2 seeded one in each — every point
    must land with its blob regardless of iteration count."""
    from modevetl_spark.operators.clustering import kmeans_lloyd

    rows = []
    for i in range(20):
        base = 0.0 if i % 2 == 0 else 10.0
        rows.append((i, [base + 0.01 * i, base - 0.01 * i]))
    # ids 0 and 1 are in different blobs -> seeds cover both
    emb = spark.createDataFrame(rows, "vec_id: long, v: array<double>")
    out = kmeans_lloyd(emb, k=2, iterations=2).collect()
    by_id = {r.vec_id: r.cluster for r in out}
    assert all(by_id[i] == by_id[0] for i in range(0, 20, 2))
    assert all(by_id[i] == by_id[1] for i in range(1, 20, 2))
    assert by_id[0] != by_id[1]


def test_kmeans_partition_invariant(spark):
    """Same data, different physical partitioning -> identical
    assignments AND identical distances (the decimal-exactness claim)."""
    from modevetl_spark.operators.clustering import kmeans_lloyd

    rows = [(i, [((i * 37) % 11) / 7.0, ((i * 53) % 13) / 9.0]) for i in range(60)]
    a = spark.createDataFrame(rows, "vec_id: long, v: array<double>")
    b = a.repartition(17)
    ra = {(r.vec_id): (r.cluster, r.dist) for r in kmeans_lloyd(a, k=3).collect()}
    rb = {(r.vec_id): (r.cluster, r.dist) for r in kmeans_lloyd(b, k=3).collect()}
    assert ra == rb


def test_range_search_threshold_contract(spark, sf_dir):
    """Everything reported clears the threshold; pairs are canonical
    (a_id < b_id) and within one label block."""
    out = _Q["q_sim_range_search"](spark, sf_dir).cache()
    try:
        assert out.where(F.col("cosine") < 0.25).count() == 0
        assert out.where(F.col("a_id") >= F.col("b_id")).count() == 0
    finally:
        out.unpersist()


def test_paragraph_dedup_conservation(spark, sf_dir):
    """Kept never exceeds total; global kept mass equals the number of
    DISTINCT segments in the corpus (each distinct segment survives
    exactly once)."""
    from modevetl_spark.sources.catalog import load

    out = _Q["q_dedup_paragraph"](spark, sf_dir).cache()
    try:
        assert out.where(F.col("n_kept") > F.col("n_segs")).count() == 0
        total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
        d = load(spark, sf_dir, "documents").select("doc_id", "text")
        words = F.split(F.col("text"), " ")
        n_seg = F.ceil(F.size(words) / F.lit(10.0)).cast("int")
        seg_arr = F.transform(
            F.sequence(F.lit(0), n_seg - 1),
            lambda i: F.array_join(F.slice(words, i * 10 + 1, 10), " "),
        )
        n_distinct = (
            d.select(F.explode(seg_arr).alias("s")).select("s").distinct().count()
        )
        assert total_kept == n_distinct
    finally:
        out.unpersist()


def test_attribution_no_cartesian(spark, sf_dir):
    """The interval join must run as an equi join on user_id with the
    range predicate as a post-join filter — never a nested-loop over
    the full cross product."""
    p = plan(_Q["q_attribution_last_touch"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_attribution_window_bounds(spark, sf_dir):
    """No reported last click precedes its purchase by more than the
    hour, or follows it."""
    out = _Q["q_attribution_last_touch"](spark, sf_dir)
    bad = out.where(
        (F.col("last_click_ts") > F.col("buy_ts"))
        | (
            F.col("last_click_ts")
            < F.col("buy_ts") - F.expr("INTERVAL 1 hour")
        )
    )
    assert bad.count() == 0
