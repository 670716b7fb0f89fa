"""Heap-tree closed forms (operators/heaptree) and the contiguity guard
that gates the q_graph_closure / q_graph_pagerank fast paths."""

from __future__ import annotations

import pytest

from modevetl_spark.operators.heaptree import (
    child_sizes,
    contiguous_partkey_max,
    size_segments,
    subtree_size,
)


def _brute_size(v: int, m: int) -> int:
    """Independent witness: BFS count of {v's descendants incl. v}."""
    total, frontier = 0, [v]
    while frontier:
        total += len(frontier)
        frontier = [
            c for p in frontier for c in (2 * p, 2 * p + 1) if c <= m
        ]
    return total


@pytest.mark.parametrize("m", [1, 2, 3, 4, 5, 7, 8, 12, 31, 100, 199, 1999])
def test_subtree_size_matches_bfs(m):
    for v in range(1, m + 1):
        assert subtree_size(v, m) == _brute_size(v, m), (v, m)


@pytest.mark.parametrize("m", [2, 3, 6, 10, 31, 64, 100, 1999])
def test_child_sizes_consistent_with_subtree_size(m):
    for v in range(1, m + 1):
        s = subtree_size(v, m)
        left, right = child_sizes(s)
        assert left == (subtree_size(2 * v, m) if 2 * v <= m else 0)
        assert right == (
            subtree_size(2 * v + 1, m) if 2 * v + 1 <= m else 0
        )


@pytest.mark.parametrize("m", [1, 2, 3, 5, 8, 13, 100, 199, 1999, 20000])
def test_size_segments_partition_and_agree(m):
    segs = size_segments(m)
    seen = {}
    for lo, hi, size in segs:
        assert lo <= hi
        for v in range(lo, hi + 1):
            assert v not in seen
            seen[v] = size
    assert set(seen) == set(range(1, m + 1))
    # spot-check sizes (full check for small m)
    for v in list(range(1, min(m, 64) + 1)) + [m, m // 2 or 1]:
        assert seen[v] == subtree_size(v, m), (v, m)
    # O(log m) bound: ≤ 3 segments per depth
    assert len(segs) <= 3 * (m.bit_length())


def test_contiguity_guard_and_fallback(spark, tmp_path):
    import pyspark.sql.functions as F

    ok = spark.range(0, 200).select(F.col("id").alias("p_partkey"))
    assert contiguous_partkey_max(ok) == 199
    # holes → None (queries fall back to the generic operators)
    holey = ok.where(F.col("p_partkey") != 57)
    assert contiguous_partkey_max(holey) is None
    # a stray huge key → None
    huge = ok.union(
        spark.createDataFrame([(10**15,)], "p_partkey long")
    )
    assert contiguous_partkey_max(huge) is None
    # duplicates collapse (COUNT DISTINCT), matching the operators'
    # DISTINCT edge semantics
    assert contiguous_partkey_max(ok.union(ok)) == 199
    # nothing ≥ 2 → None
    assert contiguous_partkey_max(ok.where(F.col("p_partkey") < 2)) is None


def test_pagerank_replay_matches_textbook_on_small_tree():
    """Unquantized textbook pagerank on the m=12 heap tree vs the
    9dp-quantized class replay: agreement to 1e-8 (quantization noise
    only), per-node via the size classes."""
    from modevetl_spark.queries.extras import _pagerank_heap_replay

    m = 12
    r_by_size = _pagerank_heap_replay(m, iterations=10)
    # textbook per-node replay
    n, d = m, 0.85
    r = {v: 1.0 / n for v in range(1, m + 1)}
    for _ in range(10):
        dm = r[1]
        nxt = {}
        for v in range(1, m + 1):
            s_in = sum(r[c] for c in (2 * v, 2 * v + 1) if c <= m)
            nxt[v] = (1.0 - d) / n + d * s_in + d * dm / n
        r = nxt
    for v in range(1, m + 1):
        assert abs(r_by_size[subtree_size(v, m)] - r[v]) < 1e-8, v
