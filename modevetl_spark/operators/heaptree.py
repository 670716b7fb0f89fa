"""Closed forms over the heap-shaped synthetic partkey tree.

``partkey_tree_edges`` (operators/graph.py) declares the repo's
deterministic hierarchy: child ``k`` → parent ``k div 2`` over partkeys
``k ≥ 2``. When the partkeys ≥ 2 are exactly the contiguous range
``{2..M}`` — the declared fixture shape, verifiable with ONE aggregate
pass — the graph is the complete ("heap-shaped") binary tree over nodes
``1..M``, and two structural facts collapse whole query tiers
(guide §8: use what you know that the optimizer does not):

1. every subtree is itself heap-shaped, so its SHAPE is determined by
   its SIZE alone;
2. the distinct subtree sizes number ≤ 3 per depth (perfect-left /
   critical-path / perfect-right), i.e. O(log M) total, and the nodes
   sharing a size form ≤ 3 CONTIGUOUS id segments per depth.

Consequences used by the graded queries:

- transitive closure: ``n_descendants(a) = subtree_size(a) − 1`` for
  every ``a ≤ M div 2`` — the whole closure aggregate is
  :func:`size_segments` + one ``spark.range`` broadcast-range join, no
  path-doubling fixpoint;
- PageRank: ``rank_k(v)`` is a function of ``subtree_size(v)`` only
  (children sizes are a function of the parent size, teleport/dangling
  terms are global), so the 10-iteration recurrence replays on the
  driver over the O(log M) size classes — same bounded-replay class as
  the HITS residue collapse (q_graph_hits).

Every caller MUST guard with :func:`contiguous_partkey_max` and keep
the generic operator as the fallback: hostile twins (holes, duplicates
collapse via COUNT(DISTINCT), stray huge keys) fail the guard and take
the unchanged slow path, so the closed forms never see a graph they do
not describe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "contiguous_partkey_max",
    "subtree_size",
    "child_sizes",
    "size_segments",
]


def contiguous_partkey_max(part: DataFrame) -> int | None:
    """One aggregate pass over ``part``: return ``M`` when the distinct
    partkeys ≥ 2 are exactly ``{2..M}`` (so the tree closed forms
    apply), else ``None``. The collect is the scalar-watermark class —
    one 3-column row."""
    row = (
        part.where(F.col("p_partkey") >= 2)
        .agg(
            F.countDistinct("p_partkey").alias("cnt"),
            F.min("p_partkey").alias("mn"),
            F.max("p_partkey").alias("mx"),
        )
        .collect()[0]
    )
    if not row.cnt or row.mn != 2 or row.mx != row.cnt + 1:
        return None
    return int(row.mx)


def subtree_size(v: int, m: int) -> int:
    """Number of nodes in the subtree rooted at ``v`` of the complete
    binary tree over ``1..m`` (level-order numbering): walk the levels,
    each contributing the clipped slot range ``[v·2^d, (v+1)·2^d − 1]``.
    O(log m) integer steps."""
    s, lo, hi = 0, v, v
    while lo <= m:
        s += min(hi, m) - lo + 1
        lo, hi = lo * 2, hi * 2 + 1
    return s


def child_sizes(s: int) -> tuple[int, int]:
    """(left, right) child subtree sizes of the root of a heap-shaped
    tree with ``s`` nodes — size determines shape, so this is a pure
    function of ``s``: with ``h`` full levels above the last
    (``2^h − 1`` nodes) and ``last = s − (2^h − 1)`` nodes on the last
    level filling left-to-right, the left child holds ``2^(h−1) − 1``
    interior nodes plus ``min(last, 2^(h−1))`` last-level nodes."""
    if s <= 1:
        return (0, 0)
    h = s.bit_length() - 1
    last = s - ((1 << h) - 1)
    half = 1 << (h - 1)
    return ((half - 1) + min(last, half), (half - 1) + max(0, last - half))


def size_segments(m: int) -> list[tuple[int, int, int]]:
    """Disjoint ``(lo, hi, size)`` node-id segments covering ``1..m``,
    grouping nodes of the complete binary tree over ``1..m`` by subtree
    size. At each depth ``d`` the critical node ``p = m >> (D − d)``
    (the ancestor of ``m``) splits the level into: left-of-path nodes
    (perfect subtrees WITH a full last level), the path node (mixed),
    and right-of-path nodes (perfect subtrees WITHOUT a last level) —
    ≤ 3 segments per depth, O(log m) total."""
    if m < 1:
        return []
    D = m.bit_length() - 1
    segs: list[tuple[int, int, int]] = []
    for d in range(D + 1):
        lo = 1 << d
        hi = min((1 << (d + 1)) - 1, m)
        p = m >> (D - d)
        if p > lo:
            segs.append((lo, p - 1, (1 << (D - d + 1)) - 1))
        segs.append((p, p, subtree_size(p, m)))
        if p < hi:
            segs.append((p + 1, hi, (1 << (D - d)) - 1))
    return segs
