"""Unit tests for the round-9 staged wave (queries/wave10.py):
full python replays of the deterministic sketches, merge laws,
plan-shape gates, and the two-tier staging contract (wave10 keys must
sit behind BOTH the round-7 window and the round-8 staged wave).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from modevetl_spark.queries.wave10 import QUERIES


def test_wave10_staged_behind_wave9():
    """Two-tier staging: wave10 keys occupy the very tail of the
    emission order, AFTER the round-8 staged wave — they can displace
    neither a round-7 window slot nor a round-8 drain slot."""
    from modevetl_spark import queries as Q

    qs, oracle = Q.all_queries(), Q.all_oracle()
    assert set(QUERIES) == set(Q._STAGED_R9)
    assert set(QUERIES) <= set(oracle)
    order = list(qs)
    n9 = len(Q._STAGED_R9)
    n8 = len(Q._STAGED_R8)
    assert set(order[-n9:]) == set(Q._STAGED_R9)
    assert set(order[-(n8 + n9):-n9]) == set(Q._STAGED_R8)


class TestHll:
    def _py_registers(self, keys, b=6):
        wbits = 32 - b
        reg: dict = {}
        for k in keys:
            h = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
            j, w = h >> wbits, h & ((1 << wbits) - 1)
            rho = wbits + 1 if w == 0 else wbits - (w.bit_length() - 1)
            reg[j] = max(reg.get(j, 0), rho)
        return reg

    def test_fixture_full_python_replay(self, spark, sf_dir):
        """The whole sketch — registers, harmonic sum, estimate —
        replays exactly from hashlib + python floats (every harmonic
        term is an exact power of two, so even the float sum is
        order-free and exact)."""
        import duckdb

        from modevetl_spark.queries.wave10 import (
            _HLL_ALPHA,
            _HLL_M,
            sketch_hll,
        )

        r = sketch_hll(spark, sf_dir).collect()[0]
        keys = [
            k
            for (k,) in duckdb.connect()
            .execute(
                f"SELECT l_partkey FROM read_parquet('{sf_dir}/lineitem.parquet')"
            )
            .fetchall()
        ]
        reg = self._py_registers(keys)
        s = (_HLL_M - len(reg)) + sum(1.0 / (1 << mj) for mj in reg.values())
        assert r["n_regs"] == len(reg)
        assert r["v_zeros"] == _HLL_M - len(reg)
        assert r["harmonic_sum"] == s
        assert r["est_hll"] == _HLL_ALPHA * _HLL_M * _HLL_M / s
        assert r["exact_distinct"] == len(set(keys))
        assert r["ok_2sigma"] == (
            abs(r["est_hll"] - r["exact_distinct"]) / r["exact_distinct"]
            <= 2 * 1.04 / _HLL_M**0.5
        )

    def test_registers_merge_by_max_and_dedupe_free(self, spark):
        """HLL is max-mergeable: state(A ⊎ B) == per-register max of
        state(A), state(B) — and duplicates change nothing (insert
        idempotence), the property KMV needs a distinct() for."""
        from modevetl_spark.operators.sketches import hll_state

        a = spark.createDataFrame([(i,) for i in range(50)], "k long")
        b = spark.createDataFrame(
            [(i,) for i in range(30, 120)] * 3, "k long"  # overlaps + dups
        )
        sa = {r["j"]: r["mj"] for r in hll_state(a, "k").collect()}
        sb = {r["j"]: r["mj"] for r in hll_state(b, "k").collect()}
        both = a.unionByName(b)
        sab = {r["j"]: r["mj"] for r in hll_state(both, "k").collect()}
        merged = {
            j: max(sa.get(j, 0), sb.get(j, 0)) for j in set(sa) | set(sb)
        }
        assert merged == sab
        assert sab == self._py_registers(list(range(120)))

    def test_plan_bounded_exchange_no_python(self, spark, sf_dir):
        from modevetl_spark.queries.wave10 import sketch_hll
        from tests.test_plans import plan

        p = plan(sketch_hll(spark, sf_dir))
        assert "Python" not in p
        assert "SortMergeJoin" not in p
        assert "Window" not in p


class TestCooccurPmi:
    def test_fixture_replay_and_contract(self, spark, sf_dir):
        """Every emitted PMI must replay exactly from its own integer
        counts through the same log2 chain; pairs are unordered,
        non-self, above the support floor."""
        import math

        from modevetl_spark.queries.wave10 import (
            _PMI_K,
            _PMI_MIN,
            cooccur_pmi,
        )

        rows = cooccur_pmi(spark, sf_dir).collect()
        assert len(rows) == _PMI_K
        for r in rows:
            assert r["tok_a"] < r["tok_b"]  # unordered + non-self
            assert r["c_ab"] >= _PMI_MIN
            assert r["c_a"] >= r["c_ab"] and r["c_b"] >= r["c_ab"]
        # replay needs N; recover it from any row (pmi = log2(cab) +
        # log2(N) - log2(ca) - log2(cb)) => all rows must agree on N.
        # Python's math.log2 and the JVM's differ by 1 ulp on some
        # integer args, so the replay is tolerance-based here — the
        # bit-exact cross-ENGINE check is the driver oracle's job.
        ns = {
            round(
                2
                ** (
                    r["pmi"]
                    - math.log2(r["c_ab"])
                    + math.log2(r["c_a"])
                    + math.log2(r["c_b"])
                )
            )
            for r in rows
        }
        assert len(ns) == 1
        n = ns.pop()
        for r in rows:
            want = (
                math.log2(r["c_ab"])
                + math.log2(n)
                - math.log2(r["c_a"])
                - math.log2(r["c_b"])
            )
            assert abs(r["pmi"] - want) < 1e-10
        # descending order with deterministic tie-break
        keys = [(-r["pmi"], r["tok_a"], r["tok_b"]) for r in rows]
        assert keys == sorted(keys)

    def test_hand_built_exclusive_pair_wins(self, spark, tmp_path):
        """An exclusive couple (u, v always and only together) must
        out-rank a promiscuous pair of frequent tokens; both PMIs
        hand-checked against a full python reference."""
        import math

        from modevetl_spark.queries.wave10 import (
            _PMI_MIN,
            _PMI_W,
            cooccur_pmi,
        )

        # 6 docs "u v" (exclusive couple), 8 docs of shuffled frequent
        # fillers where x and y co-occur often but also roam
        docs = ["u v"] * 6 + ["x y z w", "x z y w", "y x w z", "x y w z"] * 2
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": docs}
        ).to_parquet(str(tmp_path / "documents.parquet"))

        # python reference over the same pair convention
        from collections import Counter

        cab: Counter = Counter()
        for t in docs:
            tk = t.split()
            for d in range(1, _PMI_W + 1):
                for i in range(len(tk) - d):
                    a, b = tk[i], tk[i + d]
                    if a != b:
                        cab[(min(a, b), max(a, b))] += 1
        marg: Counter = Counter()
        for (a, b), c in cab.items():
            marg[a] += c
            marg[b] += c
        n = sum(cab.values())
        want = {
            p: math.log2(c) + math.log2(n) - math.log2(marg[p[0]]) - math.log2(marg[p[1]])
            for p, c in cab.items()
            if c >= _PMI_MIN
        }
        got = {
            (r["tok_a"], r["tok_b"]): r["pmi"]
            for r in cooccur_pmi(spark, str(tmp_path)).collect()
        }
        assert set(got) == set(want)
        for p in want:  # 1-ulp JVM-vs-python log2 tolerance
            assert abs(got[p] - want[p]) < 1e-12, p
        assert got[("u", "v")] == max(got.values())
        assert got[("u", "v")] > got[("x", "y")]

    def test_plan_rowlocal_pairs_broadcast_margins(self, spark, sf_dir):
        from modevetl_spark.queries.wave10 import cooccur_pmi
        from tests.test_plans import plan

        p = plan(cooccur_pmi(spark, sf_dir))
        assert "Python" not in p
        assert "SortMergeJoin" not in p
        assert "TakeOrderedAndProject" in p
        # marginals read the checkpointed pair table, never the fact
        assert "documents" not in p
