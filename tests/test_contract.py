"""Differential test of EVERY registered query against its DuckDB oracle,
plus the driver smoke contract. This is the local twin of the driver's
CORRECTNESS gate — run at sf0.001 for speed (the driver uses sf0.01).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle import compare

_QUERIES = entrymod.queries()
_ORACLE = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_every_query_has_callable():
    assert _QUERIES, "no queries registered"
    for name, fn in _QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_oracle_parity(spark, duck, sf_dir, name):
    compare(_QUERIES[name](spark, sf_dir), duck, _ORACLE[name])


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLE)))
def test_rows_only(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_grading_bookkeeping_consistent():
    """The hand-maintained evidence-allocation sets in
    queries/__init__.py must stay consistent with the registry: every
    recorded graded/deferred key exists (a typo would silently
    misprioritize the driver's 50-key window), and every changed-but-
    deferred key holds prior green evidence (deferral is only legal for
    keys the driver has already graded)."""
    from modevetl_spark import queries as Q

    keys = set(_QUERIES)
    for rnd, graded in (
        (1, Q._GRADED_R1),
        (2, Q._GRADED_R2),
        (3, Q._GRADED_R3),
        (4, Q._GRADED_R4),
        (5, Q._GRADED_R5),
        (6, Q._GRADED_R6),
        (7, Q._GRADED_R7),
        (8, Q._GRADED_R8),
        (9, Q._GRADED_R9),
        (10, Q._GRADED_R10),
        (11, Q._GRADED_R11),
        (12, Q._GRADED_R12),
    ):
        missing = graded - keys
        assert not missing, (rnd, sorted(missing))
    assert Q._CHANGED_R13_PIN <= keys
    for k in Q._CHANGED_R13_PIN:
        assert Q._freshest_round(k) > 0, k
    # the grading window (first 50 emitted keys) must be exactly the
    # highest-priority cohort prefix: no rotated key may outrank a
    # never-graded or changed-pinned key
    order = list(_QUERIES)
    prios = [Q._grading_priority(k) for k in order]
    assert prios == sorted(prios), "emission order violates priority"
    # round-13 window composition: the registry is saturated (no staged
    # tier, zero never-graded keys), so the window is the changed-key
    # re-pins (0.5 — the compat-fold try-conversion blast radius, the
    # 6 numerics-twin oracle-hardening keys, and the 9-key inline-fold
    # try-conversion cohort landed late in the round) followed by pure
    # stalest-evidence rotation
    window = order[:50]
    never_graded = [k for k in order if Q._grading_priority(k) == 0]
    assert len(never_graded) + len(Q._CHANGED_R13_PIN) <= 50
    assert set(never_graded) <= set(window)
    assert Q._CHANGED_R13_PIN <= set(window)
    assert len(Q._CHANGED_R13_PIN) == 39
    # the rotation slots must refresh the STALEST evidence — with 39
    # changed-key pins, 11 rotation slots remain: the whole 8-key
    # r5-vintage residue plus the head of the r6 cohort (the rest of
    # r6 carries to round 14 as the stalest tier)
    assert not [k for k in order if 1 <= Q._freshest_round(k) <= 4]
    rotation = [k for k in window if k not in Q._CHANGED_R13_PIN]
    assert len(rotation) == 11
    # every r5-vintage key refreshes this round — 4 of the 8 are compat
    # consumers and refresh via the pin set; the other 4 rotate
    r5_vintage = [k for k in order if Q._freshest_round(k) == 5]
    assert len(r5_vintage) == 8, len(r5_vintage)
    assert set(r5_vintage) <= set(window)
    assert all(Q._freshest_round(k) in (5, 6) for k in rotation), rotation
    # no rotated r6 key may be skipped ahead of a staler r6 key: the
    # rotation must be the exact head of the stalest-first ordering
    graded_tail = [k for k in order[50:] if Q._grading_priority(k) >= 1]
    assert all(Q._freshest_round(k) >= 6 for k in graded_tail)
