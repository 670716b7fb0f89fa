"""Tiny per-module registration decorator shared by the query modules."""

from __future__ import annotations


def make_registry():
    queries: dict = {}
    oracle: dict = {}

    def q(name: str, oracle_sql: str | None = None):
        def deco(fn):
            queries[name] = fn
            if oracle_sql is not None:
                oracle[name] = oracle_sql
            return fn

        return deco

    return queries, oracle, q
