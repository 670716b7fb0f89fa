"""Registry-wide dirty-input differential sweep (maintenance tool).

Builds a schema-preserving adversarial twin of an sf fixture dir (per
table: every column NULLed one at a time against row 0, one all-NULL
row, an empty-string row per string column, an empty-list row per list
column), then runs EVERY registry key's Spark query against its DuckDB
oracle on the SAME dirty data and reports per key:

    PASS         engine and oracle agree even on adversarial input
    MISMATCH     value/row divergence — adjudicate (dialect NULL-order,
                 NULL-group membership, duplicate-PK artifacts are the
                 known-benign classes; see COVERAGE.md M9)
    ENGINE_*     the Spark side ABORTED — always a real bug: one dirty
                 row must never kill a 100 TB job (ANSI DIVIDE_BY_ZERO /
                 CAST_INVALID_INPUT / INVALID_INDEX_OF_ZERO, pandas
                 int(NaN), ragged np.asarray are the classes found and
                 fixed in round 10; tests/test_dirty_contracts.py pins
                 them)
    ORACLE_ERR   DuckDB raised — also run the engine side alone before
                 concluding anything: tests/oracle.compare executes the
                 oracle FIRST, so an oracle error masks a simultaneous
                 engine crash on the same input.

Usage:
    python scripts/dirty_sweep.py [--src=/root/testdata/sf0.001]
        [--dir=/tmp/dirty_sf0.001] [--only=k1,k2] [--start-at=key]
        [--engine-only]

The sweep is a read-only diagnostic: it never writes into the repo or
the source fixtures.
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
DIRTY = "/tmp/dirty_sf0.001"
ONLY = None
START_AT = None
ENGINE_ONLY = False
UNIQUE_KEYS = False
for a in sys.argv[1:]:
    if a.startswith("--src="):
        SRC = a.split("=", 1)[1]
    elif a.startswith("--dir="):
        DIRTY = a.split("=", 1)[1]
    elif a.startswith("--only="):
        ONLY = set(a.split("=", 1)[1].split(","))
    elif a.startswith("--start-at="):
        START_AT = a.split("=", 1)[1]
    elif a == "--engine-only":
        ENGINE_ONLY = True
    elif a == "--unique-keys":
        UNIQUE_KEYS = True

# identifier-like columns: duplicating row 0's value in a filler row
# violates primary-key invariants and makes per-row vs per-key answers
# ill-posed (both engines see the same data, but neither answer is
# "right"); --unique-keys remaps them to fresh values so the remaining
# divergence is pure NULL-contract dialect.
_KEYISH = (
    "o_orderkey", "l_orderkey", "c_custkey", "s_suppkey", "p_partkey",
    "n_nationkey", "r_regionkey", "event_id", "doc_id", "vec_id",
)


def _variant(row: pa.Table, subs: dict) -> pa.Table:
    arrays = []
    for name in row.column_names:
        col = row.column(name)
        typ = col.type
        if name in subs:
            v = subs[name]
            arrays.append(
                pa.nulls(1, type=typ) if v is None else pa.array([v], type=typ)
            )
        else:
            arrays.append(col.combine_chunks())
    return pa.Table.from_arrays(arrays, names=row.column_names)


def build_dirty(src: str, dst: str, unique_keys: bool = False) -> None:
    import pyarrow.compute as pc

    from modevetl_spark.sources.catalog import TABLES

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tab = pq.read_table(f"{src}/{t}.parquet")
        row0 = tab.slice(0, 1)
        key_max = {
            n: pc.max(tab.column(n)).as_py()
            for n in tab.column_names
            if n in _KEYISH and pa.types.is_integer(tab.schema.field(n).type)
        }
        specs = [{n: None} for n in tab.column_names]
        specs.append({n: None for n in tab.column_names})
        for name in tab.column_names:
            typ = tab.schema.field(name).type
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                specs.append({name: ""})
            elif pa.types.is_list(typ) or pa.types.is_large_list(typ):
                specs.append({name: []})
        variants = []
        for j, subs in enumerate(specs):
            if unique_keys:
                subs = dict(subs)
                for kn, km in key_max.items():
                    if kn not in subs:  # keep the NULLed/blanked column
                        subs[kn] = km + j + 1
            variants.append(_variant(row0, subs))
        pq.write_table(pa.concat_tables([tab] + variants), f"{dst}/{t}.parquet")


def main() -> None:
    build_dirty(SRC, DIRTY, unique_keys=UNIQUE_KEYS)

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dirty-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    from tests.oracle import compare, duck_con

    qs = mod.queries()
    oracles = mod.oracle_sql()
    keys = sorted(qs)
    if START_AT:
        keys = keys[keys.index(START_AT):]
    if ONLY:
        keys = [k for k in keys if k in ONLY]

    results: dict[str, tuple[str, str]] = {}
    for i, k in enumerate(keys):
        t0 = time.time()
        try:
            df = qs[k](spark, DIRTY)
            if ENGINE_ONLY:
                df.count()
                results[k] = ("ENGINE_OK", "")
                print(f"[{i+1}/{len(keys)}] {k}: ENGINE_OK "
                      f"({time.time()-t0:.1f}s)", flush=True)
                continue
        except Exception as e:
            results[k] = ("ENGINE_BUILD_ERR", f"{type(e).__name__}: {e}"[:300])
            print(f"[{i+1}/{len(keys)}] {k}: ENGINE_BUILD_ERR", flush=True)
            continue
        con = duck_con(DIRTY)
        try:
            compare(df, con, oracles[k])
            results[k] = ("PASS", "")
            status = "PASS"
        except AssertionError as e:
            results[k] = ("MISMATCH", str(e)[:500])
            status = "MISMATCH"
        except Exception as e:
            tb = traceback.format_exc()
            kind = (
                "ORACLE_ERR"
                if ("duckdb" in tb or "Binder" in tb or "Parser" in tb)
                else "ENGINE_ERR"
            )
            results[k] = (kind, f"{type(e).__name__}: {e}"[:300])
            status = kind
        finally:
            con.close()
        print(f"[{i+1}/{len(keys)}] {k}: {status} "
              f"({time.time()-t0:.1f}s)", flush=True)

    bad = {k: v for k, v in results.items() if v[0] not in ("PASS", "ENGINE_OK")}
    print(f"\n=== {len(results)} keys, {len(bad)} non-PASS ===")
    for k, (s, msg) in sorted(bad.items()):
        print(f"{k}: {s}: {msg[:200]}")
    out = "/tmp/dirty_sweep_results.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"results -> {out}")


if __name__ == "__main__":
    main()
